"""Stream-static as-of enrichment equals the batch as-of join over the
whole input, across micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.temporal import asof_join
from ocr_spark.streaming.temporal import asof_enrich_writer

SF_DIR = "/root/testdata/sf0.001"
EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_stream_asof_equals_batch(spark, tmp_path):
    src = str(tmp_path / "ev_src")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.withColumn("_b", F.col("event_id") % 4).repartition(4, "_b").drop(
        "_b"
    ).write.mode("overwrite").parquet(src)

    # static dimension: each user's signup events as versioned attributes
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("dim_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )

    stream = (
        spark.readStream.schema(EV_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out: list = []
    q = (
        asof_enrich_writer(
            stream.filter(F.col("event_type") == "purchase").select(
                "user_id", "event_id", "ts"
            ),
            dim,
            sink=lambda df, bid: out.extend(df.collect()),
            on="user_id",
            right_cols=["dim_id"],
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    want = asof_join(purchases, dim, on="user_id", right_cols=["dim_id"]).collect()
    key = lambda rows: sorted((r.event_id, r.dim_id, r.matched_ts) for r in rows)
    assert key(out) == key(want)
    assert len(out) == purchases.count()
