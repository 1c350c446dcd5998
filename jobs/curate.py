#!/usr/bin/env python
"""Training-corpus curation job (spark-submit entrypoint).

    spark-submit --master <cluster> --py-files ocr_spark.zip \
        jobs/curate.py --docs <dir>/documents --bench <dir>/benchmarks \
        --out /data/curated --snapshot snap-2026-08-17 \
        [--quality-min 0.4] [--threshold 0.5] [--max-bucket 100] \
        [--ngram 8] [--buckets 4096] [--substring-dedup-n 50] \
        [--cap-per-source 100000] [--dsir-target <dir> --dsir-n 10000] \
        [--nb-reference <dir> [--nb-min-margin 0.0] [--nb-vocab 50000]] \
        [--split train=0.9,val=0.05,test=0.05] \
        [--mix-budget 10000000000 --mix-temperature 0.7] \
        [--shuffle [--global-ids]] \
        [--c4] [--gopher [--gopher-min-words 50] [--gopher-min-stop-hits 2]]

Runs the composed curation chain — quality gate → exact dedup → MinHash-
LSH near-dup keep-one → benchmark decontamination — over a documents
table and writes the surviving rows through the manifest-checkpointed
sink: a killed run re-submitted with the same --snapshot resumes at
bucket granularity, and `jobs/compact.py` maintains the output like any
other sink. The benchmark table needs (bench_id | doc_id, text) rows.

Local smoke:
    python jobs/curate.py --docs /root/testdata/sf0.01/documents.parquet \
        --bench /root/testdata/sf0.01/documents.parquet --bench-limit 20 \
        --out /tmp/curated --snapshot s1
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet dir/file")
    ap.add_argument("--bench", required=True, help="benchmark parquet (bench_id|doc_id, text)")
    ap.add_argument("--bench-limit", type=int, default=None, help="take first N bench rows (smoke)")
    ap.add_argument("--out", required=True, help="output root (data/ + manifests/)")
    ap.add_argument("--snapshot", required=True, help="input snapshot id (resume key)")
    ap.add_argument("--quality-min", type=float, default=0.4)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--max-bucket", type=int, default=None)
    ap.add_argument("--ngram", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument(
        "--stats-cols",
        default=None,
        help="comma-separated columns to zone-map in the manifests "
        "(enables pruned_read time/range slicing of the output)",
    )
    ap.add_argument(
        "--substring-dedup-n",
        type=int,
        default=None,
        help="also remove duplicated n-token spans (Lee et al. rule); "
        "text becomes the surviving normalized token stream and docs "
        "stripped to nothing are dropped",
    )
    ap.add_argument(
        "--cap-per-source",
        type=int,
        default=None,
        help="keep at most K surviving docs per source (deterministic draw)",
    )
    ap.add_argument(
        "--dsir-target",
        default=None,
        help="parquet of target-domain docs: keep the --dsir-n survivors "
        "whose unigram distribution importance-resamples toward it",
    )
    ap.add_argument("--dsir-n", type=int, default=10_000)
    ap.add_argument(
        "--nb-reference",
        default=None,
        help="parquet of reference-quality docs: train the NB classifier "
        "quality filter (reference vs raw, the GPT-3 recipe) and attach "
        "nb_pred/nb_margin to survivors; with --nb-min-margin only "
        "reference-like survivors above the confidence threshold remain",
    )
    ap.add_argument("--nb-min-margin", type=float, default=None)
    ap.add_argument("--nb-vocab", type=int, default=50_000)
    ap.add_argument(
        "--bucket-by-perplexity",
        action="store_true",
        help="label survivors head/middle/tail by per-language terciles "
        "of the corpus-LM quality score (CCNet bucketing; adds lp + "
        "bucket columns so downstream mixing can sample head-heavy)",
    )
    ap.add_argument(
        "--funnel",
        action="store_true",
        help="also report per-stage survivor counts (quality gate / "
        "exact dedup / near-dup / decontamination) in the stats JSON",
    )
    ap.add_argument(
        "--mix-budget",
        type=int,
        default=None,
        help="materialize the temperature-scaled training mix: survivors "
        "are repeated per their source's epoch factor so each source's "
        "expected token mass matches its budget allocation; adds a rep "
        "column (the per-source plan lands in the stats JSON)",
    )
    ap.add_argument("--mix-temperature", type=float, default=0.7)
    ap.add_argument(
        "--shuffle",
        action="store_true",
        help="assign the deterministic shuffled-shards training layout "
        "(shard + pos columns, pure functions of the row identity — "
        "stage-retry-safe, reproducible across reruns)",
    )
    ap.add_argument("--shuffle-seed", default="0")
    ap.add_argument(
        "--global-ids",
        action="store_true",
        help="with --shuffle: also assign contiguous 0..N-1 global "
        "example ids (per-shard windows + broadcast offsets — no "
        "global sort; the index a training run logs and resumes by)",
    )
    ap.add_argument(
        "--c4",
        action="store_true",
        help="apply the C4 line/page cleaning pass (Raffel et al. 2020 "
        "§2.2) before curation: text replaced by the surviving lines, "
        "dropped pages removed — row-local, runs before anything "
        "shuffles",
    )
    ap.add_argument(
        "--gopher",
        action="store_true",
        help="apply the Gopher §A1.1 quality-rule battery before "
        "curation (keep==true survivors only) — row-local pre-filter",
    )
    ap.add_argument("--gopher-min-words", type=int, default=50)
    ap.add_argument(
        "--gopher-min-stop-hits",
        type=int,
        default=2,
        help="Gopher function-word requirement (set 0 for corpora "
        "without English function words)",
    )
    ap.add_argument(
        "--split",
        default=None,
        help="label survivors with a deterministic dataset split, e.g. "
        "'train=0.9,val=0.05,test=0.05' (fractions sum to 1; assignment "
        "is a pure function of the doc id, stable across reruns and "
        "corpus growth)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ocr_spark.operators import curation
    from ocr_spark.session import get_spark
    from ocr_spark.sources.manifests import checkpointed_write

    spark = get_spark(app_name="ocr_spark_curate")
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.bench)
    if "bench_id" not in bench.columns:
        bench = bench.withColumnRenamed("doc_id", "bench_id")
    if args.bench_limit:
        bench = bench.orderBy("bench_id").limit(args.bench_limit)

    t0 = time.monotonic()
    raw_docs = docs  # input_docs must count the PRE-filter input
    # the two row-local web-cleaning recipes run FIRST (cheapest-first:
    # both are zero-shuffle, so every shuffling stage downstream sees
    # the smaller, cleaner corpus). C4 before Gopher — the rule battery
    # should judge the text a trainer would actually see.
    if args.c4:
        cleaned = curation.c4_clean(docs)
        docs = docs.drop("text").join(
            cleaned.filter(F.col("kept")).select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            on="doc_id",
        )
    if args.gopher:
        from ocr_spark.operators import quality as _q

        flags = _q.gopher_rules(
            docs,
            min_words=args.gopher_min_words,
            min_stop_hits=args.gopher_min_stop_hits,
        )
        docs = docs.join(
            flags.filter(F.col("keep")).select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
    survivors = curation.curate_corpus(
        docs,
        bench.select("bench_id", "text"),
        quality_min=args.quality_min,
        near_dup_threshold=args.threshold,
        max_bucket=args.max_bucket,
        n=args.ngram,
    )
    if args.substring_dedup_n:
        ssd = curation.substring_dedup(survivors, n=args.substring_dedup_n)
        survivors = (
            survivors.drop("text")
            .join(
                ssd.filter(F.col("text_kept") != "").select(
                    "doc_id", F.col("text_kept").alias("text")
                ),
                on="doc_id",
            )
        )
    if args.cap_per_source:
        survivors = curation.cap_per_group(
            survivors, "source", args.cap_per_source
        )
    if args.dsir_target:
        from ocr_spark.operators import quality

        target = spark.read.parquet(args.dsir_target)
        picked = quality.dsir_select(survivors, target, n=args.dsir_n)
        survivors = survivors.join(
            picked.select("doc_id"), on="doc_id", how="left_semi"
        )
    if args.nb_reference:
        from ocr_spark.operators import quality

        ref = spark.read.parquet(args.nb_reference)
        survivors = quality.nb_reference_filter(
            survivors,
            ref,
            vocab_size=args.nb_vocab,
            min_margin=args.nb_min_margin,
        )
    if args.bucket_by_perplexity:
        from ocr_spark.operators import quality

        labels = quality.perplexity_buckets(survivors)
        # 'bucket' is the manifest sink's own hash-bucketing column —
        # the label must travel under a non-colliding name
        survivors = survivors.join(
            labels.select(
                "doc_id", "lp", F.col("bucket").alias("ppl_bucket")
            ),
            on="doc_id",
            how="left",
        )
    if args.split:
        fractions = {
            k: float(v)
            for k, v in (kv.split("=") for kv in args.split.split(","))
        }
        survivors = curation.split_assign(survivors, fractions)
    mixture_plan = None
    if args.mix_budget:
        plan = curation.domain_mixture(
            survivors,
            token_budget=args.mix_budget,
            temperature=args.mix_temperature,
        )
        mixture_plan = {
            r["source"]: {
                "n_docs": r["n_docs"],
                "n_tokens": r["n_tokens"],
                "weight": round(r["weight"], 6),
                "tokens_alloc": r["tokens_alloc"],
                "epochs": round(r["epochs"], 6) if r["epochs"] is not None else None,
            }
            for r in plan.collect()
        }
        mix = curation.mixture_materialize(
            survivors, token_budget=0, temperature=0.0, plan=plan
        )
        # re-attach the payload; rep makes the row identity unique
        survivors = mix.join(survivors, on=["doc_id", "source"]).withColumn(
            "mix_id",
            F.concat(
                F.col("doc_id").cast("string"), F.lit("#"), F.col("rep").cast("string")
            ),
        )
    if args.shuffle:
        layout = (
            curation.shuffle_global_ids if args.global_ids else curation.shuffle_shards
        )
        survivors = layout(
            survivors,
            seed=args.shuffle_seed,
            id_col="mix_id" if args.mix_budget else "doc_id",
            full=True,
        )
    stats = checkpointed_write(
        spark,
        survivors,
        args.out,
        args.buckets,
        args.snapshot,
        stats_cols=args.stats_cols.split(",") if args.stats_cols else None,
    )
    stats["wall_sec"] = round(time.monotonic() - t0, 3)
    stats["input_docs"] = raw_docs.count()
    if mixture_plan is not None:
        stats["mixture"] = mixture_plan
    if args.funnel:
        funnel = curation.curation_funnel(
            docs,
            bench.select("bench_id", "text"),
            quality_min=args.quality_min,
            near_dup_threshold=args.threshold,
            max_bucket=args.max_bucket,
            n=args.ngram,
        )
        stats["funnel"] = {r["stage"]: r["n_docs"] for r in funnel.collect()}
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
