"""The Spark extraction pipeline (the engine's flagship job).

Restates the reference's request pipeline (SURVEY.md §3.1) as one
declarative DataFrame job:

    documents ──explode──► span rows
      ├─ media spans ──join(media)──► payload rows          (S2/S4/S7)
      ├─ salted repartition by xxhash64(doc_id, salt)       (north rule)
      ├─ oversized PDFs ──mapInPandas(split pages)──►       (S5 skew path)
      │       groupBy(doc_id, offset).applyInPandas(reassemble)
      ├─ mapInPandas(kernel.fields_batch)  — vectorized extraction
      │       (T*, X*, D*, M* families + merge lattice)     (EP1 steps 4-9)
      ├─ extracted_spans: groupBy(doc_id).applyInPandas(sort offset, seq)
      └─ invoices: typed flat projection (DecimalType money, DateType)

All Python stages are Arrow-batched (`mapInPandas` / `applyInPandas`);
there is no per-row Python anywhere.  Dimension data (company/supplier)
ships with the task closure — it is the same "load dims once, keep in
memory" strategy as the reference startup (llm_enhanced_extractor.py:24-31)
and is equivalent to a broadcast for these tiny tables; the relational
broadcast-join form of the same matching lives in operators/enrich.py.
"""

from __future__ import annotations

from datetime import date
from functools import partial
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.kernel import assemble
from ocr_spark.schemas import FIELD_SPAN_ORDER

# payloads larger than this are treated as skew risks and split per page
OVERSIZE_PAYLOAD_BYTES = 64 * 1024

FIELDS_ROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("norm_text", T.StringType(), True),
        *[T.StructField(name, T.StringType(), True) for name in FIELD_SPAN_ORDER],
        T.StructField("confidence", T.DoubleType(), True),
        # raw resolved span text, kernel-truncated to assemble.RAW_TEXT_LIMIT
        # (ml_enhanced_extractor.py:416) — feeds the invoice_ml_data sink
        T.StructField("raw_text", T.StringType(), True),
    ]
)

_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("page_no", T.IntegerType(), False),
        T.StructField("page_text", T.StringType(), True),
    ]
)

_RESOLVED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)

SPAN_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
    ]
)


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) → one row per span."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )


def attach_payloads(
    span_rows: DataFrame,
    media: DataFrame | None,
    broadcast_media: bool = True,
) -> DataFrame:
    """Attach payloads to media-kind spans in a SINGLE scan of the input.

    Round 1 split the input into a media branch (joined) and a text branch
    (unioned back): filter pushdown through the upstream exchange made the
    two branch plans non-identical so ReuseExchange never fired and the
    exploded input was scanned twice — at 100 TB the text branch is the
    bulk, and two scans of it was the biggest scale tax in the flagship
    plan (VERDICT r01).  Now every row takes ONE left join:

    * media rows join on their media_ref;
    * text rows get a synthetic per-row key (NUL-prefixed, cannot collide
      with any real ref) that never matches — they stream through the join
      with a null payload, and under a shuffled join the unique keys
      distribute uniformly instead of piling every null on one partition.

    ``broadcast_media=True`` (default — per-batch payload dictionaries are
    small next to the text corpus) hints a broadcast-hash join: no shuffle
    of the span rows at all.  Set False when the media side is too big to
    ship; the synthetic keys keep the shuffled fallback skew-free.
    """
    if media is None:
        return span_rows.withColumn("payload", F.lit(None).cast(T.BinaryType()))
    is_media = F.col("kind").isin("pdf", "image")
    join_key = F.when(
        is_media & F.col("media_ref").isNotNull(), F.col("media_ref")
    ).otherwise(
        F.concat(F.lit("\x00txt:"), F.col("doc_id"), F.lit(":"), F.col("offset").cast("string"))
    )
    m = media.select(F.col("media_ref").alias("_payload_ref"), "payload")
    if broadcast_media:
        m = F.broadcast(m)
    return (
        span_rows.withColumn("_jk", join_key)
        .join(m, F.col("_jk") == F.col("_payload_ref"), "left")
        .drop("_jk", "_payload_ref")
    )


def salted_repartition(df: DataFrame, num_partitions: int, salt: int = 0) -> DataFrame:
    """North rule: explicit repartition by salted doc_id hash.

    Partition on the raw 64-bit hash, NOT pmod(hash, N): Spark re-hashes
    the partition expression, so an N-valued pmod gives balls-into-bins
    collisions (measured 4.6x row skew at N=96); the full-width hash
    distributes uniformly. The explicit partition count also opts this
    exchange out of AQE coalescing — Python extraction is CPU-bound, and
    AQE's byte-based coalescing would serialize it (measured: the whole
    big-PDF branch coalesced into ONE task).
    """
    return df.repartition(num_partitions, F.xxhash64(F.col("doc_id"), F.lit(salt)))


def _fields_map(
    it: Iterator[pd.DataFrame], as_of: date, companies: list[dict],
    suppliers: list[dict], emit_raw_text: bool = False,
) -> Iterator[pd.DataFrame]:
    for batch in it:
        yield assemble.fields_batch(
            assemble.resolve_batch(batch), as_of, companies, suppliers,
            emit_raw_text=emit_raw_text,
        )


def _fields_map_resolved(
    it: Iterator[pd.DataFrame], as_of: date, companies: list[dict],
    suppliers: list[dict], emit_raw_text: bool = False,
) -> Iterator[pd.DataFrame]:
    for batch in it:
        yield assemble.fields_batch(
            batch, as_of, companies, suppliers, emit_raw_text=emit_raw_text
        )


def _split_pages_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        yield assemble.split_pdf_pages(batch)


def _spans_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in it:
        yield assemble.spans_from_fields(batch)


def _process_map(
    it: Iterator[pd.DataFrame], as_of: date, companies: list[dict], suppliers: list[dict]
) -> Iterator[pd.DataFrame]:
    """Fused resolve→fields→spans in ONE Python stage (one Arrow hop)."""
    for batch in it:
        yield assemble.process_batch(batch, as_of, companies, suppliers)


def _process_map_resolved(
    it: Iterator[pd.DataFrame], as_of: date, companies: list[dict], suppliers: list[dict]
) -> Iterator[pd.DataFrame]:
    for batch in it:
        yield assemble.spans_from_fields(
            assemble.fields_batch(batch, as_of, companies, suppliers)
        )


def extract_fields(
    spans_with_payload: DataFrame,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    with_raw_text: bool = False,
) -> DataFrame:
    """Span rows (+payload) → one FIELDS row per span, single-pass.

    One mapInPandas handles every kind inline, including multi-page PDFs
    (~100 ms/monster in the kernel, so intra-doc parallelism buys nothing
    at this per-page cost). No dataflow branching: a small/big filter
    split re-evaluates the shared scan+shuffle lineage per branch —
    Catalyst pushes the filters below the exchange, so the exchanges stop
    being canonically identical and ReuseExchange never fires (verified on
    the executed AQE plan). For workloads where per-page cost is heavy
    (real OCR rasterization), use extract_spans_paged.
    """
    return spans_with_payload.mapInPandas(
        partial(
            _fields_map,
            as_of=as_of,
            companies=companies or [],
            suppliers=suppliers or [],
            emit_raw_text=with_raw_text,
        ),
        schema=FIELDS_ROW_SCHEMA,
    )


def _split_small_big(spans_with_payload: DataFrame, oversize_bytes: int):
    is_big_pdf = (F.col("kind") == "pdf") & (
        F.length(F.col("payload")) > F.lit(oversize_bytes)
    )
    small = spans_with_payload.filter(~F.coalesce(is_big_pdf, F.lit(False)))
    big = spans_with_payload.filter(F.coalesce(is_big_pdf, F.lit(False)))
    return small, big


def extract_spans_fused(
    spans_with_payload: DataFrame,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
) -> DataFrame:
    """Span rows (+payload) → output span rows, single fused Python stage
    (resolve+extract+spans in one Arrow hop), single-pass dataflow (see
    extract_fields for why branching costs a full re-scan)."""
    return spans_with_payload.mapInPandas(
        partial(
            _process_map,
            as_of=as_of,
            companies=companies or [],
            suppliers=suppliers or [],
        ),
        schema=SPAN_ROWS_SCHEMA,
    )


def extract_spans_paged(
    spans_with_payload: DataFrame,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    oversize_bytes: int = OVERSIZE_PAYLOAD_BYTES,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-mitigating variant (north rule / SURVEY.md §7.3): oversized PDF
    payloads are split into page-level rows processed as independent
    sub-tasks, then re-assembled per (doc_id, offset) sorted by page_no.

    Use when per-page processing is expensive (real OCR: seconds/page) —
    one 500-page document then costs 500 parallel sub-tasks instead of
    pinning a core for the whole stage. Costs one extra scan of the input
    (the small/big branch split defeats exchange reuse) and a page-level
    shuffle, so the cheap-kernel default is extract_spans_fused.
    """
    companies = companies or []
    suppliers = suppliers or []
    if num_partitions is None:
        num_partitions = int(
            spans_with_payload.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    small, big = _split_small_big(spans_with_payload, oversize_bytes)
    small_spans = small.mapInPandas(
        partial(_process_map, as_of=as_of, companies=companies, suppliers=suppliers),
        schema=SPAN_ROWS_SCHEMA,
    )
    # Explicit partition count on the reassembly exchange: it satisfies the
    # groupBy's ClusteredDistribution (no second shuffle) AND opts out of
    # AQE byte-based coalescing, which would funnel the CPU-bound
    # reassemble+extract work for every monster PDF into one task.
    big_resolved = (
        big.mapInPandas(_split_pages_map, schema=_PAGE_SCHEMA)
        .repartition(num_partitions, "doc_id", "offset")
        .groupBy("doc_id", "offset")
        .applyInPandas(assemble.reassemble_pages, schema=_RESOLVED_SCHEMA)
    )
    big_spans = big_resolved.mapInPandas(
        partial(_process_map_resolved, as_of=as_of, companies=companies, suppliers=suppliers),
        schema=SPAN_ROWS_SCHEMA,
    )
    return small_spans.unionByName(big_spans)


def extract_fields_paged(
    spans_with_payload: DataFrame,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    oversize_bytes: int = OVERSIZE_PAYLOAD_BYTES,
    num_partitions: int | None = None,
    with_raw_text: bool = False,
) -> DataFrame:
    """FIELDS rows with the oversized-PDF page-split skew path (the FIELDS
    twin of extract_spans_paged): oversized payloads split into page rows,
    reassembled per (doc_id, offset), then the same kernel — so the shared
    single-FIELDS pipeline covers the paged configuration too (round 1's
    invoices branch silently ignored page_split_bytes)."""
    companies = companies or []
    suppliers = suppliers or []
    if num_partitions is None:
        num_partitions = int(
            spans_with_payload.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    small, big = _split_small_big(spans_with_payload, oversize_bytes)
    small_fields = small.mapInPandas(
        partial(_fields_map, as_of=as_of, companies=companies,
                suppliers=suppliers, emit_raw_text=with_raw_text),
        schema=FIELDS_ROW_SCHEMA,
    )
    big_resolved = (
        big.mapInPandas(_split_pages_map, schema=_PAGE_SCHEMA)
        .repartition(num_partitions, "doc_id", "offset")
        .groupBy("doc_id", "offset")
        .applyInPandas(assemble.reassemble_pages, schema=_RESOLVED_SCHEMA)
    )
    big_fields = big_resolved.mapInPandas(
        partial(_fields_map_resolved, as_of=as_of, companies=companies,
                suppliers=suppliers, emit_raw_text=with_raw_text),
        schema=FIELDS_ROW_SCHEMA,
    )
    return small_fields.unionByName(big_fields)


def assemble_extracted_spans(fields_rows: DataFrame) -> DataFrame:
    """FIELDS rows → extracted_spans(doc_id, spans[]) ordered by (offset, seq).

    JVM-native reassembly: collect_list of (offset, seq, …) structs,
    array_sort (struct comparison orders by leading fields → (offset, seq),
    unique per doc), then a transform projecting the SPAN shape. Replaces a
    per-group applyInPandas — partial aggregation happens map-side and no
    Python worker touches the reassembly path.
    """
    span_rows = fields_rows.mapInPandas(_spans_map, schema=SPAN_ROWS_SCHEMA)
    return assemble_spans_table(span_rows)


def span_rows_from_fields(fields_rows: DataFrame) -> DataFrame:
    """FIELDS rows → output span rows in PURE JVM (no Python stage).

    Exact twin of the kernel's ``spans_from_fields`` (tested equal via the
    e2e span-equality suite): per FIELDS row, one 'text' span (seq 0,
    norm_text, media_ref carried) then one ``field:<name>`` span per
    non-null field in FIELD_SPAN_ORDER (seq dense from 1, media_ref "").
    Field values are already strings in the FIELDS schema, so no cast can
    diverge from the kernel's str().  Keeping this JVM-side means the
    spans output costs no second Arrow round-trip over the cached FIELDS
    frame.  The generator lives in its own projection — posexplode beside
    struct-field access strips struct names during the Generate rewrite
    (measured round 1)."""
    text_struct = F.struct(
        F.lit("text").alias("kind"),
        F.col("norm_text").alias("text"),
        F.coalesce(F.col("media_ref"), F.lit("")).alias("media_ref"),
    )
    field_structs = [
        F.struct(
            F.lit(f"field:{name}").alias("kind"),
            F.col(name).alias("text"),
            F.lit("").alias("media_ref"),
        )
        for name in FIELD_SPAN_ORDER
    ]
    arr = F.concat(
        F.array(text_struct),
        F.filter(F.array(*field_structs), lambda s: s["text"].isNotNull()),
    )
    staged = fields_rows.select("doc_id", "offset", arr.alias("_arr"))
    exploded = staged.select(
        "doc_id", "offset", F.posexplode("_arr").alias("seq", "s")
    )
    return exploded.select(
        "doc_id",
        "offset",
        "seq",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def assemble_spans_table(span_rows: DataFrame) -> DataFrame:
    """Output span rows → extracted_spans(doc_id, spans[]), JVM-native."""
    ordered = F.array_sort(
        F.collect_list(F.struct("offset", "seq", "kind", "text", "media_ref"))
    )
    spans = F.transform(
        ordered,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return span_rows.groupBy("doc_id").agg(spans.alias("spans"))


def invoices_from_fields(fields_rows: DataFrame) -> DataFrame:
    """FIELDS rows → flat typed invoices table (one row per input span),
    carrying the full InvoiceDTO surface (src/api/invoice_models.py:53-75):
    the constant status block DRAFT/not-completed/draft
    (invoice_service.py:52-54), empty state_validations (:82),
    document_urls = [doc_id] (:84 — filename analogue), and the X13
    line-items JSON blob.

    Deterministic ids replace the reference's uuid4
    (src/services/invoice_service.py:34 → sha2, FIXTURES.md §5).
    """
    return fields_rows.select(
        F.sha2(F.concat_ws("|", "doc_id", F.col("offset").cast("string")), 256).alias("invoice_id"),
        "doc_id",
        "invoice_number",
        F.to_date("invoice_date").alias("invoice_date"),
        F.to_date("due_date").alias("due_date"),
        F.col("currency").alias("currency_code"),
        "supplier_name",
        "company_erp_code",
        F.col("total_ht").cast(T.DecimalType(10, 2)).alias("excluding_taxes"),
        F.col("tva").cast(T.DecimalType(10, 2)).alias("taxes"),
        F.col("total_ttc").cast(T.DecimalType(10, 2)).alias("including_taxes"),
        F.col("amount_due").cast(T.DecimalType(10, 2)).alias("amount_due"),
        "confidence",
        F.lit("DRAFT").alias("payment_state"),
        F.lit(False).alias("completed"),
        F.lit(True).alias("draft"),
        F.array().cast(T.ArrayType(T.StringType())).alias("state_validations"),
        F.array(F.col("doc_id")).alias("document_urls"),
        "line_items",
    )


def invoice_goals_from_fields(fields_rows: DataFrame) -> DataFrame:
    """FIELDS rows → InvoiceGoal rows (invoice_service.py:364-389): one
    goal per invoice whose TTC is truthy (the 0.00 lattice default creates
    none — the reference's `if amount:` gate), amount = including_taxes.
    Goal ids determinized like invoice ids (uuid4 → sha2)."""
    ttc = F.col("total_ttc").cast(T.DecimalType(10, 2))
    inv_id = F.sha2(
        F.concat_ws("|", "doc_id", F.col("offset").cast("string")), 256
    )
    return (
        fields_rows.filter(ttc.isNotNull() & (ttc != 0))
        .select(
            F.sha2(F.concat(inv_id, F.lit(":goal")), 256).alias("goal_id"),
            inv_id.alias("invoice_id"),
            ttc.alias("amount"),
        )
    )


def ml_data_from_fields(fields_rows: DataFrame) -> DataFrame:
    """FIELDS rows → invoice_ml_data training rows, pure-JVM projection of
    the reference's ``_save_ml_training_data`` insert
    (src/extraction/ml_enhanced_extractor.py:393-428):

    * ``raw_text`` — the resolved span text, already kernel-truncated to
      10 000 chars (:416, "Limiter la taille");
    * ``extracted_data`` — the JSON blob the reference builds at :399-405
      ({extracted_data, confidence_score, processing_time,
      validation_score, filename}), with the pipeline's FIELDS as the
      extracted-data dict and doc_id as the filename analogue;
    * the score columns via kernel/ml.py semantics computed JVM-side
      (tested equal to the Python functions in tests/test_pipeline_e2e):
      validation_score/data_quality_score = presence-count/4 over
      (number, ttc, supplier, date) with FLOAT-truthiness (0.00 counts as
      absent, ml.validation_score:154-160), and the M6 calculation check
      (ml.check_calculation_consistency:145-151).

    ``processing_time`` is determinized to 0.0 (wall-clock in the
    reference — same policy as uuid4 → sha2, FIXTURES.md §5).

    ``raw_text`` is only populated when the pipeline was built with
    ``with_raw_text=True`` (build_pipeline default is False — the column
    doubles the FIELDS payload); jobs/extract.py sets it automatically
    when ``--ml-data-out`` is given.
    """
    ht = F.col("total_ht").cast("double")
    tva = F.col("tva").cast("double")
    ttc = F.col("total_ttc").cast("double")
    present = lambda c: c.isNotNull() & (c != 0)  # noqa: E731 — float-truthy
    quality = (
        F.when(F.col("invoice_number").isNotNull() & (F.col("invoice_number") != ""), 1).otherwise(0)
        + F.when(present(ttc), 1).otherwise(0)
        + F.when(F.col("supplier_name").isNotNull() & (F.col("supplier_name") != ""), 1).otherwise(0)
        + F.when(F.col("invoice_date").isNotNull(), 1).otherwise(0)
    ) / F.lit(4.0)
    calc_check = (
        present(ht) & present(tva) & present(ttc)
        & (F.abs(ht + tva - ttc) <= 0.01)
    )
    blob = F.to_json(
        F.struct(
            F.struct(
                "invoice_number", "invoice_date", "due_date", "currency",
                "total_ht", "tva", "total_ttc", "amount_due", "siret",
                "vat_number", "supplier_name", "company_erp_code", "email",
                "phone", "line_items",
            ).alias("extracted_data"),
            F.col("confidence").alias("confidence_score"),
            F.lit(0.0).alias("processing_time"),
            quality.alias("validation_score"),
            F.col("doc_id").alias("filename"),
        )
    )
    return fields_rows.select(
        F.sha2(
            F.concat_ws("|", "doc_id", F.col("offset").cast("string"), F.lit("ml")), 256
        ).alias("ml_id"),
        "doc_id",
        "raw_text",
        blob.alias("extracted_data"),
        F.col("confidence").alias("confidence_score"),
        F.lit(0.0).alias("processing_time"),
        quality.alias("validation_score"),
        quality.alias("data_quality_score"),
        calc_check.alias("ml_calculation_check"),
        (quality >= 0.5).alias("ml_required_fields_present"),
    )


class PipelineFrames:
    """Shared-FIELDS pipeline outputs: ONE kernel execution feeds every
    table.  ``fields`` is persisted (memory, spill to disk) so whichever
    output materializes first computes the kernel and the others read the
    cache; call :meth:`unpersist` when the outputs are written."""

    def __init__(
        self,
        fields: DataFrame,
        extracted_spans: DataFrame,
        invoices: DataFrame,
        invoice_goals: DataFrame,
        ml_data: DataFrame,
    ):
        self.fields = fields
        self.extracted_spans = extracted_spans
        self.invoices = invoices
        self.invoice_goals = invoice_goals
        self.ml_data = ml_data

    def unpersist(self) -> None:
        self.fields.unpersist()


def build_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    media: DataFrame | None,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    page_split_bytes: int | None = None,
    with_raw_text: bool = False,
) -> PipelineFrames:
    """documents/media → shared-FIELDS dataflow (spans + invoices).

    ``with_raw_text=False`` (default) leaves FIELDS.raw_text null — the
    column doubles the shipped/persisted row payload and measurably
    throttles high-parallelism runs; pass True when the ml_data output
    will be materialized (jobs/extract.py does this automatically for
    --ml-data-out).

    Round 1 built the spans output from one kernel execution and the
    invoices output from an INDEPENDENT second execution over the same
    rows — a caller materializing both paid the dominant extraction cost
    twice, and the invoices branch ignored ``page_split_bytes`` entirely
    (VERDICT r01 / ADVICE r01).  Now a single FIELDS-producing stage
    (paged or not) is persisted and both outputs derive from it: spans
    via the cheap spans_from_fields projection stage, invoices via a pure
    JVM projection.
    """
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fields = _fields_dataflow(
        documents, media, as_of, companies, suppliers, num_partitions, salt,
        page_split_bytes, with_raw_text,
    )
    from pyspark import StorageLevel

    fields = fields.persist(StorageLevel.MEMORY_AND_DISK)
    return _frames_from_fields(fields)


def _fields_dataflow(
    documents: DataFrame,
    media: DataFrame | None,
    as_of: date,
    companies: list[dict] | None,
    suppliers: list[dict] | None,
    num_partitions: int,
    salt: int,
    page_split_bytes: int | None,
    with_raw_text: bool = False,
) -> DataFrame:
    """The shared FIELDS-producing prelude: explode → payload attach →
    salted repartition → (paged) kernel."""
    rows = explode_spans(documents)
    rows = attach_payloads(rows, media)
    rows = salted_repartition(rows, num_partitions, salt)
    if page_split_bytes is None:
        return extract_fields(rows, as_of, companies, suppliers, with_raw_text)
    return extract_fields_paged(
        rows,
        as_of,
        companies,
        suppliers,
        oversize_bytes=page_split_bytes,
        num_partitions=num_partitions,
        with_raw_text=with_raw_text,
    )


def _frames_from_fields(fields: DataFrame) -> PipelineFrames:
    spans = assemble_spans_table(span_rows_from_fields(fields))
    return PipelineFrames(
        fields,
        spans,
        invoices_from_fields(fields),
        invoice_goals_from_fields(fields),
        ml_data_from_fields(fields),
    )


def build_pipeline_staged(
    spark: SparkSession,
    documents: DataFrame,
    media: DataFrame | None,
    staging_dir: str,
    input_snapshot: str,
    n_buckets: int = 64,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    page_split_bytes: int | None = None,
    with_raw_text: bool = False,
) -> PipelineFrames:
    """build_pipeline with the FIELDS frame written to a parquet STAGING
    TABLE through the manifest-checkpointed sink instead of executor-
    storage persist (the SCALING.md trade-off #2 form): when a 100 TB run
    outlives executor storage — multi-day jobs, preemptible executors —
    the kernel output survives any crash, a resumed run re-submits with
    the same ``input_snapshot`` and only the unmanifested buckets re-run
    the kernel, and every derived output reads the committed staging
    table (one scan each, no cache memory at all).

    Costs one parquet round-trip of FIELDS vs the persist form (measured
    ≤10 % at sf0.1 — bench.py --fields-staging); identical outputs
    (tests/test_resume.py::test_staged_pipeline_*).
    """
    from ocr_spark.sources.manifests import checkpointed_write, read_committed

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fields = _fields_dataflow(
        documents, media, as_of, companies, suppliers, num_partitions, salt,
        page_split_bytes, with_raw_text,
    )
    checkpointed_write(
        spark, fields, staging_dir, n_buckets=n_buckets, input_snapshot=input_snapshot
    )
    committed = read_committed(spark, staging_dir, input_snapshot)
    return _frames_from_fields(committed)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    media: DataFrame | None,
    as_of: date = assemble.DEFAULT_AS_OF,
    companies: list[dict] | None = None,
    suppliers: list[dict] | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    page_split_bytes: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """documents/media → (extracted_spans, invoices) — see build_pipeline
    (the shared-FIELDS dataflow; use build_pipeline directly when you need
    the fields frame or its unpersist handle)."""
    frames = build_pipeline(
        spark,
        documents,
        media,
        as_of=as_of,
        companies=companies,
        suppliers=suppliers,
        num_partitions=num_partitions,
        salt=salt,
        page_split_bytes=page_split_bytes,
    )
    return frames.extracted_spans, frames.invoices


# --------------------------------------------------------------------------
# standalone batched HTML boilerplate strip (north rule: text-density +
# link-density DOM heuristics a la Readability/Boilerpipe)
# --------------------------------------------------------------------------

_HTML_MAIN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("main_text", T.StringType()),
        T.StructField("main_chars", T.LongType()),
        T.StructField("html_chars", T.LongType()),
    ]
)


def _html_main_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ocr_spark.kernel import htmlx

    for batch in it:
        main = htmlx.extract_main_text(batch["html"])
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "offset": batch["offset"].astype("int32"),
                "main_text": main,
                "main_chars": main.str.len().astype("int64"),
                "html_chars": batch["html"].str.len().fillna(0).astype("int64"),
            }
        )


def html_main_text(html_spans: DataFrame) -> DataFrame:
    """Batched HTML main-content extraction as a standalone operator:
    rows ``(doc_id, offset, html)`` → ``(doc_id, offset, main_text,
    main_chars, html_chars)`` via the kernel's boilerplate stripper
    (``kernel/htmlx.py``: block segmentation, nav/header/footer/aside
    subtree tagging, per-block link-density < 0.33 and text-density >= 3
    gates, heading adoption — Kohlschütter et al., WSDM 2010 in spirit).

    Scale shape: ONE Arrow-batched ``mapInPandas`` stage — no shuffle,
    no collect; the HTML parse is the inherent cost and it is
    embarrassingly parallel. The same kernel function serves the
    pipeline's format dispatch (kernel/assemble.py resolve_content), so
    this row pins the batched distributed path against a plain-Python
    replay of the identical kernel (tools/gen_html_golden.py)."""
    return html_spans.select("doc_id", "offset", "html").mapInPandas(
        _html_main_map, schema=_HTML_MAIN_SCHEMA
    )
