"""Declared StructTypes for every table the engine reads or writes.

Fixed, declared schemas throughout (the reference declares everything via
Pydantic/SQLAlchemy — /root/reference/src/api/models.py:17-96,
src/database/models.py:13-182); no schema inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Core interleaved-document tables (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# extracted_spans output shares the documents shape (FIXTURES.md §4).
EXTRACTED_SPANS = DOCUMENTS

# media payloads travel in a side table keyed by media_ref, never inline in
# the span row (the reference hands temp-file paths between stages,
# src/api/routes.py:70-73; at 100 TB the payloads live in object storage).
MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

# Exploded working shape inside the pipeline (one row per span).
SPAN_ROW = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Extraction results
# ---------------------------------------------------------------------------

# Field extraction result per span — one struct column produced by the
# vectorized kernels; mirrors the union of the reference's extractor
# families (src/extraction/data_extractor.py + llm_enhanced_extractor.py +
# swiss_invoice_extractor.py), determinized per FIXTURES.md §5.
FIELDS = T.StructType(
    [
        T.StructField("norm_text", T.StringType(), True),
        T.StructField("invoice_number", T.StringType(), True),
        T.StructField("invoice_date", T.StringType(), True),  # ISO yyyy-mm-dd
        T.StructField("due_date", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("total_ht", T.StringType(), True),  # decimal as string
        T.StructField("tva", T.StringType(), True),
        T.StructField("total_ttc", T.StringType(), True),
        T.StructField("amount_due", T.StringType(), True),
        T.StructField("siret", T.StringType(), True),
        T.StructField("vat_number", T.StringType(), True),
        T.StructField("supplier_name", T.StringType(), True),
        T.StructField("company_erp_code", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

# Ordered list of FIELDS members that become `field:<name>` spans
# (FIXTURES.md §4); norm_text/confidence are carried differently.
# `line_items` is the X13 family (data_extractor.py:304-336) emitted as a
# deterministic JSON blob span (AR3 shape) — omitted for item-less spans.
FIELD_SPAN_ORDER = [
    "invoice_number",
    "invoice_date",
    "due_date",
    "currency",
    "total_ht",
    "tva",
    "total_ttc",
    "amount_due",
    "siret",
    "vat_number",
    "supplier_name",
    "company_erp_code",
    "email",
    "phone",
    "line_items",
]

# Flat invoices output table, mirroring the reference's InvoiceDTO
# (src/api/invoice_models.py:53-75) with money as DecimalType(10,2)
# (src/database/models.py:93-95) and deterministic ids.  The DTO's
# constant status block (invoice_service.py:52-54), empty
# state_validations (:82), and document_urls=[filename] (:84 — the
# pipeline's document identity is doc_id) are carried verbatim;
# line_items rides as the X13 JSON blob (the reference keeps items in
# InvoiceData but its DTO drops them — here they stay queryable).
INVOICES = T.StructType(
    [
        T.StructField("invoice_id", T.StringType(), False),  # sha2(doc_id)
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("invoice_number", T.StringType(), True),
        T.StructField("invoice_date", T.DateType(), True),
        T.StructField("due_date", T.DateType(), True),
        T.StructField("currency_code", T.StringType(), True),
        T.StructField("supplier_name", T.StringType(), True),
        T.StructField("company_erp_code", T.StringType(), True),
        T.StructField("excluding_taxes", T.DecimalType(10, 2), True),
        T.StructField("taxes", T.DecimalType(10, 2), True),
        T.StructField("including_taxes", T.DecimalType(10, 2), True),
        T.StructField("amount_due", T.DecimalType(10, 2), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("payment_state", T.StringType(), False),  # 'DRAFT'
        T.StructField("completed", T.BooleanType(), False),
        T.StructField("draft", T.BooleanType(), False),
        T.StructField("state_validations", T.ArrayType(T.StringType()), False),
        T.StructField("document_urls", T.ArrayType(T.StringType()), False),
        T.StructField("line_items", T.StringType(), True),  # X13 JSON blob
    ]
)

# InvoiceGoal DTO rows (src/api/invoice_models.py:38-50 /
# invoice_service.py:364-389): one goal per invoice with a truthy TTC
# (amount = including_taxes; a 0.00 lattice default creates NO goal).
INVOICE_GOALS = T.StructType(
    [
        T.StructField("goal_id", T.StringType(), False),  # sha2(invoice_id:goal)
        T.StructField("invoice_id", T.StringType(), False),
        T.StructField("amount", T.DecimalType(10, 2), False),
    ]
)

# invoice_ml_data training rows (src/extraction/ml_enhanced_extractor.py
# :393-428 — the INSERT's column list, with determinized processing_time
# and deterministic ids per FIXTURES.md §5) plus the two boolean
# validation flags of MLValidationResult (:30-36, :351-391).
INVOICE_ML_DATA = T.StructType(
    [
        T.StructField("ml_id", T.StringType(), False),  # sha2(doc_id|offset|ml)
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("raw_text", T.StringType(), True),  # [:10000]
        T.StructField("extracted_data", T.StringType(), True),  # JSON blob
        T.StructField("confidence_score", T.DoubleType(), True),
        T.StructField("processing_time", T.DoubleType(), False),  # 0.0
        T.StructField("validation_score", T.DoubleType(), False),
        T.StructField("data_quality_score", T.DoubleType(), False),
        T.StructField("ml_calculation_check", T.BooleanType(), False),
        T.StructField("ml_required_fields_present", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Reference dimension tables (broadcast enrichment joins, FIXTURES.md §2)
# ---------------------------------------------------------------------------

COMPANY_DIM = T.StructType(
    [
        T.StructField("dim_idx", T.IntegerType(), False),  # load order = priority
        T.StructField("erp_code", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
    ]
)

SUPPLIER_DIM = T.StructType(
    [
        T.StructField("dim_idx", T.IntegerType(), False),
        T.StructField("social_reason", T.StringType(), False),
        T.StructField("rcs", T.StringType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("phone_number", T.StringType(), True),
        T.StructField("contact_name", T.StringType(), True),
        T.StructField("is_active", T.BooleanType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Checkpoint manifests (SURVEY.md §7 / north rule: per-partition lineage)
# ---------------------------------------------------------------------------

MANIFEST = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("input_snapshot", T.StringType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("byte_count", T.LongType(), False),
        T.StructField("lineage_hash", T.StringType(), False),
        T.StructField("job_epoch", T.StringType(), False),
    ]
)
