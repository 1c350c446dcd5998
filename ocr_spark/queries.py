"""Query catalog: every operator exposed through __spark_entry__.queries().

Each entry pairs a Spark DataFrame builder with an ANSI-SQL oracle string
(DuckDB) computing the same result on the same parquet tables.  Rules that
keep the two engines hash-equal:

* every computed column aliased identically on both sides;
* money/score rounding via ``floor(x*p + 0.5)/p`` — pure IEEE double ops
  that both engines evaluate bit-identically (Spark's ``round`` uses
  BigDecimal HALF_UP on the decimal string, DuckDB rounds the raw double;
  they disagree on representation-boundary halves);
* regexes restricted to the RE2∩Java dialect: ASCII classes, no
  backreferences, no lookaround;
* ordering never matters (the driver compare is order-insensitive), but
  rank/limit queries use explicit deterministic tie-breaks;
* hash/minhash constructions use md5 only (portable), never engine hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.operators import dedup, enrich, similarity, textstats
from ocr_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def money2(c: Column) -> Column:
    return F.floor(c * 100 + F.lit(0.5)) / 100


def fix4(c: Column) -> Column:
    return F.floor(c * 10000 + F.lit(0.5)) / 10000


def fix6(c: Column) -> Column:
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


_SQL_MONEY2 = "floor(({x}) * 100 + 0.5) / 100"
_SQL_FIX4 = "floor(({x}) * 10000 + 0.5) / 10000"
_SQL_FIX6 = "floor(({x}) * 1000000 + 0.5) / 1000000"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# relational core (SURVEY.md §2 operator analogues)
# --------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """A1/A4 agg lattice: TPC-H Q1-style pricing summary."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money2(F.sum("l_quantity")).alias("sum_qty"),
            money2(F.sum("l_extendedprice")).alias("sum_base_price"),
            money2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            fix4(F.avg("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       {_SQL_MONEY2.format(x='sum(l_quantity)')} AS sum_qty,
       {_SQL_MONEY2.format(x='sum(l_extendedprice)')} AS sum_base_price,
       {_SQL_MONEY2.format(x='sum(l_extendedprice * (1 - l_discount))')} AS revenue,
       {_SQL_FIX4.format(x='avg(l_quantity)')} AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark, sf_dir):
    """Join + agg + deterministic top-k (O2/O3 analogue)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    agg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            money2(F.sum("o_totalprice")).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # scalable top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge); the rank window then runs over
    # only 10 rows — never a global single-partition window over all groups.
    top = agg.orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc()).limit(10)
    w = Window.orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
    return top.withColumn("rank", F.row_number().over(w))


SQL_TOP_CUSTOMERS = f"""
WITH agg AS (
  SELECT c_custkey, c_name,
         {_SQL_MONEY2.format(x='sum(o_totalprice)')} AS total_spent,
         count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name
)
SELECT c_custkey, c_name, total_spent, n_orders,
       CAST(row_number() OVER (ORDER BY total_spent DESC, c_custkey ASC) AS INT) AS rank
FROM agg
QUALIFY rank <= 10
"""


def q_region_revenue(spark, sf_dir):
    """Broadcast dim chain: region ⨝ nation ⨝ customer ⨝ orders (J4/J7)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            money2(F.sum("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_REGION_REVENUE = f"""
SELECT r_name,
       {_SQL_MONEY2.format(x='sum(o_totalprice)')} AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_order_priority(spark, sf_dir):
    """F-family predicate + count per group."""
    return (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01' AND o_orderdate < TIMESTAMP '1995-01-01'
GROUP BY o_orderpriority
"""


def q_running_total(spark, sf_dir):
    """Window running sum per customer (SURVEY §2.5 analogue)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            money2(F.sum("o_totalprice").over(w)).alias("running_spent"),
        )
    )


SQL_RUNNING_TOTAL = f"""
SELECT o_custkey, o_orderkey,
       {_SQL_MONEY2.format(x="sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS running_spent
FROM orders WHERE o_custkey <= 100
"""


def q_customer_order_span(spark, sf_dir):
    """O1 analogue: first/last dates per customer via min/max."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_CUSTOMER_ORDER_SPAN = """
SELECT o_custkey, min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


def q_last100_avg(spark, sf_dir):
    """A4 analogue: ORDER BY desc LIMIT 100 → avg (ml_enhanced:171-199)."""
    last = (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
        .limit(100)
    )
    return last.agg(
        fix4(F.avg("o_totalprice")).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_LAST100_AVG = f"""
SELECT {_SQL_FIX4.format(x='avg(o_totalprice)')} AS avg_price, count(*) AS n
FROM (SELECT o_totalprice FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100)
"""


def q_distinct_segments(spark, sf_dir):
    """U2 analogue: SELECT DISTINCT."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


def q_count_stats(spark, sf_dir):
    """A5 analogue: plain + conditional counts."""
    return _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


SQL_COUNT_STATS = """
SELECT count(*) AS n_orders,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       count(DISTINCT o_custkey) AS n_customers
FROM orders
"""


def q_fuzzy_top1(spark, sf_dir):
    """J5 analogue: top-1 by levenshtein (pg_trgm similarity stand-in)."""
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return enrich.fuzzy_top1_join(
        sup.select("s_suppkey", "s_name"), cust.select("c_name"),
        fact_id="s_suppkey", fact_text="s_name", dim_text="c_name",
    )


SQL_FUZZY_TOP1 = """
SELECT s_suppkey, best_match, distance FROM (
  SELECT s_suppkey, c_name AS best_match,
         CAST(levenshtein(s_name, c_name) AS INT) AS distance,
         row_number() OVER (PARTITION BY s_suppkey
                            ORDER BY levenshtein(s_name, c_name) ASC, c_name ASC) AS rn
  FROM (SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey <= 20)
  CROSS JOIN (SELECT c_name FROM customer WHERE c_custkey <= 200)
) WHERE rn = 1
"""

# ERP-style containment dim (J1): keyword list stands in for the company
# table; dim order = priority, exactly as the reference iterates its dims.
_ERP_DIM = [(1, "spark"), (2, "hash"), (3, "merge"), (4, "window"), (5, "scan")]


def q_erp_containment(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dims = spark.createDataFrame(_ERP_DIM, ["dim_idx", "erp_code"])
    out = enrich.first_match_containment_join(
        docs, dims, fact_id="doc_id", text_col="text", dim_key="erp_code", how="left"
    )
    return out.select(
        "doc_id", F.coalesce("matched_erp_code", F.lit("DEFAULT_COMPANY")).alias("erp_code")
    )


SQL_ERP_CONTAINMENT = """
WITH dims(dim_idx, erp_code) AS (
  VALUES (1,'spark'), (2,'hash'), (3,'merge'), (4,'window'), (5,'scan')
), matched AS (
  SELECT d.doc_id, m.erp_code,
         row_number() OVER (PARTITION BY d.doc_id ORDER BY m.dim_idx) AS rn
  FROM documents d JOIN dims m
    ON strpos(lower(d.text), lower(m.erp_code)) > 0
)
SELECT d.doc_id, coalesce(m.erp_code, 'DEFAULT_COMPANY') AS erp_code
FROM documents d LEFT JOIN (SELECT doc_id, erp_code FROM matched WHERE rn = 1) m
  ON d.doc_id = m.doc_id
"""

# --------------------------------------------------------------------------
# extraction semantics on constructed text (X/D/M analogues, dialect-safe)
# --------------------------------------------------------------------------


def _invoice_text(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return o.select(
        "o_orderkey",
        F.concat(
            F.lit("INVOICE NUMBER: F-"),
            F.col("o_orderkey").cast("string"),
            F.lit(" SIRET: "),
            F.lpad(F.col("o_custkey").cast("string"), 14, "0"),
            F.lit(" TOTAL TTC "),
            F.col("o_totalprice").cast("decimal(12,2)").cast("string"),
        ).alias("text"),
    )


def q_extract_invoice_fields(spark, sf_dir):
    """X1/X4/M2 analogues as native regexp_extract over constructed text."""
    t = _invoice_text(spark, sf_dir)
    return t.select(
        "o_orderkey",
        F.regexp_extract("text", r"INVOICE NUMBER[: ]*([A-Z0-9\-]+)", 1).alias("invoice_number"),
        F.regexp_extract("text", r"SIRET[: ]*([0-9]{9,14})", 1).alias("siret"),
        F.regexp_extract("text", r"TOTAL TTC ([0-9]+\.[0-9]{2})", 1).cast("double").alias("total_ttc"),
    )


SQL_EXTRACT_INVOICE_FIELDS = """
WITH t AS (
  SELECT o_orderkey,
         'INVOICE NUMBER: F-' || CAST(o_orderkey AS VARCHAR)
           || ' SIRET: ' || lpad(CAST(o_custkey AS VARCHAR), 14, '0')
           || ' TOTAL TTC ' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS text
  FROM orders WHERE o_orderkey <= 5000
)
SELECT o_orderkey,
       coalesce(regexp_extract(text, 'INVOICE NUMBER[: ]*([A-Z0-9\\-]+)', 1), '') AS invoice_number,
       coalesce(regexp_extract(text, 'SIRET[: ]*([0-9]{9,14})', 1), '') AS siret,
       CAST(regexp_extract(text, 'TOTAL TTC ([0-9]+\\.[0-9]{2})', 1) AS DOUBLE) AS total_ttc
FROM t
"""


def q_date_lattice(spark, sf_dir):
    """D1 analogue: multi-format date parse via try+coalesce lattice."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "dd.MM.yyyy"))
        .alias("raw"),
    )
    parsed = F.coalesce(
        F.try_to_timestamp("raw", F.lit("dd/MM/yyyy")),
        F.try_to_timestamp("raw", F.lit("yyyy-MM-dd")),
        F.try_to_timestamp("raw", F.lit("dd.MM.yyyy")),
    ).cast("date")
    return raw.select("o_orderkey", "raw", parsed.alias("parsed"))


SQL_DATE_LATTICE = """
WITH r AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
              ELSE strftime(o_orderdate, '%d.%m.%Y') END AS raw
  FROM orders WHERE o_orderkey <= 5000
)
SELECT o_orderkey, raw,
       CAST(coalesce(try_strptime(raw, '%d/%m/%Y'),
                     try_strptime(raw, '%Y-%m-%d'),
                     try_strptime(raw, '%d.%m.%Y')) AS DATE) AS parsed
FROM r
"""


def q_amount_lattice(spark, sf_dir):
    """M4/M5 analogue: derive/correct ttc from ht+tva, consistency flags."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    ht = money2(F.col("l_extendedprice"))
    tva = money2(F.col("l_extendedprice") * F.col("l_tax"))
    ttc_raw = money2(F.col("l_extendedprice") * (1 + F.col("l_tax")))
    stepped = li.select(
        "l_orderkey",
        "l_linenumber",
        ht.alias("ht"),
        tva.alias("tva"),
        ttc_raw.alias("ttc_raw"),
    ).withColumn(
        "ttc",
        F.when(F.abs(F.col("ht") + F.col("tva") - F.col("ttc_raw")) > 0.01,
               money2(F.col("ht") + F.col("tva"))).otherwise(F.col("ttc_raw")),
    )
    return stepped.withColumn(
        "consistent", (F.abs(F.col("ht") + F.col("tva") - F.col("ttc")) <= 0.01)
    )


SQL_AMOUNT_LATTICE = f"""
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         {_SQL_MONEY2.format(x='l_extendedprice')} AS ht,
         {_SQL_MONEY2.format(x='l_extendedprice * l_tax')} AS tva,
         {_SQL_MONEY2.format(x='l_extendedprice * (1 + l_tax)')} AS ttc_raw
  FROM lineitem WHERE l_orderkey <= 2000
)
SELECT l_orderkey, l_linenumber, ht, tva, ttc_raw,
       CASE WHEN abs(ht + tva - ttc_raw) > 0.01
            THEN {_SQL_MONEY2.format(x='ht + tva')} ELSE ttc_raw END AS ttc,
       abs(ht + tva - (CASE WHEN abs(ht + tva - ttc_raw) > 0.01
                            THEN {_SQL_MONEY2.format(x='ht + tva')}
                            ELSE ttc_raw END)) <= 0.01 AS consistent
FROM s
"""

# --------------------------------------------------------------------------
# training-data ops: text analysis / dedup / similarity
# --------------------------------------------------------------------------

_SQL_PAD = "(' ' || lower(text) || ' ')"


def _sql_count_word(word: str) -> str:
    tok = f" {word} "
    return (
        f"CAST((length({_SQL_PAD}) - length(replace({_SQL_PAD}, '{tok}', ''))) / {len(tok)} AS BIGINT)"
    )


def _sql_lang_scores() -> dict[str, str]:
    return {
        lang: " + ".join(_sql_count_word(w) for w in words)
        for lang, words in textstats.LANG_STOPWORDS.items()
    }


def q_textstats(spark, sf_dir):
    """Token count, language-ID, quality score, fingerprint per doc."""
    return textstats.with_textstats(_t(spark, sf_dir, "documents"))


def _sql_textstats() -> str:
    s = _sql_lang_scores()
    best = f"greatest({s['en']}, {s['fr']}, {s['de']})"
    alpha = "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END"
    ntok = "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    quality = (
        f"floor((CASE WHEN ({ntok}) BETWEEN 10 AND 10000 THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN ({alpha}) >= 0.6 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN ({s['en']} + {s['fr']} + {s['de']}) >= 3 THEN 0.3 ELSE 0.0 END) * 10 + 0.5) / 10"
    )
    return f"""
SELECT doc_id,
       CAST({ntok} AS BIGINT) AS n_tokens,
       CASE WHEN {s['en']} = {best} AND {best} > 0 THEN 'en'
            WHEN {s['fr']} = {best} AND {best} > 0 THEN 'fr'
            WHEN {s['de']} = {best} AND {best} > 0 THEN 'de'
            ELSE 'und' END AS lang_pred,
       {_SQL_FIX4.format(x=alpha)} AS alpha_ratio,
       {quality} AS quality,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


SQL_TEXTSTATS = _sql_textstats()


def q_exact_dedup(spark, sf_dir):
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


SQL_EXACT_DEDUP = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       count(*) AS group_size,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""

# shared shingle construction (k=5) for jaccard/minhash oracles
_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_SHINGLES = (
    f"list_sort(list_distinct(list_transform("
    f"generate_series(1, greatest(length({_SQL_NORM}) - 4, 1)), "
    f"i -> substring({_SQL_NORM}, i, 5))))"
)


def q_ngram_jaccard(spark, sf_dir):
    """Exact 5-gram Jaccard over a bounded doc subset (brute baseline)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = dedup.with_shingles(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            fix6(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )


SQL_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS s
  FROM documents WHERE doc_id < 60
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_SQL_FIX6.format(x="CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {_SQL_FIX6.format(x="CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s)))")} >= 0.1
"""


def q_minhash_signatures(spark, sf_dir):
    """MinHash signature (8 seeds over md5) for a doc subset."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = dedup.with_shingles(docs)
    return sh.select(
        "doc_id", F.concat_ws("|", dedup.minhash_signature(F.col("sh"))).alias("sig")
    )


def _sql_minhash(seeds: int = 8) -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform(s, x -> md5('{seed}:' || x)), 'min')"
        for seed in range(seeds)
    )
    return f"list_aggregate([{mins}], 'string_agg', '|')"


SQL_MINHASH_SIGNATURES = f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents WHERE doc_id < 100
)
SELECT doc_id, {_sql_minhash()} AS sig FROM sh
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup candidates verified by exact Jaccard ≥ 0.5."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_pairs(docs, threshold=0.5).select(
        "doc_a", "doc_b", fix6(F.col("jaccard")).alias("jaccard")
    )


def _sql_lsh_pairs() -> str:
    mins = ", ".join(
        f"list_aggregate(list_transform(s, x -> md5('{seed}:' || x)), 'min')"
        for seed in range(dedup.DEFAULT_SEEDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5("
        + " || '|' || ".join(
            f"sig[{b * (dedup.DEFAULT_SEEDS // dedup.DEFAULT_BANDS) + r + 1}]"
            for r in range(dedup.DEFAULT_SEEDS // dedup.DEFAULT_BANDS)
        )
        + ") AS band_hash FROM sig"
        for b in range(dedup.DEFAULT_BANDS)
    )
    jac = "CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) / len(list_distinct(list_concat(sa.s, sb.s)))"
    return f"""
WITH sh AS (
  SELECT doc_id, {_SQL_SHINGLES} AS s FROM documents
), sig AS (
  SELECT doc_id, [{mins}] AS sig, s FROM sh
), bands AS (
  {band_rows}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, {_SQL_FIX6.format(x=jac)} AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE {jac} >= 0.5
"""


SQL_MINHASH_LSH_PAIRS = _sql_lsh_pairs()


def q_embed_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id < 10."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _sql_dot(a: str, b: str, dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


_SQL_COS = (
    f"({_sql_dot('q.embedding', 'c.embedding')}) / "
    f"(sqrt({_sql_dot('q.embedding', 'q.embedding')}) * sqrt({_sql_dot('c.embedding', 'c.embedding')}))"
)

SQL_EMBED_TOPK = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_SQL_FIX6.format(x=_SQL_COS)} AS sim
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings c ON q.vec_id <> c.vec_id
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, sim FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_sessionize(spark, sf_dir):
    """Event sessionization (30-min gap) — the batch form of the streaming
    session-window operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM marked GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Spark-only queries (no SQL twin → driver rows-only check)
# --------------------------------------------------------------------------


def q_simhash_near_dups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(docs, max_hamming=8)


def q_lsh_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5)


def q_extraction_pipeline(spark, sf_dir):
    """Flagship: full span pipeline over synthesized interleaved docs."""
    from ocr_spark.corpus import COMPANIES, SUPPLIERS
    from ocr_spark.operators.extract import run_pipeline
    from ocr_spark.schemas import DOCUMENTS, MEDIA
    from ocr_spark.synth import synth_frames

    docs_pd, media_pd = synth_frames(100)
    docs = spark.createDataFrame(docs_pd, schema=DOCUMENTS)
    media = spark.createDataFrame(
        [(r["media_ref"], bytearray(r["payload"])) for _, r in media_pd.iterrows()],
        schema=MEDIA,
    )
    _, invoices = run_pipeline(spark, docs, media, companies=COMPANIES, suppliers=SUPPLIERS)
    return invoices


def q_media_features(spark, sf_dir):
    from ocr_spark.operators.multimodal import media_features
    from ocr_spark.schemas import MEDIA
    from ocr_spark.synth import synth_frames

    _, media_pd = synth_frames(100)
    media = spark.createDataFrame(
        [(r["media_ref"], bytearray(r["payload"])) for _, r in media_pd.iterrows()],
        schema=MEDIA,
    )
    return media_features(media)


# --------------------------------------------------------------------------
# catalog
# --------------------------------------------------------------------------

CATALOG: dict[str, tuple] = {
    # name: (spark_fn, oracle_sql | None)
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "region_revenue": (q_region_revenue, SQL_REGION_REVENUE),
    "order_priority": (q_order_priority, SQL_ORDER_PRIORITY),
    "running_total": (q_running_total, SQL_RUNNING_TOTAL),
    "customer_order_span": (q_customer_order_span, SQL_CUSTOMER_ORDER_SPAN),
    "last100_avg": (q_last100_avg, SQL_LAST100_AVG),
    "distinct_segments": (q_distinct_segments, SQL_DISTINCT_SEGMENTS),
    "count_stats": (q_count_stats, SQL_COUNT_STATS),
    "fuzzy_top1": (q_fuzzy_top1, SQL_FUZZY_TOP1),
    "erp_containment": (q_erp_containment, SQL_ERP_CONTAINMENT),
    "extract_invoice_fields": (q_extract_invoice_fields, SQL_EXTRACT_INVOICE_FIELDS),
    "date_lattice": (q_date_lattice, SQL_DATE_LATTICE),
    "amount_lattice": (q_amount_lattice, SQL_AMOUNT_LATTICE),
    "textstats": (q_textstats, SQL_TEXTSTATS),
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "minhash_signatures": (q_minhash_signatures, SQL_MINHASH_SIGNATURES),
    "minhash_lsh_pairs": (q_minhash_lsh_pairs, SQL_MINHASH_LSH_PAIRS),
    "embed_topk": (q_embed_topk, SQL_EMBED_TOPK),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    # rows-only (non-SQL-expressible / pipeline-backed)
    "simhash_near_dups": (q_simhash_near_dups, None),
    "lsh_ann_topk": (q_lsh_ann_topk, None),
    "extraction_pipeline": (q_extraction_pipeline, None),
    "media_features": (q_media_features, None),
}
