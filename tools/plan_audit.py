#!/usr/bin/env python
"""Catalyst plan audit: `.explain("formatted")` every catalog query and
check the invariants the engine is designed around, writing PLANS.md.

Checked per query:

* parquet scans of filtered tables carry PushedFilters (typed literals —
  a bare-string comparand casts the column and kills pushdown);
* no CartesianProduct / BroadcastNestedLoopJoin outside the whitelisted
  intentional cross joins (bounded brute-force baselines + containment
  theta-joins);
* shuffle (Exchange) and Python-stage counts recorded so a regression
  (an operator suddenly adding a shuffle or a per-row path) shows as a
  diff in PLANS.md.

Usage: python tools/plan_audit.py  [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# cross-join shapes that are the POINT of the query (bounded brute
# baselines, broadcast containment/similarity theta-joins)
CROSS_OK = {
    "fuzzy_top1", "fuzzy_top1_trgm", "ngram_jaccard", "embed_cosine_dups",
    "embed_topk", "erp_containment", "supplier_fallback", "vat_imputation",
    "lsh_ann_topk", "ivf_ann_topk", "pq_ann_topk", "ivfadc_ann_topk",
    "hard_negatives", "knn_label_vote",
    # 1-row x 1-row: sketch estimate beside the exact count
    "kmv_distinct_tokens",
    # broadcast of a ONE-ROW corpus-stats frame (N/avgdl/total tokens)
    # into every scored row — a deliberate scalar attach, not a blow-up
    "unigram_logprob", "bm25_topk", "tfidf_top_terms", "unigram_model_score",
    # composite of two whitelisted shapes: bm25's one-row stats attach +
    # embed_topk's broadcast theta-join (the fusion joins are few-row)
    "hybrid_topk",
    # two one-row OOV-floor scalar attaches (one per unigram model) —
    # the same deliberate pattern as unigram_model_score
    "dsir_select",
    # one-row totals / N / OOV-floor scalar attaches (round 4):
    # skew_profile broadcasts its (total, n_keys) row into the top-N,
    # hashed_tfidf broadcasts the doc count into the idf, bigram_score
    # attaches the OOV floor like the other LM scorers
    "skew_profile", "hashed_tfidf", "bigram_score",
    # collocations attaches the one-row N_pairs and N_tokens totals
    "collocations",
    # text_ann_topk composes hashed_tfidf's one-row N attach with
    # embed_topk's broadcast brute-force theta-join
    "text_ann_topk",
    # round 5: the same hashed_tfidf one-row doc-count (N) attach —
    # tfidf_incremental inside hashed_tfidf_apply, text_ann_topk_ivf
    # inside the vector build feeding the IVF probe (the probe itself
    # is an equi-join on list_id)
    "tfidf_incremental", "text_ann_topk_ivf",
    # round 5 (late): remove_boilerplate_local attaches the ONE-ROW
    # collected flagged-md5 set (the zero-shuffle apply form's whole
    # point); perplexity_buckets inherits unigram_logprob's one-row
    # doc-count (N) attach — the tercile boundaries themselves join
    # back as a per-language broadcast equi-join
    "remove_boilerplate_local", "perplexity_buckets",
    # bucket_apply inherits unigram_model_score's one-row OOV-floor attach
    "bucket_apply",
    # domain_mixture attaches TWO one-row scalars (total tokens, weight
    # denominator) onto the S-row per-source agg — deliberate broadcast
    # scalar attaches on a metadata-sized frame, the corpus passes once;
    # mixture_materialize inherits the plan's attaches (the corpus-side
    # join itself is a broadcast equi-join on the group key)
    "domain_mixture", "mixture_materialize",
    # training_export composes corpus_curation (no cross-join) with
    # mixture_materialize's whitelisted one-row scalar attaches and the
    # shuffle_global_ids 16-row offsets broadcast
    "training_export",
    # NB classifier: 1-row V/doc-total scalar attaches, the S-row x
    # V-row dense artifact build (bounded: classes x head, a few KB),
    # and the S-row broadcast class attach in the scorer
    "nb_model_head", "nb_classify",
}
# queries whose input is synthesized in-memory (no parquet scan to push into)
NO_SCAN = {"extraction_pipeline", "media_features", "media_resize", "media_frame_sample"}


def _unpushed_filtered_scan(plan: str) -> bool:
    """True when some Filter's input columns trace back to a parquet scan
    that pushed nothing — exprIds (col#123L) are unique per plan, so this
    attributes each Filter to its actual source instead of flagging any
    Filter anywhere (a Filter on a checkpointed RDD beside a clean
    column-pruned scan is NOT a violation)."""
    scan_cols: set[str] = set()
    for block in re.split(r"\n\n", plan):
        if not block.lstrip().startswith("(") or "Scan parquet" not in block:
            continue
        pushed = re.search(r"PushedFilters: \[(?!\])", block)
        if pushed:
            continue
        m = re.search(r"Output \[\d+\]: \[([^\]]*)\]", block)
        if m:
            scan_cols.update(re.findall(r"\w+#\d+L?", m.group(1)))
    if not scan_cols:
        return False
    for block in re.split(r"\n\n", plan):
        head = block.lstrip()
        if not re.match(r"\(\d+\) Filter", head):
            continue
        # refs in the CONDITION only — the Input list also carries
        # passthrough columns the filter never tests (e.g. an id column
        # riding past an isnotnull on a computed join key)
        m = re.search(r"Condition : (.*)", block)
        if not m:
            continue
        # comparisons INSIDE a CASE expression are operands of a computed
        # value (e.g. a per-group sampling threshold), not conjuncts a
        # scan could push — strip them before matching
        cond = re.sub(r"CASE WHEN .*? END", " ", m.group(1))
        # flag only PUSHABLE-SHAPED conjuncts: a bare (or cast-wrapped —
        # the classic pushdown killer) column compared to a literal.
        # Computed-expression predicates (size(...)>0 from explode
        # pruning, md5/regex filters) can never push and are fine.
        for col, rhs in re.findall(
            r"\((?:cast\()?(\w+#\d+L?)(?: as \w+\))? (?:=|<=|>=|<|>) ([^\s()]+)\)",
            cond,
        ):
            if col in scan_cols and "#" not in rhs:
                return True
    return False


def audit(name: str, df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    return {
        "name": name,
        "plan": plan,
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "python_stages": len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython", plan)),
        "broadcasts": len(re.findall(r"BroadcastHashJoin|BroadcastExchange", plan)),
        "cartesian": bool(re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
        "pushed": "PushedFilters: [" in plan
        and bool(re.search(r"PushedFilters: \[(?!\])", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from ocr_spark.queries import CATALOG
    from ocr_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=8)
    rows, violations = [], []
    for name, (fn, _sql) in CATALOG.items():
        try:
            info = audit(name, fn(spark, args.sf_dir))
        except Exception as exc:  # pragma: no cover
            violations.append(f"{name}: audit failed: {exc}")
            continue
        rows.append(info)
        if info["cartesian"] and name not in CROSS_OK:
            violations.append(f"{name}: unexpected cartesian/nested-loop join")
        if info["scans"] and name not in NO_SCAN:
            # only flag Filters that actually read from an unpushed scan
            if _unpushed_filtered_scan(info["plan"]):
                violations.append(f"{name}: parquet scan without pushed filters")

    lines = [
        "# PLANS — Catalyst plan audit of the query catalog",
        "",
        f"Generated by `python tools/plan_audit.py --sf-dir {args.sf_dir}`. "
        "Counts from `.explain('formatted')` text — each physical node "
        "appears twice (tree + details), so counts are 2× the node count; "
        "they are stable for diffing. Regenerate after operator changes "
        "and diff — a new Exchange or Python stage in a query is a plan "
        "regression to justify or fix.",
        "",
        "| query | exchanges | python stages | broadcast | parquet scans | pushed filters | cross-join |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        cross = "intended" if (r["cartesian"] and r["name"] in CROSS_OK) else (
            "YES (!)" if r["cartesian"] else "no"
        )
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['python_stages']} | "
            f"{r['broadcasts']} | {r['scans']} | "
            f"{'yes' if r['pushed'] else ('n/a' if r['name'] in NO_SCAN or not r['scans'] else 'no')} | {cross} |"
        )
    lines += ["", "## Invariant violations", ""]
    lines += [f"- {v}" for v in violations] if violations else ["(none)"]
    (REPO / "PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries, {len(violations)} violations)")
    for v in violations:
        print("  !", v)
    spark.stop()


if __name__ == "__main__":
    main()
