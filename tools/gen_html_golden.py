"""Golden parquet for the html_main_text catalog query.

Unlike the ANN goldens (which replay the Spark query), this golden is a
PURE-PYTHON replay: pandas over the same deterministic synthetic
interleaved corpus (ocr_spark/synth.py:synth_frames), html spans fed one
at a time through kernel/htmlx.py:extract_main_text_one.  The catalog
row runs the SAME kernel through an Arrow-batched mapInPandas stage, so
the driver's hash compare proves the distributed batched path equals the
plain single-process execution — the span-equality proof style of the
flagship goldens (tools/gen_pipeline_golden.py).  Regenerate after ANY
change to kernel/htmlx.py or the synth HTML template.

Usage: python tools/gen_html_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"
N_DOCS = 100  # must match queries._synth_docs_media


def main() -> None:
    from ocr_spark.kernel.htmlx import extract_main_text_one
    from ocr_spark.synth import synth_frames

    docs_pd, _media_pd = synth_frames(N_DOCS)
    rows = []
    for _, doc in docs_pd.iterrows():
        for span in doc["spans"]:
            if span["kind"] != "html":
                continue
            html = span["text"] or ""
            main = extract_main_text_one(html)
            rows.append(
                {
                    "doc_id": doc["doc_id"],
                    "offset": int(span["offset"]),
                    "main_text": main,
                    "main_chars": len(main),
                    "html_chars": len(html),
                }
            )
    out = pd.DataFrame(rows).astype(
        {"offset": "int32", "main_chars": "int64", "html_chars": "int64"}
    )
    path = FIXTURES / "html_main_text_golden.parquet"
    out.to_parquet(path, index=False)
    print(f"wrote {path}: {len(out)} rows")


if __name__ == "__main__":
    main()
