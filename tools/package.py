#!/usr/bin/env python
"""Build ocr_spark.zip for `spark-submit --py-files` (north rule packaging).

Usage: python tools/package.py  →  dist/ocr_spark.zip
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    out_dir = REPO / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / "ocr_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "ocr_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
