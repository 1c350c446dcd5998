"""Golden parquets for the media catalog queries (same pinning scheme as
tools/gen_pipeline_golden.py): the multimodal operators are deterministic
functions of the synthetic payloads, so their exact outputs are committed
and DuckDB reads them back for the driver's hash compare.  Regenerate
after any multimodal/synth change.

Usage: python tools/gen_media_goldens.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"


def main() -> None:
    from ocr_spark.queries import (
        q_audio_features,
        q_audio_resample,
        q_media_dedup,
        q_media_features,
        q_media_frame_sample,
        q_media_resize,
    )
    from ocr_spark.session import get_spark

    spark = get_spark("gen_media_goldens", master="local[4]", shuffle_partitions=4)
    try:
        for name, fn, order in [
            ("media_features", q_media_features, ["media_ref"]),
            ("media_resize", q_media_resize, ["media_ref"]),
            ("media_frame_sample", q_media_frame_sample, ["media_ref", "frame_no"]),
            ("audio_features", q_audio_features, ["media_ref"]),
            ("audio_resample", q_audio_resample, ["media_ref"]),
            ("media_dedup", q_media_dedup, ["payload_md5"]),
        ]:
            out = fn(spark, sf_dir="unused")
            with tempfile.TemporaryDirectory() as tmp:
                out.orderBy(*order).coalesce(1).write.mode("overwrite").parquet(tmp + "/g")
                part = next(Path(tmp, "g").glob("part-*.parquet"))
                dest = FIXTURES / f"{name}_golden.parquet"
                shutil.copyfile(part, dest)
            print(f"wrote {dest} ({out.count()} rows)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
