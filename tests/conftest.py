from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"


@pytest.fixture(scope="session")
def goldens() -> dict:
    return json.loads((FIXTURES / "goldens.json").read_text())


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    spark = get_spark("ocr_spark_tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
