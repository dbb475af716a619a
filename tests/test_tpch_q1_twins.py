"""q1's int64-micros fast path vs its DECIMAL deployment twin.

The micros container is exact only inside a per-group envelope
(|sum| ≤ ~9.2e12 money units — operators/tpch.py:_micros); the
DECIMAL twin is the documented fallback beyond it. Pinned here:

- the two spellings are frame-identical on the fixture (both also
  hold independent driver-oracle certifications);
- the runtime sentinel actually TRIPS on data outside the envelope
  (ADVICE r10: the envelope was documented but unenforced), and the
  DECIMAL twin still answers exactly on that same data.
"""

from __future__ import annotations

import datetime
import shutil

import pytest

from hetnetdb_spark.operators.tpch import (
    q1_pricing_summary,
    q1_pricing_summary_decimal,
)
from tests.conftest import SF_DIR


def test_twins_frame_identical(spark):
    a = q1_pricing_summary(spark, SF_DIR).toPandas()
    b = q1_pricing_summary_decimal(spark, SF_DIR).toPandas()
    assert list(a.columns) == list(b.columns)
    # identical dtypes + values — the micros path and the DECIMAL
    # path must be indistinguishable inside the envelope
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b), "micros vs DECIMAL q1 twins diverged"


@pytest.fixture()
def envelope_breaker(spark, tmp_path):
    """lineitem scratch dir with one group outside the sentinel's
    conservative envelope but still inside int64: 6 rows × 9e11
    money units → sum micros 5.4e18 (no ANSI overflow — Spark 4's
    ANSI mode is the loud backstop for an actual long overflow, so
    a silent wrap is impossible either way), while the count×max×1.1
    bound (5.9e18) exceeds _MICROS_SAFE_BOUND (4.6e18) and trips the
    guided error BEFORE exactness is ever at risk."""
    rows = [
        ("A", "F", 1.0, 9.0e11, 0.0, 0.0, datetime.datetime(1995, 1, 1))
        for _ in range(6)
    ] + [("N", "O", 2.0, 100.0, 0.06, 0.02, datetime.datetime(1995, 1, 1))]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_micros_sentinel_trips_outside_envelope(spark, envelope_breaker):
    with pytest.raises(Exception, match="q1_pricing_summary_decimal"):
        q1_pricing_summary(spark, envelope_breaker).toPandas()


def test_decimal_twin_exact_outside_envelope(spark, envelope_breaker):
    out = q1_pricing_summary_decimal(spark, envelope_breaker).toPandas()
    big = out[out.l_returnflag == "A"].iloc[0]
    assert big.sum_base_price == 6 * 9.0e11
    assert big.count_order == 6
    small = out[out.l_returnflag == "N"].iloc[0]
    assert small.sum_qty_discounted == 2.0  # discount 0.06 > 0.05
