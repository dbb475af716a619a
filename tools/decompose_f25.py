"""f25_xml_roundtrip decomposition (r16 verdict item 7): name where
the 1.7 s wall lives — from_xml, the two xpath_* lookups, or the
final sort. Each stage adds one piece onto the same filtered scan +
XML construction.

Usage: python tools/decompose_f25.py [N_PASSES]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _xml(spark):
    (orders,) = load_tables(spark, SF_DIR, "orders")
    xml = F.concat(
        F.lit("<r><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_totalprice").cast("string"),
        F.lit("</p><s>"), F.col("o_orderpriority"),
        F.lit("</s></r>"),
    )
    return orders.filter(F.col("o_orderkey") % 20 == 3).select(
        "o_orderkey", xml.alias("xml")
    )


def _from_xml(spark):
    df = _xml(spark)
    return df.select(
        "o_orderkey",
        "xml",
        F.from_xml(F.col("xml"), "k BIGINT, p DOUBLE, s STRING").alias("x"),
    )


def _xpath_long(spark):
    return _xml(spark).select(
        "o_orderkey", F.expr("xpath_long(xml, '/r/k')").alias("xp_k")
    )


def _xpath_string(spark):
    return _xml(spark).select(
        "o_orderkey", F.expr("xpath_string(xml, '/r/s')").alias("xp_pri")
    )


def _nosort(spark):
    df = _from_xml(spark)
    return df.select(
        "o_orderkey",
        F.col("x.k").alias("k_back"),
        F.round(F.col("x.p"), 6).alias("price_back"),
        F.col("x.s").alias("pri_back"),
        F.expr("xpath_long(xml, '/r/k')").alias("xp_k"),
        F.expr("xpath_string(xml, '/r/s')").alias("xp_pri"),
    )


def _full(spark):
    return registry.QUERIES["f25_xml_roundtrip"](spark, SF_DIR)


def _sortfirst(spark):
    """Variant: global sort on o_orderkey BEFORE the xml/xpath
    projections — the range-sampling pass then re-executes only the
    filtered scan, not the XML machinery, and the projections run
    exactly once, post-sort. Same rows, same order (o_orderkey is
    unique; the projection is 1:1)."""
    (orders,) = load_tables(spark, SF_DIR, "orders")
    xml = F.concat(
        F.lit("<r><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_totalprice").cast("string"),
        F.lit("</p><s>"), F.col("o_orderpriority"),
        F.lit("</s></r>"),
    )
    parsed = (
        orders.filter(F.col("o_orderkey") % 20 == 3)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
        .select(
            "o_orderkey",
            xml.alias("xml"),
            F.from_xml(xml, "k BIGINT, p DOUBLE, s STRING").alias("x"),
        )
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.k").alias("k_back"),
        F.round(F.col("x.p"), 6).alias("price_back"),
        F.col("x.s").alias("pri_back"),
        F.expr("xpath_long(xml, '/r/k')").alias("xp_k"),
        F.expr("xpath_string(xml, '/r/s')").alias("xp_pri"),
    )


STAGES = {
    "xml": _xml,
    "from_xml": _from_xml,
    "xpath_long": _xpath_long,
    "xpath_string": _xpath_string,
    "nosort": _nosort,
    "full": _full,
}


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry.load_all()
    spark = get_spark("f25-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    walls: dict[str, list[float]] = {n: [] for n in STAGES}
    for _, build in STAGES.items():
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(STAGES)
    for i in range(n_passes):
        for name in names[i % len(names):] + names[: i % len(names)]:
            spark.sparkContext.setJobDescription(f"f25 {name} #{i}")
            t0 = time.perf_counter()
            STAGES[name](spark).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        print(
            f"{name:12s} min {min(ws):.3f}  med {sorted(ws)[len(ws)//2]:.3f}"
            f"  walls {[round(w, 3) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
