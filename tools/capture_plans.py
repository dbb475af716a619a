"""Capture .explain("formatted") for named queries into plans/r<N>/.

Usage:
    python tools/capture_plans.py <suffix> [query ...]

Writes plans/r<N>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set; round N from $SPARK_GRAFT_ROUND, default 16).
Explain only — nothing is executed, so this is safe to run while
other jobs own the box. The round's optimization deliverable: the
judge checks plan claims in OPTIMIZATION_r<N>.md against these
files.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    REPO, "plans", f"r{os.environ.get('SPARK_GRAFT_ROUND', '16')}"
)

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top3_orders_per_cust",
    "events_sessionize_30m",
    "events_tumbling_1h",
    "docs_token_counts",
    "emb_topk_cosine",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)
    registry.load_all()
    spark = get_spark("hetnetdb-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.QUERIES[name]
        df = fn(spark, SF_DIR)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} — explain('formatted'), {suffix}\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
