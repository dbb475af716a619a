"""Five-minute tour of the engine's public API.

Run from the repo root:

    python examples/demo.py [sf_dir]

Shows the three entry styles — raw SQL over the registered catalog,
named operator queries, and per-operator runtime profiling.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hetnetdb_spark as hs
from hetnetdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("hetnetdb-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. Arbitrary SQL over the catalog ==")
    hs.sql(
        spark,
        sf_dir,
        """
        SELECT n_name, ROUND(SUM(o_totalprice), 2) AS spend
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY spend DESC LIMIT 5
        """,
    ).show()

    print(f"== 2. {len(hs.list_queries())} named operator queries ==")
    hs.run(spark, sf_dir, "q1_pricing_summary").show(3)
    hs.run(spark, sf_dir, "l01_exact_dedup").show(3)
    print("-- the corpus-prep funnel, one DAG --")
    hs.run(spark, sf_dir, "l40_prep_pipeline").show(3)
    print("-- quality contracts: the approximations audit themselves --")
    hs.run(spark, sf_dir, "l70_minhash_recall_curve").show()
    hs.run(spark, sf_dir, "l69_ivf_recall").show()
    print("-- pre-flight skew audit for the big shuffles --")
    hs.run(spark, sf_dir, "s38_shuffle_skew_audit").show()

    print("== 3. Per-operator runtime metrics ==")
    for rec in hs.profile(spark, sf_dir, "q3_shipping_priority"):
        rows = rec["metrics"].get("numOutputRows")
        if rows is not None:
            print(f"  {'  ' * rec['depth']}{rec['operator']}: {rows} rows")

    print("== 4. Stateful streaming (round 9: the full state matrix) ==")
    print("-- pipe-syntax SQL front end (|>) --")
    hs.run(spark, sf_dir, "s40_sql_pipe_syntax").show(3)
    print("-- ListState bounded recency buffer (last 3 per user) --")
    hs.run(spark, sf_dir, "t20_list_state_lastk").show(3)
    print("-- a checkpoint's state store, read back as a DataFrame --")
    hs.run(spark, sf_dir, "t25_state_reader").show(3)

    print("== 5. Round 10: honest-measurement additions ==")
    print("-- schema-evolution union: by-name landing + NULL fill pinned --")
    hs.run(spark, sf_dir, "o11_union_by_name").show(3)
    print("-- MinHash estimator accuracy per Jaccard bucket (l70's twin) --")
    hs.run(spark, sf_dir, "l72_minhash_estimate_error").show()


if __name__ == "__main__":
    main()
