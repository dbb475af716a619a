"""Audit every oracle-checked query for negative-zero emissions.

The driver's correctness gate hashes raw values, so ``-0.0`` and
``0.0`` are different bytes even though every numeric comparison
calls them equal (this is exactly what made a19 driver-red while
local-green in rounds 4-5). This tool runs BOTH sides of every
registered oracle pair at the given SF and reports any float column
that contains a negative zero on either side — whether or not the
two sides currently agree, because agreement at one SF does not
survive a data change.

Usage:  python tools/audit_signed_zero.py [sf_dir]
Output: one line per (query, column, side) with a -0.0 count, then
        a summary list of queries needing the z-round treatment.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hetnetdb_spark import registry
from hetnetdb_spark.schemas import TABLE_NAMES
from hetnetdb_spark.session import get_spark


def neg_zero_cols(pdf: pd.DataFrame) -> dict[str, int]:
    out: dict[str, int] = {}
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            a = pdf[c].to_numpy(dtype="float64", na_value=np.nan)
            n = int(((a == 0.0) & np.signbit(a)).sum())
            if n:
                out[c] = n
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    registry.load_all()
    spark = get_spark("signed-zero-audit")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    flagged: dict[str, set[str]] = {}
    skip = {q for q in registry.ORACLE if q.startswith("t")}  # streaming: slow, audited separately
    for qname in sorted(registry.ORACLE):
        if qname in skip:
            continue
        try:
            spdf = registry.QUERIES[qname](spark, sf_dir).toPandas()
            dpdf = con.execute(registry.ORACLE[qname]).fetchdf()
        except Exception as e:  # noqa: BLE001 - audit keeps going
            print(f"ERR  {qname}: {type(e).__name__}: {e}", flush=True)
            continue
        for side, pdf in (("spark", spdf), ("oracle", dpdf)):
            hits = neg_zero_cols(pdf)
            for col, n in hits.items():
                print(f"NEGZ {qname} {side} {col} x{n}", flush=True)
                flagged.setdefault(qname, set()).add(col)

    print("\n== queries needing signed-zero normalization ==")
    for qname in sorted(flagged):
        print(f"{qname}: {sorted(flagged[qname])}")
    if not flagged:
        print("(none)")


if __name__ == "__main__":
    main()
