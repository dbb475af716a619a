"""Matrix-decomposition operators over the embedding table.

The scale pattern here is "big data, small model": the cluster
reduces 100 TB of vectors to a tiny sufficient statistic (here an
8×8 covariance — 64 decimal-exact sums), the model itself is solved
on the driver in microseconds, and the result broadcasts back. The
same shape as IVF's Lloyd pass (similarity.py) and the source
centroids (text.py L29).

Cross-engine exactness is by CONSTRUCTION, not by tolerance: the
sufficient statistics accumulate in DECIMAL (order-independent,
bit-identical on both engines), and everything downstream — the
covariance entries, eighty power-iteration steps, the Rayleigh
quotient — is +, *, /, sqrt on identical doubles in an identical
left-associative order. All four ops are IEEE-correctly-rounded, so
the oracle's recursive-CTE replay produces the same bits, and the
final r6 is belt-and-braces (a decimal quantum tie would need an
odd multiple of 5e-15 to be dyadic, which is impossible).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import zround
from hetnetdb_spark.registry import query

#: leading dims used for the decomposition — keeps the 8×8 moment
#: matrix (64 aggregates) small enough to spell in the replay
#: oracle; the Spark path is dimension-generic.
L46_D = 8
L46_ITERS = 80


def _sum_cols_sql() -> str:
    """The 8 first-moment and 64 second-moment decimal sums."""
    cols = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for i in range(1, L46_D + 1):
        cols.append(
            f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE) AS DECIMAL(28,14)))"
            f" AS DOUBLE) AS s{i}"
        )
    for i in range(1, L46_D + 1):
        for j in range(1, L46_D + 1):
            cols.append(
                f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE)"
                f" * CAST(embedding[{j}] AS DOUBLE) AS DECIMAL(28,14)))"
                f" AS DOUBLE) AS s{i}_{j}"
            )
    return ",\n       ".join(cols)


def _cov_cols_sql() -> str:
    cols = ["n"]
    for i in range(1, L46_D + 1):
        for j in range(1, L46_D + 1):
            cols.append(f"(s{i}_{j} - s{i} * s{j} / n) / n AS c{i}_{j}")
    return ",\n       ".join(cols)


def _mv_sql(i: int, vec_prefix: str = "v") -> str:
    """u_i = Σ_j c_ij · v_j as an explicit left-associative chain."""
    return " + ".join(f"c{i}_{j} * {vec_prefix}{j}" for j in range(1, L46_D + 1))


def _l46_oracle() -> str:
    u_exprs = [_mv_sql(i) for i in range(1, L46_D + 1)]
    norm = " + ".join(f"({u}) * ({u})" for u in u_exprs)
    step_cols = ", ".join(
        f"({u}) / SQRT({norm}) AS v{i}" for i, u in enumerate(u_exprs, 1)
    )
    rayleigh = " + ".join(f"({u}) * v{i}" for i, u in enumerate(u_exprs, 1))
    unpivot = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS dim, ROUND(v{i}, 6) + 0.0 AS loading, "
        f"ROUND({rayleigh}, 6) + 0.0 AS eigenvalue FROM last, c"
        if i == 1
        else f"SELECT CAST({i} AS BIGINT), ROUND(v{i}, 6) + 0.0, "
        f"ROUND({rayleigh}, 6) + 0.0 FROM last, c"
        for i in range(1, L46_D + 1)
    )
    return f"""
WITH RECURSIVE
m AS (
    SELECT {_sum_cols_sql()}
    FROM embeddings
),
c AS (
    SELECT {_cov_cols_sql()}
    FROM m
),
it AS (
    SELECT 0 AS k, {", ".join(f"CAST(1.0 AS DOUBLE) AS v{i}" for i in range(1, L46_D + 1))}
    UNION ALL
    SELECT k + 1, {step_cols}
    FROM it, c WHERE k < {L46_ITERS}
),
last AS (SELECT * FROM it WHERE k = {L46_ITERS})
{unpivot}
"""


@query("l46_pca_power_iteration", oracle=_l46_oracle())
def l46_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L46 — top principal component of the embedding distribution
    (leading 8 dims), by 80 power-iteration steps on the exact
    covariance: the whitening/compression primitive in front of
    embedding dedup and ANN (SemDeDup clusters in PCA space;
    IVF recall improves after decorrelation).

    Distributed part: ONE scan reduces the vectors to 8 first- and
    64 second-moment sums, accumulated in DECIMAL(28,14) so the
    statistics are bit-identical regardless of partitioning (the
    per-element double products are IEEE-exact reproductions of the
    oracle's). That 73-value sufficient statistic is the entire
    driver fetch — the "big data, small model" shape; the iteration
    itself touches no data.

    Driver part: v ← C v / ‖C v‖ from an all-ones seed, 80 steps,
    every sum spelled LEFT-ASSOCIATIVE to match the oracle's
    generated expression chain, then the Rayleigh quotient for the
    eigenvalue. The oracle replays the identical arithmetic in a
    recursive CTE — +, *, /, sqrt are all correctly rounded, so
    both engines walk the same bit sequence and the comparison
    needs no tolerance (r6 is formality).

    At 100 TB: the moment pass is map-side partial aggregation into
    73 decimal cells — KB-scale shuffle; full-width PCA (d² cells)
    or top-k components (orthogonal-iteration) change the model
    size, not the data movement.
    """
    (emb,) = load_tables(spark, sf_dir, "embeddings")
    x = [F.col("embedding")[i].cast("double") for i in range(L46_D)]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [
        F.sum(x[i].cast("decimal(28,14)")).cast("double").alias(f"s{i + 1}")
        for i in range(L46_D)
    ]
    aggs += [
        F.sum((x[i] * x[j]).cast("decimal(28,14)"))
        .cast("double")
        .alias(f"s{i + 1}_{j + 1}")
        for i in range(L46_D)
        for j in range(L46_D)
    ]
    row = emb.agg(*aggs).collect()[0]
    n = row["n"]
    c = [
        [
            (row[f"s{i}_{j}"] - row[f"s{i}"] * row[f"s{j}"] / n) / n
            for j in range(1, L46_D + 1)
        ]
        for i in range(1, L46_D + 1)
    ]

    def mv(vec: list[float]) -> list[float]:
        out = []
        for i in range(L46_D):
            acc = c[i][0] * vec[0]
            for j in range(1, L46_D):
                acc = acc + c[i][j] * vec[j]
            out.append(acc)
        return out

    v = [1.0] * L46_D
    for _ in range(L46_ITERS):
        u = mv(v)
        acc = (u[0]) * (u[0])
        for i in range(1, L46_D):
            acc = acc + (u[i]) * (u[i])
        norm = math.sqrt(acc)
        v = [ui / norm for ui in u]
    u = mv(v)
    lam = (u[0]) * v[0]
    for i in range(1, L46_D):
        lam = lam + (u[i]) * v[i]

    out = spark.createDataFrame(
        [(i + 1, v[i], lam) for i in range(L46_D)],
        "dim long, loading double, eigenvalue double",
    )
    return out.select(
        "dim", zround(F.col("loading")).alias("loading"),
        zround(F.col("eigenvalue")).alias("eigenvalue"),
    )
