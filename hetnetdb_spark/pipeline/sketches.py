"""Frequency-sketch operators over the token stream — the
"what are the heavy keys" primitives a corpus pipeline runs before
vocabulary construction, stop-word lists, or skew diagnosis.

Design rule of the family: sketches propose, the JVM disposes. A
sketch pass (Misra–Gries here) runs close to the data and emits a
SMALL candidate set with a proven coverage guarantee; the final
answer is then an exact, fully relational recount restricted to the
candidates. The output is therefore exact and engine-independent —
sketch nondeterminism (partitioning, batch boundaries) can change
which EXTRA candidates are proposed, never the reported rows — so
every query here carries a full DuckDB oracle despite using an
approximate algorithm internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.registry import query

# --------------------------------------------------------------------------
# L41 — exact heavy hitters via a Misra–Gries candidate pass
# --------------------------------------------------------------------------

#: report tokens with count > n_total / L41_K (0.5% of the stream)
L41_K = 200

L41_ORACLE = f"""
WITH t AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
tot AS (SELECT COUNT(*) AS n_total FROM t)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       ROUND(COUNT(*) * 1.0 / (SELECT n_total FROM tot), 6) AS freq
FROM t
GROUP BY term
HAVING COUNT(*) * {L41_K} > (SELECT n_total FROM tot)
"""


@query("l41_heavy_hitters", oracle=L41_ORACLE)
def l41_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L41 — every token whose frequency exceeds 1/K of the corpus
    token stream (K=200 → 0.5%), with its exact count.

    Why not just groupBy(term).count(): at 100 TB the full term
    aggregate shuffles the entire vocabulary — billions of
    singleton keys moved across the wire to answer a question about
    the ~K heaviest. The scale shape is two passes:

    1. **Candidate pass** — per-partition Misra–Gries with capacity
       K via `mapInPandas` (narrow: no shuffle; the Python crossing
       is amortized over Arrow batches and carries one string
       column). Each partition emits ≤K surviving terms. Coverage
       proof: a capacity-K summary's cumulative decrement M obeys
       M·(K+1) ≤ n_p (each trim step removing m from the K
       survivors also removes ≥m from dropped keys), so a term
       absent from EVERY partition summary has global count
       ≤ Σ n_p/(K+1) < n/K — i.e. the union of summaries contains
       every true heavy hitter. ≤K·partitions candidate rows total.
    2. **Exact recount** — broadcast the candidate set back over
       the token stream, aggregate counts for candidates only
       (map-side partial agg on ≤K·partitions keys), and keep
       count·K > n_total. The n_total comparison stays relational:
       a 1-row ungrouped agg crossJoin-broadcast, no driver
       collect.

    The reported rows are EXACT and independent of partitioning —
    the sketch only affects which superset of candidates gets
    recounted — which is what licenses the full oracle (plain
    GROUP BY / HAVING in DuckDB). freq is a single division of
    identical integers on both engines, then r6."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    terms = documents.select(F.explode(F.split(F.col("text"), " ")).alias("term"))

    cap = L41_K

    def misra_gries(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
            if len(counts) > cap:
                vals = sorted(counts.values())
                m = vals[len(counts) - cap - 1]
                counts = {k: v - m for k, v in counts.items() if v > m}
        yield pd.DataFrame({"term": list(counts)})

    candidates = terms.mapInPandas(misra_gries, "term string").distinct()
    totals = terms.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        terms.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * L41_K > F.col("n_total"))
        .select(
            "term",
            "cnt",
            F.round(F.col("cnt") * F.lit(1.0) / F.col("n_total"), 6).alias("freq"),
        )
    )
