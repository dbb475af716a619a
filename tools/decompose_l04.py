"""l04_simjoin_lsh_tuned vs l04_simjoin_lsh stage attribution (r16
verdict item 3): name where the tuned variant's extra ~1.0 s lives.

Stages (noop sink, fresh QueryExecution per pass, rotated round-robin
within one session — the decompose_l68 protocol):

  l04:  banded16, cand16, ver16, exact(N^2), full
  tun:  allv (planted union), banded8, cand8, ver8, full

Variant under test: `tuned_onepass` — the same query with the count
branches fused so cand/ver are computed ONCE (cand -> left-join
embeddings -> verified flag -> planted flag -> one aggregate), instead
of the registered 5-branch crossJoin that recomputes cand 3x and ver
2x.

Usage: python tools/decompose_l04.py [N_PASSES] [stages|variants]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables, spread  # noqa: E402
from hetnetdb_spark.expr import dot, r6  # noqa: E402
from hetnetdb_spark.pipeline.similarity import (  # noqa: E402
    DIM,
    N_PLANT,
    PERT,
    PLANT_OFF,
    SEL_BANDS,
    SEL_BITS,
    SEL_TAU,
    _MIX,
    _band_structs,
    band_candidates,
)
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _allv(spark):
    (emb,) = load_tables(spark, SF_DIR, "embeddings")
    emb = spread(emb, key="vec_id")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e"),
    )
    praw = base.filter(F.col("vec_id") < N_PLANT).select(
        "vec_id",
        F.transform(
            F.col("e"),
            lambda x, i: x
            + (
                ((F.col("vec_id") * DIM + i + 1) * F.lit(_MIX) % 1000).cast(
                    "double"
                )
                / 1000.0
                - 0.5
            )
            * F.lit(PERT),
        ).alias("tw"),
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("tw", lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    planted = praw.select(
        (F.col("vec_id") + PLANT_OFF).alias("vec_id"),
        F.transform("tw", lambda x: x / norm).alias("e"),
    )
    return base.unionByName(planted)


def _banded8(spark):
    from hetnetdb_spark.pipeline.similarity import banded_keys  # noqa: PLC0415

    return banded_keys(_allv(spark), n_bands=SEL_BANDS, bits=SEL_BITS, col="e")


def _cand8(spark):
    return band_candidates(_banded8(spark), id_col="vec_id")


def _ver8(spark):
    allv = _allv(spark)
    cand = _cand8(spark)
    ea = allv.select(F.col("vec_id").alias("a_id"), F.col("e").alias("a_e"))
    eb = allv.select(F.col("vec_id").alias("b_id"), F.col("e").alias("b_e"))
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .filter(r6(dot(F.col("a_e"), F.col("b_e"))) >= SEL_TAU)
        .select("a_id", "b_id")
    )


def _full_tuned(spark):
    return registry.QUERIES["l04_simjoin_lsh_tuned"](spark, SF_DIR)


def _full_l04(spark):
    return registry.QUERIES["l04_simjoin_lsh"](spark, SF_DIR)


def _full_l04_old(spark):
    """l04_simjoin_lsh exactly as registered in r15 (old banding
    spelling) — the A/B before arm."""
    from hetnetdb_spark.pipeline.similarity import (  # noqa: PLC0415
        SIM_THRESHOLD,
        l04_simjoin_exact,
    )

    (emb,) = load_tables(spark, SF_DIR, "embeddings")
    emb = spread(emb, key="vec_id")
    banded = emb.select(
        "vec_id", F.explode(F.array(*_band_structs())).alias("band")
    ).select("vec_id", "band.band_id", "band.band_val")
    candidates = band_candidates(banded, id_col="vec_id")
    ea = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb"))
    eb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb"))
    verified = (
        candidates.join(ea, "a_id")
        .join(eb, "b_id")
        .select("a_id", "b_id", r6(dot(F.col("a_emb"), F.col("b_emb"))).alias("cosine"))
        .filter(F.col("cosine") >= SIM_THRESHOLD)
    )
    n_candidates = candidates.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("lsh").alias("strategy"), F.col("n").alias("n_candidates")
    )
    n_verified = verified.agg(F.count(F.lit(1)).alias("n_verified"))
    n_exact = l04_simjoin_exact(spark, SF_DIR).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        n_candidates.crossJoin(n_verified)
        .crossJoin(n_exact)
        .select(
            "strategy",
            "n_candidates",
            "n_verified",
            "n_exact",
            r6(
                F.col("n_verified").cast("double")
                / F.greatest(F.col("n_exact"), F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


def _banded8_old(spark):
    """The r15-era per-plane HOF banding spelling (kept in
    _band_structs; pinned frame-identical to banded_keys by
    tests/test_plans.py) — the A/B 'before' arm."""
    return _allv(spark).select(
        "vec_id",
        F.explode(
            F.array(*_band_structs(n_bands=SEL_BANDS, bits=SEL_BITS, col="e"))
        ).alias("band"),
    ).select("vec_id", "band.band_id", "band.band_val")


def _full_tuned_old(spark):
    """l04_simjoin_lsh_tuned exactly as registered in r15: old
    banding spelling, 5 crossJoined count branches."""
    allv = _allv(spark)
    cand = band_candidates(_banded8_old(spark), id_col="vec_id")
    ea = allv.select(F.col("vec_id").alias("a_id"), F.col("e").alias("a_e"))
    eb = allv.select(F.col("vec_id").alias("b_id"), F.col("e").alias("b_e"))
    ver = (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .filter(r6(dot(F.col("a_e"), F.col("b_e"))) >= SEL_TAU)
        .select("a_id", "b_id")
    )
    pp = (
        _allv(spark)
        .filter(F.col("vec_id") < N_PLANT)
        .select(
            F.col("vec_id").alias("a_id"),
            (F.col("vec_id") + PLANT_OFF).alias("b_id"),
        )
    )
    n_vectors = allv.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_ver = ver.agg(F.count(F.lit(1)).alias("n_verified"))
    n_pp = pp.agg(F.count(F.lit(1)).alias("n_planted"))
    n_rec = (
        ver.join(pp, ["a_id", "b_id"])
        .agg(F.count(F.lit(1)).alias("n_planted_recovered"))
    )
    return (
        n_vectors.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_ver))
        .crossJoin(F.broadcast(n_pp))
        .crossJoin(F.broadcast(n_rec))
        .select(
            F.lit("lsh-8x8-planted").alias("strategy"),
            "n_vectors",
            "n_candidates",
            r6(
                F.col("n_candidates").cast("double")
                / (
                    F.col("n_vectors").cast("double")
                    * (F.col("n_vectors") - 1).cast("double")
                    / 2.0
                )
            ).alias("candidate_rate"),
            "n_verified",
            "n_planted",
            "n_planted_recovered",
            r6(
                F.col("n_planted_recovered").cast("double")
                / F.greatest(F.col("n_planted"), F.lit(1)).cast("double")
            ).alias("recall_planted"),
        )
    )


def _tuned_onepass(spark):
    """Registered tuned query with the count branches FUSED: cand is
    computed once, embeddings join once, verified/planted flags feed
    one aggregate. Output identical by construction (same cand/ver
    sets, same counts, same arithmetic)."""
    allv = _allv(spark)
    cand = _cand8(spark)
    ea = allv.select(F.col("vec_id").alias("a_id"), F.col("e").alias("a_e"))
    eb = allv.select(F.col("vec_id").alias("b_id"), F.col("e").alias("b_e"))
    flags = (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select(
            "a_id",
            "b_id",
            (r6(dot(F.col("a_e"), F.col("b_e"))) >= SEL_TAU).cast("long").alias(
                "is_ver"
            ),
        )
        .withColumn(
            "is_planted_pair",
            (
                (F.col("a_id") < N_PLANT)
                & (F.col("b_id") == F.col("a_id") + PLANT_OFF)
            ).cast("long"),
        )
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("is_ver").alias("n_verified"),
        F.sum(F.col("is_ver") * F.col("is_planted_pair")).alias(
            "n_planted_recovered"
        ),
    )
    n_vectors = allv.agg(F.count(F.lit(1)).alias("n_vectors"))
    n_planted = (
        _allv(spark)
        .filter(F.col("vec_id") < N_PLANT)
        .agg(F.count(F.lit(1)).alias("n_planted"))
    )
    return (
        n_vectors.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(n_planted))
        .select(
            F.lit("lsh-8x8-planted").alias("strategy"),
            "n_vectors",
            "n_candidates",
            r6(
                F.col("n_candidates").cast("double")
                / (
                    F.col("n_vectors").cast("double")
                    * (F.col("n_vectors") - 1).cast("double")
                    / 2.0
                )
            ).alias("candidate_rate"),
            "n_verified",
            "n_planted",
            "n_planted_recovered",
            r6(
                F.col("n_planted_recovered").cast("double")
                / F.greatest(F.col("n_planted"), F.lit(1)).cast("double")
            ).alias("recall_planted"),
        )
    )


STAGES = {
    "allv": _allv,
    "banded8": _banded8,
    "cand8": _cand8,
    "ver8": _ver8,
    "full_tuned": _full_tuned,
    "full_l04": _full_l04,
}

VARIANTS = {
    "full_tuned_old": _full_tuned_old,
    "full_tuned": _full_tuned,
    "tuned_onepass": _tuned_onepass,
}


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    mode = sys.argv[2] if len(sys.argv) > 2 else "stages"
    registry.load_all()
    spark = get_spark("l04-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    table = STAGES if mode == "stages" else VARIANTS
    walls: dict[str, list[float]] = {n: [] for n in table}
    for _, build in table.items():
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(table)
    for i in range(n_passes):
        for name in names[i % len(names):] + names[: i % len(names)]:
            spark.sparkContext.setJobDescription(f"l04 {name} #{i}")
            t0 = time.perf_counter()
            table[name](spark).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        print(
            f"{name:14s} min {min(ws):.3f}  med {sorted(ws)[len(ws)//2]:.3f}"
            f"  walls {[round(w, 3) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
