"""l73_semantic_dedup_refined per-stage breakdown (r16 verdict item
5): fixed-iteration loop — is the wall per-round fixed cost (plan
depth, repeated subtree recompute) or data compute?

Stages (noop sink, fresh QueryExecution per pass, rotated
round-robin): normed -> assign1 -> cent2 -> assign2 -> members ->
dropped -> full. `members` appears 3x in the registered DAG (final
left join + both self-join legs), so everything upstream of it runs
3x per execution; the stage walls below price one copy.

Usage: python tools/decompose_l73.py [N_PASSES]
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
from hetnetdb_spark.expr import dot, r6  # noqa: E402
from hetnetdb_spark.pipeline.dedup import (  # noqa: E402
    L73_K,
    L73_OFF,
    L73_PLANT,
    L73_TAU,
    _L73_DIM,
)
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normed(spark):
    (emb,) = load_tables(spark, SF_DIR, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    variants = (
        base.filter(F.col("vec_id") < L73_PLANT)
        .select(
            (F.col("vec_id") + L73_OFF).alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {_L73_DIM}), i -> element_at(v, i)"
                f" + if(i = (vec_id % {_L73_DIM}) + 1,"
                f" 0.05 + (vec_id % 8) * 0.05, cast(0.0 as double)))"
            ).alias("v"),
        )
    )
    allv = base.unionByName(variants)
    return allv.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))


def _assign(mem, cents):
    scored = mem.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.struct(
            r6(dot(F.col("v"), F.col("c")) / (F.col("nrm") * F.col("cnrm"))).alias(
                "cs"
            ),
            (-F.col("k")).alias("negk"),
        ).alias("skey"),
    )
    return scored.groupBy("vec_id").agg(
        (-F.max("skey").getField("negk")).cast("bigint").alias("k")
    )


def _assign1(spark):
    normed = _normed(spark)
    seeds = normed.filter(F.col("vec_id") < L73_K).select(
        F.col("vec_id").alias("k"), F.col("v").alias("c"), F.col("nrm").alias("cnrm")
    )
    return _assign(normed, seeds)


def _cent2(spark):
    normed = _normed(spark)
    comp2 = (
        normed.join(_assign1(spark), "vec_id")
        .select("k", F.explode(F.expr(f"sequence(1, {_L73_DIM})")).alias("pos"), "v")
        .select("k", "pos", F.element_at("v", F.col("pos")).alias("val"))
        .groupBy("k", "pos")
        .agg(r6(F.avg("val")).alias("cval"))
    )
    return (
        comp2.groupBy("k")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.getField("cval"),
            ).alias("c")
        )
        .withColumn("cnrm", F.sqrt(dot(F.col("c"), F.col("c"))))
    )


def _assign2(spark):
    return _assign(_normed(spark), _cent2(spark))


def _members(spark):
    return (
        _normed(spark)
        .join(_assign2(spark), "vec_id")
        .select("vec_id", "v", "nrm", "k")
    )


def _dropped(spark):
    members = _members(spark)
    a = members.select(
        F.col("k"),
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"),
        F.col("nrm").alias("a_n"),
    )
    b = members.select(
        F.col("k"),
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"),
        F.col("nrm").alias("b_n"),
    )
    return (
        a.join(b, "k")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            r6(dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n")))
            >= F.lit(L73_TAU)
        )
        .select("k", F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )


def _full(spark):
    return registry.QUERIES["l73_semantic_dedup_refined"](spark, SF_DIR)


# ---- r16 treatments -----------------------------------------------------


def _cent2_fast(spark):
    """T1: centroid recompute as DIM simultaneous avg(element_at)
    aggregates in ONE hash agg (the _lloyd_refine pattern) — no
    explode shuffle, no collect_list sort. Same r6-rounded
    components (the 6dp quantization absorbs summation-order ulps
    BY DESIGN — that is what makes the DuckDB twin possible)."""
    normed = _normed(spark)
    assigned = normed.join(_assign1(spark), "vec_id")
    cent = assigned.groupBy("k").agg(
        *[
            r6(F.avg(F.element_at("v", i))).alias(f"c{i}")
            for i in range(1, _L73_DIM + 1)
        ]
    )
    return cent.select(
        "k",
        F.array(*[F.col(f"c{i}") for i in range(1, _L73_DIM + 1)]).alias("c"),
    ).withColumn("cnrm", F.sqrt(dot(F.col("c"), F.col("c"))))


def _assign2_fast(spark):
    return _assign(_normed(spark), _cent2_fast(spark))


def _members_fast(spark):
    return (
        _normed(spark)
        .join(_assign2_fast(spark), "vec_id")
        .select("vec_id", "v", "nrm", "k")
    )


def _full_fast(spark):
    """T1 + T2: fast centroids everywhere; the member-count leg
    aggregates assign2 directly (no normed re-join for counting)."""
    members = _members_fast(spark)
    a = members.select(
        F.col("k"),
        F.col("vec_id").alias("a_id"), F.col("v").alias("a_v"),
        F.col("nrm").alias("a_n"),
    )
    b = members.select(
        F.col("k"),
        F.col("vec_id").alias("b_id"), F.col("v").alias("b_v"),
        F.col("nrm").alias("b_n"),
    )
    dropped = (
        a.join(b, "k")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            r6(dot(F.col("a_v"), F.col("b_v")) / (F.col("a_n") * F.col("b_n")))
            >= F.lit(L73_TAU)
        )
        .select("k", F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    counts = _assign2_fast(spark).select("vec_id", "k")
    return (
        counts.join(dropped, ["k", "vec_id"], "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.count("is_dropped").cast("bigint").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("is_dropped"))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("is_dropped") == 1, F.col("vec_id"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dropped_id_sum"),
        )
        .select(
            F.col("k").alias("cluster_id"),
            "n_members",
            "n_dropped",
            "n_kept",
            "dropped_id_sum",
        )
        .orderBy("cluster_id")
    )


STAGES = {
    "normed": _normed,
    "assign1": _assign1,
    "cent2": _cent2,
    "assign2": _assign2,
    "members": _members,
    "dropped": _dropped,
    "full": _full,
}


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    registry.load_all()
    spark = get_spark("l73-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    walls: dict[str, list[float]] = {n: [] for n in STAGES}
    for _, build in STAGES.items():
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(STAGES)
    for i in range(n_passes):
        for name in names[i % len(names):] + names[: i % len(names)]:
            spark.sparkContext.setJobDescription(f"l73 {name} #{i}")
            t0 = time.perf_counter()
            STAGES[name](spark).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    for name, ws in walls.items():
        print(
            f"{name:9s} min {min(ws):.3f}  med {sorted(ws)[len(ws)//2]:.3f}"
            f"  walls {[round(w, 3) for w in ws]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
