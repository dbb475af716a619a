"""l68_dup_span_removal stage decomposition (r16 verdict item 1).

The l71-style noop-sink protocol (guide §1.4): rebuild each prefix of
the operator's dataflow as its own DataFrame, time
`write.format("noop")` on it with a FRESH QueryExecution per pass
(call the builder per pass — re-collecting a held DataFrame re-serves
its materialized AQE stages), min over N passes, jobs labeled for the
UI. Stages mirror dedup.l68_dup_span_removal exactly:

  grams     explode + md5 of every K-char gram position
  dupg      grams -> groupBy(g) count>1 (the stats leg)
  hits      grams join dup_grams on g  (the SMJ both ways)
  islands   hits -> two doc_id windows (island build)
  per_doc   spans + per-doc rollup
  full      the registered query

Usage: python tools/decompose_l68.py [N_PASSES]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hetnetdb_spark import registry  # noqa: E402
from hetnetdb_spark.catalog import load_tables, spread  # noqa: E402
from hetnetdb_spark.pipeline.dedup import SUBSTR_K  # noqa: E402
from hetnetdb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _grams(spark):
    (documents,) = load_tables(spark, SF_DIR, "documents")
    documents = spread(documents)
    n = F.char_length("text")
    return documents.select(
        "doc_id",
        "source",
        F.posexplode(
            F.when(
                n >= SUBSTR_K,
                F.expr(
                    f"transform(sequence(1, char_length(text) - {SUBSTR_K} + 1),"
                    f" q -> substring(text, q, {SUBSTR_K}))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "gram"),
    ).select(
        "doc_id",
        "source",
        (F.col("pos0") + 1).cast("long").alias("p"),
        F.md5("gram").alias("g"),
    )


def _dupg(spark):
    return (
        _grams(spark)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def _hits(spark):
    grams = _grams(spark)
    dup_grams = _dupg(spark)
    return grams.join(dup_grams.select("g").hint("merge"), "g").select(
        "doc_id", "source", "p"
    )


def _islands(spark):
    hits = _hits(spark)
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("p") + SUBSTR_K - 1).over(w_prev)
    flagged = hits.withColumn(
        "is_new",
        F.when(F.col("p") > F.coalesce(prev_end, F.lit(-1)) + 1, 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.withColumn("island", F.sum("is_new").over(w_run))


def _per_doc(spark):
    spans = _islands(spark).groupBy("doc_id", "source", "island").agg(
        (F.max("p") + SUBSTR_K - 1 - F.min("p") + 1).alias("span_len")
    )
    return spans.groupBy("doc_id", "source").agg(
        F.sum("span_len").alias("removed")
    )


def _full(spark):
    return registry.QUERIES["l68_dup_span_removal"](spark, SF_DIR)


# ---- r16 variants under test -------------------------------------------


def _hits_window(spark):
    """Variant A: per-g duplicate flag via a window count instead of
    groupBy+self-join — ONE gram computation, ONE exchange of the
    gram relation (the window's), no SMJ."""
    grams = _grams(spark)
    w = Window.partitionBy("g")
    return (
        grams.withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt") > 1)
        .select("doc_id", "source", "p")
    )


def _downstream(spark, hits):
    """The unchanged island build + rollup over a given hits frame."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("p") + SUBSTR_K - 1).over(w_prev)
    flagged = hits.withColumn(
        "is_new",
        F.when(F.col("p") > F.coalesce(prev_end, F.lit(-1)) + 1, 1).otherwise(0),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    spans = islands.groupBy("doc_id", "source", "island").agg(
        (F.max("p") + SUBSTR_K - 1 - F.min("p") + 1).alias("span_len")
    )
    return spans.groupBy("doc_id", "source").agg(
        F.sum("span_len").alias("removed")
    )


def _finish_join(spark, per_doc):
    """The registered ending: corpus-sized left join documents<-per_doc."""
    (documents,) = load_tables(spark, SF_DIR, "documents")
    documents = spread(documents)
    n = F.char_length("text")
    base = documents.select("doc_id", "source", n.cast("long").alias("nc"))
    removed = F.coalesce("removed", F.lit(0))
    return (
        base.join(per_doc.hint("merge"), ["doc_id", "source"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(removed > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_dup"),
            F.sum("nc").alias("chars_total"),
            F.sum(removed).cast("bigint").alias("chars_removed"),
        )
    )


def _finish_split(spark, per_doc):
    """Variant B ending: per-source totals from documents alone +
    per-source dup stats from per_doc alone, joined at |sources|
    rows — no corpus-sized join (every per_doc row has removed>0 by
    construction: span_len >= 1)."""
    (documents,) = load_tables(spark, SF_DIR, "documents")
    n = F.char_length("text")
    tot = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n.cast("long")).alias("chars_total"),
    )
    dup = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_with_dup"),
        F.sum("removed").cast("bigint").alias("chars_removed"),
    )
    return (
        tot.join(F.broadcast(dup), "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("docs_with_dup", F.lit(0)).alias("docs_with_dup"),
            "chars_total",
            F.coalesce("chars_removed", F.lit(0)).alias("chars_removed"),
        )
    )


def _full_wjoin(spark):
    return _finish_join(spark, _downstream(spark, _hits_window(spark)))


def _full_wsplit(spark):
    return _finish_split(spark, _downstream(spark, _hits_window(spark)))


def _grams_u(spark):
    """grams with the g key narrowed to unhex(md5) — 16 raw bytes
    instead of 32 hex chars crossing every exchange; same md5 hash
    family (the replay contract), same equality classes (unhex is
    injective on hex strings), g never appears in the output."""
    return _grams(spark).withColumn("g", F.unhex(F.col("g")))


def _hits_u(spark):
    grams = _grams_u(spark)
    dup_grams = (
        grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).filter(
            F.col("cnt") > 1
        )
    )
    return grams.join(dup_grams.select("g").hint("merge"), "g").select(
        "doc_id", "source", "p"
    )


def _full_u(spark):
    return _finish_join(spark, _downstream(spark, _hits_u(spark)))


def _full_usplit(spark):
    return _finish_split(spark, _downstream(spark, _hits_u(spark)))


def _hits_uw(spark):
    grams = _grams_u(spark)
    w = Window.partitionBy("g")
    return (
        grams.withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("cnt") > 1)
        .select("doc_id", "source", "p")
    )


def _full_uw(spark):
    return _finish_join(spark, _downstream(spark, _hits_uw(spark)))


STAGES = {
    "grams": _grams,
    "dupg": _dupg,
    "hits": _hits,
    "hits_w": _hits_window,
    "islands": _islands,
    "per_doc": _per_doc,
    "full": _full,
    "full_wjoin": _full_wjoin,
    "full_wsplit": _full_wsplit,
}

#: Interleaved full-query A/B set (drift-cancelling round-robin).
VARIANTS = {
    "full": _full,
    "full_u": _full_u,
    "full_wjoin2": _full_wjoin,
    "full_uw": _full_uw,
    "full_usplit": _full_usplit,
}


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    mode = sys.argv[2] if len(sys.argv) > 2 else "stages"
    registry.load_all()
    if mode.startswith("fresh:"):
        # r16 scale A/B: ONE variant in THIS process (cold + min-of-n
        # noop-sink passes), so an outer loop can alternate arms
        # across fresh JVMs — the isolated protocol the 300× disk
        # failure was diagnosed under, with per-process spill dirs.
        name = mode.split(":", 1)[1]
        build = {**STAGES, **VARIANTS}[name]
        spark = get_spark(f"l68-fresh-{name}")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        walls = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            build(spark).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        print(
            f"FRESH {name} sf={SF_DIR} cold {cold:.3f}"
            f" min{n_passes} {min(walls):.3f} walls {[round(w,3) for w in walls]}",
            flush=True,
        )
        spark.stop()
        return
    spark = get_spark("l68-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    table = STAGES if mode == "stages" else VARIANTS
    walls: dict[str, list[float]] = {n: [] for n in table}
    for name, build in table.items():  # one untimed warm pass each
        build(spark).write.format("noop").mode("overwrite").save()
    names = list(table)
    for i in range(n_passes):  # round-robin: drift hits all variants;
        # rotate the in-round order so no variant always runs first
        for name in names[i % len(names):] + names[: i % len(names)]:
            build = table[name]
            spark.sparkContext.setJobDescription(f"l68 {name} #{i}")
            t0 = time.perf_counter()
            build(spark).write.format("noop").mode("overwrite").save()
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
