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
from pyspark.sql.window import Window

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


# --------------------------------------------------------------------------
# L47 — hashing-trick featurizer (fixed-width bag-of-words vectors)
# --------------------------------------------------------------------------

L47_DIMS = 16

L47_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents WHERE doc_id < 50
),
bucketed AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('f:' || term), 1, 15) AS BIGINT)
               % {L47_DIMS} AS dim,
           COUNT(*) AS cnt
    FROM tok
    GROUP BY doc_id, dim
),
norms AS (
    SELECT doc_id, dim, cnt,
           SUM(cnt * cnt) OVER (PARTITION BY doc_id) AS sq
    FROM bucketed
)
SELECT doc_id,
       CAST(dim AS BIGINT) AS dim,
       CAST(cnt AS BIGINT) AS cnt,
       ROUND(cnt / SQRT(CAST(sq AS DOUBLE)), 6) AS value
FROM norms
"""


@query("l47_hashed_features", oracle=L47_ORACLE)
def l47_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L47 — the hashing trick: map every token to one of 16 feature
    dims by a portable hash and emit each document's L2-normalized
    count vector (sparse (doc, dim, value) triples). The
    zero-vocabulary featurizer (Weinberger et al.) that turns raw
    text into fixed-width model input with NO trained state, no
    vocabulary broadcast, and no OOV path — the feature step in
    front of the linear-probe classifiers a corpus pipeline uses
    for quality/topic routing.

    Determinism: bucket = house md5 spell mod D — identical int64
    on both engines; counts are integers; the only float op is one
    division by sqrt(sum of squared ints), a single
    correctly-rounded op pair on identical inputs — exact parity,
    r6 as formality.

    Shape: explode → ONE (doc_id, dim) hash agg (≤D rows per doc
    out of the shuffle, regardless of document length — the hash
    agg does the compression map-side) → per-doc norm via a window
    on the same doc_id key. Bounded to doc_id < 50 to keep the
    compared frame small; the plan is corpus-size independent.
    At 100 TB dims would be 2^18+ and the output written column-major
    (dim-partitioned) for the trainer — same two-operator plan."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    tok = documents.filter(F.col("doc_id") < 50).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f:"), F.col("term"))), 1, 15),
            16,
            10,
        ).cast("long")
        % L47_DIMS
    )
    bucketed = tok.groupBy("doc_id", bucket.alias("dim")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    sq = F.sum(F.col("cnt") * F.col("cnt")).over(Window.partitionBy("doc_id"))
    return bucketed.select(
        "doc_id",
        "dim",
        "cnt",
        F.round(F.col("cnt") / F.sqrt(sq.cast("double")), 6).alias("value"),
    )


# --------------------------------------------------------------------------
# A27 — count-min sketch contract (overestimate-only, eps*n bound)
# --------------------------------------------------------------------------

A27_EPS = 0.01
A27_CONF = 0.99
A27_SEED = 42
A27_TOP = 10

A27_ORACLE = f"""
WITH t AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS exact_cnt,
       TRUE AS never_underestimates,
       TRUE AS within_eps_n
FROM t
GROUP BY term
ORDER BY exact_cnt DESC, term
LIMIT {A27_TOP}
"""


@query("a27_countmin_contract", oracle=A27_ORACLE, impure=True)
def a27_countmin_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27 — the Count-Min sketch as a point-frequency service:
    build one CM sketch (eps=1%, conf=99%, fixed seed) over the
    token stream via the SQL `count_min_sketch` aggregate and read the ten
    heaviest tokens' estimates back. Where l41 answers "WHICH keys
    are heavy" exactly, CM answers "how heavy is THIS key" from
    KB-size mergeable state — the two sketches are the
    complementary halves of frequency monitoring at 100 TB (CM
    counters add, so per-partition sketches merge associatively;
    a cluster deployment persists one per shard like a16's HLLs).

    Oracle strategy (a16's): the estimate is engine-specific, its
    CONTRACT is not. CM can only OVERestimate (each counter is a
    sum over a superset of the key's occurrences) — `never_under-
    estimates` is a theorem, not a tolerance — and the +eps*n error
    bound, probabilistic over seeds, is a deterministic fact for
    THIS pinned seed and data, so both flags are stable TRUE and
    hash-compare against the oracle's literals. The exact top-10
    counts hash-compare as hard values. Registered impure: the
    sketch build is a driver-side action, re-run per call.

    Plumbing: the sketch aggregates distributed via the SQL
    `count_min_sketch(...)` function (per-partition sketches merged
    by counter addition — order-independent), and the driver
    deserializes the binary through the public
    `org.apache.spark.util.sketch.CountMinSketch` reader for point
    lookups (PySpark 4 dropped the DataFrameStatFunctions
    wrapper)."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    terms = documents.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    top = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "term")
        .limit(A27_TOP)
        .collect()
    )
    n_total = terms.count()
    sketch_bytes = terms.agg(
        F.expr(
            f"count_min_sketch(term, {A27_EPS}d, {A27_CONF}d, {A27_SEED})"
        ).alias("cms")
    ).collect()[0]["cms"]
    jsketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )
    rows = []
    for r in top:
        est = jsketch.estimateCount(r.term)
        rows.append(
            (
                r.term,
                r.exact_cnt,
                bool(est >= r.exact_cnt),
                bool(est <= r.exact_cnt + A27_EPS * n_total),
            )
        )
    return spark.createDataFrame(
        rows,
        "term string, exact_cnt long, never_underestimates boolean, "
        "within_eps_n boolean",
    )


# --------------------------------------------------------------------------
# L54 — model-based quality scoring (fixed-weight logistic over L47)
# --------------------------------------------------------------------------

#: Pinned model: one weight per L47 feature dim plus a bias. A real
#: deployment trains these offline (fastText-style quality model);
#: the ENGINE's job — featurize, dot, sigmoid, threshold, at scan
#: speed — is identical for any weight vector, so the fixture pins
#: an arbitrary deterministic one.
L54_WEIGHTS = [((-1) ** i) * (0.25 + 0.05 * i) for i in range(16)]
L54_BIAS = -0.1
L54_THRESHOLD = 0.5

L54_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents WHERE doc_id < 200
),
bucketed AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('f:' || term), 1, 15) AS BIGINT)
               % {L47_DIMS} AS dim,
           COUNT(*) AS cnt
    FROM tok GROUP BY doc_id, dim
),
normed AS (
    SELECT doc_id, dim,
           cnt / SQRT(CAST(SUM(cnt * cnt) OVER (PARTITION BY doc_id)
                           AS DOUBLE)) AS v
    FROM bucketed
),
scored AS (
    SELECT doc_id,
           CAST({L54_BIAS} AS DOUBLE)
           + CAST(SUM(CAST(v * CASE dim
               {" ".join(f"WHEN {i} THEN CAST({w!r} AS DOUBLE)" for i, w in enumerate(L54_WEIGHTS))}
           END AS DECIMAL(28, 14))) AS DOUBLE) AS z
    FROM normed GROUP BY doc_id
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + EXP(-z)), 6) AS p_quality,
       CAST(1.0 / (1.0 + EXP(-z)) >= {L54_THRESHOLD} AS BOOLEAN) AS keep
FROM scored
"""


@query("l54_quality_model_scoring", oracle=L54_ORACLE)
def l54_quality_model_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L54 — apply a trained linear quality classifier to every
    document: L47's hashing-trick features · pinned weight vector →
    sigmoid → keep/drop. This is the modern model-based corpus
    filter (fastText/CCNet quality models, applied at scan speed) as
    an ENGINE operator: the model is a broadcast-size constant, the
    features never materialize outside the query, and the plan is
    explode → (doc, dim) hash agg → per-doc window norm → per-doc
    weighted sum — all codegen, no Python, linear in tokens.

    Determinism: features are integer counts over portable md5
    buckets (l47); the weighted sum folds ≤16 fixed doubles whose
    ADDITION ORDER is pinned by aggregating z in DECIMAL — the
    per-dim products are identical doubles, the decimal sum is
    order-free, and sigmoid's exp is a single transcendental on the
    identical rounded z (the l42 class). r6 on the probability."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    tok = documents.filter(F.col("doc_id") < 200).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("f:"), F.col("term"))), 1, 15),
            16,
            10,
        ).cast("long")
        % L47_DIMS
    )
    bucketed = tok.groupBy("doc_id", bucket.alias("dim")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    sq = F.sum(F.col("cnt") * F.col("cnt")).over(Window.partitionBy("doc_id"))
    v = F.col("cnt") / F.sqrt(sq.cast("double"))
    weight = F.element_at(
        F.array(*[F.lit(float(w)) for w in L54_WEIGHTS]),
        (F.col("dim") + 1).cast("int"),
    )
    normed = bucketed.select("doc_id", "dim", v.alias("v"))
    z = F.lit(float(L54_BIAS)) + F.sum(
        (F.col("v") * weight).cast("decimal(28,14)")
    ).cast("double")
    scored = normed.groupBy("doc_id").agg(z.alias("z"))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return scored.select(
        "doc_id",
        F.round(p, 6).alias("p_quality"),
        (p >= F.lit(L54_THRESHOLD)).alias("keep"),
    )


# --------------------------------------------------------------------------
# L77 — DSIR: data selection via importance resampling
# --------------------------------------------------------------------------

#: hashed n-gram feature buckets (DSIR uses 10k; 64 keeps the oracle
#: replay cheap while exercising the identical dataflow)
L77_BUCKETS = 64
#: documents selected from the raw pool
L77_TOP_N = 100


def _l77_gram_sql(rel: str) -> str:
    """DuckDB CTE body emitting (doc_id, lang, bucket) one row per
    unigram AND bigram occurrence of `rel` — the same house md5
    bucket spell l47 pins, over the same filtered token stream the
    Spark side builds."""
    return f"""
    SELECT doc_id, lang,
           CAST('0x' || substr(md5('g:' || g), 1, 15) AS BIGINT)
               % {L77_BUCKETS} AS bucket
    FROM (
        SELECT doc_id, lang,
               unnest(list_concat(
                   toks,
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || ' ' || toks[i + 1])
               )) AS g
        FROM (
            SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '),
                               w -> w <> '') AS toks
            FROM {rel}
        )
    )"""


L77_ORACLE = f"""
WITH grams AS ({_l77_gram_sql("documents")}),
dist AS (
    SELECT bucket,
           SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t,
           SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS c_r
    FROM grams GROUP BY bucket
),
tot AS (
    SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM dist
),
lr AS (
    SELECT bucket,
           CAST(ROUND(
               ln((c_t + 1.0) / ((SELECT n_t FROM tot) + {L77_BUCKETS}))
             - ln((c_r + 1.0) / ((SELECT n_r FROM tot) + {L77_BUCKETS})),
               12) AS DECIMAL(18, 12)) AS logratio
    FROM dist
),
doc_feat AS (
    SELECT doc_id, lang, bucket, COUNT(*) AS cnt
    FROM grams WHERE lang <> 'en'
    GROUP BY doc_id, lang, bucket
),
weights AS (
    SELECT f.doc_id, f.lang,
           SUM(CAST(f.cnt AS DECIMAL(10, 0)) * lr.logratio) AS w
    FROM doc_feat f JOIN lr ON f.bucket = lr.bucket
    GROUP BY f.doc_id, f.lang
),
selected AS (
    SELECT doc_id, lang, w
    FROM weights
    ORDER BY w DESC, doc_id
    LIMIT {L77_TOP_N}
)
SELECT w.lang,
       CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(COUNT(s.doc_id) AS BIGINT) AS n_selected,
       ROUND(CAST(SUM(s.w) AS DOUBLE) / COUNT(s.doc_id), 6) + 0.0
           AS avg_selected_weight
FROM weights w LEFT JOIN selected s ON w.doc_id = s.doc_id
GROUP BY w.lang
ORDER BY w.lang
"""


@query("l77_dsir_selection", oracle=L77_ORACLE)
def l77_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L77 — DSIR (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): score every raw-pool
    document by how target-like its hashed n-gram feature
    distribution is, and select the top-N. The target here is the
    English slice of the corpus (lang='en'); the raw pool is
    everything else; a selected doc is one whose unigram+bigram
    bucket histogram looks more like the target's than the pool's
    (importance weight = Σ_b cnt_b · log(p_target(b)/p_raw(b)),
    add-1-smoothed). Unlike l54's PINNED quality model, the model
    here is TRAINED from the data inside the query — both bucket
    distributions are derived relations.

    Spark-first shape, all codegen: one explode over unigrams+
    bigrams → (doc, bucket) map-side-combined hash agg (≤B rows per
    doc leave the map stage regardless of doc length); the two
    distributions and their log-ratios are ONE B-row aggregate that
    re-enters as a broadcast join; per-doc weights are a second
    (doc)-keyed agg; the top-N is a TakeOrderedAndProject. At
    100 TB: B grows to 10k (still broadcast-size), everything else
    is the same two hash aggs — no per-token shuffle survives the
    map-side combine, no driver loop, no Python.

    Determinism: buckets are the house md5 spell (l47); the weight
    is a DECIMAL(28,12) dot product — per-bucket log-ratios are
    rounded to 12dp BEFORE the sum, so the aggregation is order-free
    (the l54/l42 decimal-sum discipline) and the top-N cut line is
    identical on both engines; ties break by doc_id. The reported
    frame aggregates per lang (candidates, selected, r6 avg weight).

    Paper parity: hashed n-gram features + smoothed log-likelihood
    ratio is DSIR's exact estimator family; top-N rather than Gumbel
    resampling keeps the query deterministic (the paper's §3
    deterministic variant)."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), " ", -1), lambda w: w != ""
    )
    # Bigram arm guarded for single-token docs: sequence(1, 0) is
    # DESCENDING [1, 0] (the l75 trap, text.py:2000), so an unguarded
    # transform would evaluate element_at(toks, 0) and throw
    # INVALID_INDEX_OF_ZERO. The oracle's range(1, len(toks)) yields
    # empty for len==1 — the doc still contributes its unigram, so we
    # must NOT filter size>=2 here, only empty the bigram list.
    grams_arr = F.concat(
        F.col("toks"),
        F.when(
            F.size("toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.concat(
                    F.element_at("toks", i),
                    F.lit(" "),
                    F.element_at("toks", i + 1),
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("g:"), F.col("g"))), 1, 15),
            16,
            10,
        ).cast("long")
        % L77_BUCKETS
    )
    grams = (
        documents.select("doc_id", "lang", toks.alias("toks"))
        .filter(F.size("toks") >= 1)
        .select("doc_id", "lang", F.explode(grams_arr).alias("g"))
        .select("doc_id", "lang", bucket.alias("bucket"))
    )
    dist = grams.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("c_r"),
    )
    tot = dist.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    lr = (
        dist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.round(
                F.log((F.col("c_t") + 1.0) / (F.col("n_t") + L77_BUCKETS))
                - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + L77_BUCKETS)),
                12,
            )
            # (18,12): |logratio| < 1e6 always fits, and the
            # (10,0)x(18,12) product stays under precision 38 on BOTH
            # engines — Spark would silently SHRINK the scale of an
            # overflowing product (allowPrecisionLoss), DuckDB would
            # not, and the two quantizations diverge at the 12th dp.
            .cast("decimal(18,12)")
            .alias("logratio"),
        )
    )
    doc_feat = (
        grams.filter(F.col("lang") != "en")
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weights = (
        doc_feat.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(10,0)") * F.col("logratio")
            ).alias("w")
        )
    )
    selected = weights.orderBy(F.col("w").desc(), "doc_id").limit(L77_TOP_N)
    return (
        weights.alias("w")
        .join(
            selected.select(F.col("doc_id").alias("s_doc")).alias("s"),
            F.col("w.doc_id") == F.col("s_doc"),
            "left",
        )
        .groupBy(F.col("w.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.count("s_doc").cast("bigint").alias("n_selected"),
            (
                # exact DECIMAL sum (order-free), then ONE double
                # division of identical operands on both engines
                F.round(
                    F.sum(
                        F.when(F.col("s_doc").isNotNull(), F.col("w"))
                    ).cast("double")
                    / F.count("s_doc"),
                    6,
                )
                + 0.0
            ).alias("avg_selected_weight"),
        )
        .orderBy("lang")
    )
