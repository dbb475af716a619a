"""Dataset splitting — deterministic train/test assignment over
``documents``.

A training pipeline needs splits that are (a) reproducible across
runs and engines, (b) stable under re-partitioning and re-crawls,
and (c) leak-free: the SAME content must always land in the same
split, or near-duplicate leakage silently inflates eval scores.
Random `df.sample`/`randomSplit` give none of these — the split here
hashes the content itself (md5, engine-portable, unlike xxhash64) so
assignment is a pure function of the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hetnetdb_spark.catalog import load_tables
from hetnetdb_spark.expr import r6
from hetnetdb_spark.registry import query

TRAIN_PCT = 80

L10_ORACLE = f"""
WITH t AS (
    SELECT source, n_chars,
           CASE WHEN CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 100 < {TRAIN_PCT}
                THEN 'train' ELSE 'test' END AS split
    FROM documents
)
SELECT split, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(n_chars), 6)   AS avg_chars
FROM t
GROUP BY split, source
"""


@query("l10_train_test_split", oracle=L10_ORACLE)
def l10_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 — 80/20 content-hash split, summarized per (split, source).

    The first 8 md5 hex digits parse as an unsigned 32-bit int on
    both engines (`conv(_, 16, 10)` here, `CAST('0x'||_ AS BIGINT)`
    in the oracle); `% 100` buckets it into a stable percentage.
    Fully map-side until the tiny summary aggregate — at 100 TB the
    split column costs one hash per row and no shuffle at all when
    written back alongside the data."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long") % 100
    return (
        documents.withColumn(
            "split", F.when(bucket < TRAIN_PCT, "train").otherwise("test")
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            r6(F.avg("n_chars")).alias("avg_chars"),
        )
    )


# --------------------------------------------------------------------------
# L12 — sequence packing (token-budget binning)
# --------------------------------------------------------------------------

PACK_BUDGET = 4096

L12_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
    FROM documents
),
packed AS (
    SELECT lang, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {PACK_BUDGET}) AS BIGINT) AS bin_id
    FROM toks
)
SELECT lang, bin_id,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY lang, bin_id
"""


@query("l12_sequence_packing", oracle=L12_ORACLE)
def l12_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12 — pack documents into ~4096-token training bins.

    Deterministic streaming-pack: within each language, documents in
    doc_id order accumulate into a bin until the running token count
    crosses the budget (bin = floor(preceding-cumsum / budget) — the
    document that crosses the boundary starts spilling into the next
    bin, exactly like greedy sequence packing with document
    splitting). One window pass + one aggregate, both partitioned by
    lang: a single shuffle, no Python. True first-fit-decreasing is
    inherently sequential; this cumulative form is the
    order-deterministic, embarrassingly-parallel variant a corpus
    pipeline actually ships."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = documents.select(
        "lang", "doc_id", n_tokens.alias("n_tokens")
    ).withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


# --------------------------------------------------------------------------
# L15 — stratified sampling (seeded, per-stratum fractions)
# --------------------------------------------------------------------------


L15_FRACTIONS = {"en": 0.5, "de": 0.8, "fr": 0.8, "es": 1.0, "ja": 1.0}

L15_ORACLE = (
    "SELECT lang,\n"
    "       CAST(COUNT(*) AS BIGINT) AS n_total,\n"
    "       CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in L15_FRACTIONS.items())
    + " ELSE 0.0 END AS frac,\n"
    "       TRUE AS within_5sigma\n"
    "FROM documents\n"
    "GROUP BY lang"
)


@query("l15_stratified_sample", oracle=L15_ORACLE)
def l15_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15 — `sampleBy` with per-language fractions and a fixed
    seed: the data-mixing primitive (oversample scarce languages,
    downsample the head) for corpus construction. Map-only at any
    scale — each partition samples independently, nothing shuffles
    until the summary.

    Oracle strategy (the a16/a04 bound pattern): seeded Bernoulli
    sampling is deterministic within Spark but engine-specific, so
    the sampled COUNT can't hash-compare — its STATISTICAL contract
    can. The output carries each stratum's exact total, the
    requested fraction, and a flag pinning the realized sample
    inside a 5-sigma binomial band (sigma = sqrt(n·f·(1-f)); for
    f = 1.0 the band is zero, so es/ja must keep EVERY row — an
    exact pin, not a tolerance — and a stratum absent from the
    fractions map, like the fixture's zh, must sample exactly ZERO
    rows). The oracle computes the same totals/fractions over exact
    semantics and pins the flag TRUE: a biased or broken sampler
    fails the hash check. (The exact per-seed counts remain
    golden-pinned in tests/test_golden.py for drift detection
    across Spark versions.)"""
    (documents,) = load_tables(spark, sf_dir, "documents")
    sampled = documents.sampleBy("lang", L15_FRACTIONS, seed=42)
    frac_expr = None
    for k, v in L15_FRACTIONS.items():
        cond = F.when(F.col("lang") == k, F.lit(v))
        frac_expr = cond if frac_expr is None else frac_expr.when(
            F.col("lang") == k, F.lit(v)
        )
    frac_expr = frac_expr.otherwise(F.lit(0.0))
    counts = (
        documents.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .join(
            sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled")),
            "lang",
            "left",
        )
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0)))
        .withColumn("frac", frac_expr)
    )
    sigma = F.sqrt(
        F.col("n_total").cast("double") * F.col("frac") * (F.lit(1.0) - F.col("frac"))
    )
    return counts.select(
        "lang",
        "n_total",
        "frac",
        (
            F.abs(
                F.col("n_sampled").cast("double")
                - F.col("frac") * F.col("n_total").cast("double")
            )
            <= F.lit(5.0) * sigma
        ).alias("within_5sigma"),
    )


# --------------------------------------------------------------------------
# L27 — deterministic per-group sample (seeded hash-rank top-K)
# --------------------------------------------------------------------------

L27_SEED = 11
L27_K = 5

L27_ORACLE = f"""
SELECT lang, source, doc_id, rk
FROM (
    SELECT lang, source, doc_id,
           CAST(row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{L27_SEED}'), doc_id
           ) AS BIGINT) AS rk
    FROM documents
) t
WHERE rk <= {L27_K}
"""


@query("l27_group_sample", oracle=L27_ORACLE)
def l27_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L27 — exactly-K-per-stratum sampling with a seeded hash rank:
    order each (lang, source) stratum by ``md5(doc_id:seed)`` and
    keep the first K. Complements L15's Bernoulli `sampleBy`
    (fractional, engine-RNG, rows-only) with the form eval-set
    construction actually wants: a FIXED quota per stratum, the same
    rows on any engine or cluster layout, and a new disjoint-ish
    draw per seed. W6's rank-filter shape — one shuffle on the
    stratum key, WindowGroupLimit prunes rank > K below the
    exchange, so the shuffle carries at most K rows per stratum per
    map task, not the corpus."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{L27_SEED}"))),
        "doc_id",
    )
    return (
        documents.select(
            "lang", "source", "doc_id", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= L27_K)
    )


# --------------------------------------------------------------------------
# L42 — weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------------

L42_K = 100
L42_SEED = "ws42"
_L42_DENOM = 16 ** 15  # md5 15-hex-digit space

L42_ORACLE = f"""
WITH wt AS (
    SELECT doc_id, lang,
           GREATEST(len(string_split(text, ' ')), 1) AS n_tokens,
           (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{L42_SEED}'),
                                     1, 15) AS BIGINT) AS DOUBLE) + 0.5)
               / {_L42_DENOM} AS u
    FROM documents
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
FROM wt
ORDER BY ln(u) / n_tokens DESC, doc_id
LIMIT {L42_K}
"""


@query("l42_weighted_sample", oracle=L42_ORACLE)
def l42_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L42 — draw K=100 documents WITHOUT replacement with
    inclusion probability proportional to token count
    (Efraimidis–Spirakis A-ES): the size-biased draw used to build
    token-budgeted eval/probe sets where a uniform doc sample would
    under-represent long documents.

    A-ES assigns each row the key u^(1/w) (equivalently ln(u)/w,
    monotone) and keeps the K largest — a reduction, not a reorder:
    Spark spells it `orderBy(key desc).limit(K)`, which compiles to
    TakeOrderedAndProject (per-partition top-K heaps + a K-row
    merge on the driver), NOT a global sort and NOT a
    single-partition window. At 100 TB each task ships exactly K
    candidate rows.

    Determinism: u is the house md5 spell — 15 hex digits of
    md5(doc_id:seed) as an integer, shifted by +0.5 and scaled to
    (0,1); both engines round the same 2^60-range integer to the
    same double (IEEE round-to-nearest) and divide by the same
    constant, so u is bit-identical. ln is the one transcendental:
    Java Math.log vs DuckDB's libm may differ in the last ulp, but
    unlike the a19/decimal-sum class this is a SINGLE operation (no
    accumulation), so a selection flip needs two docs' keys within
    ~1 ulp of each other exactly at the rank-K boundary —
    vanishingly unlikely for continuous keys, and the doc_id
    tiebreak covers exact ties. The float key itself is not
    emitted; the compared frame is integers + strings only."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{L42_SEED}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_L42_DENOM))
    n_tokens = F.greatest(
        F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(1)
    )
    return (
        documents.select(
            "doc_id",
            "lang",
            n_tokens.alias("n_tokens"),
            (F.log(u) / F.col("n_tokens")).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(L42_K)
        .select("doc_id", "lang", "n_tokens")
    )


# --------------------------------------------------------------------------
# L48 — differentially-private noisy counts (seeded Laplace mechanism)
# --------------------------------------------------------------------------

L48_SEED = "dp42"
L48_EPS = 1.0  # Laplace scale b = sensitivity/eps = 1/eps for counts
_L48_DENOM = 16 ** 15

L48_ORACLE = f"""
WITH counts AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_true FROM documents GROUP BY lang
),
seeded AS (
    SELECT lang, n_true,
           (CAST(CAST('0x' || substr(md5(lang || ':{L48_SEED}'), 1, 15)
                      AS BIGINT) AS DOUBLE) + 0.5) / {_L48_DENOM} AS u
    FROM counts
)
SELECT lang, n_true,
       ROUND(n_true + (-1.0 / {L48_EPS}) * sign(u - 0.5)
                      * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_n
FROM seeded
"""


@query("l48_dp_noisy_counts", oracle=L48_ORACLE)
def l48_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L48 — the Laplace mechanism on per-language document counts
    (sensitivity 1, ε=1): the building block for publishing corpus
    composition stats without revealing individual membership.
    Production DP needs a cryptographic noise source; what the
    ENGINE owes is the mechanism plumbing — exact counts, a
    per-group noise draw that is reproducible across engines and
    layouts, and the inverse-CDF transform — which is what this
    pins. (The fixture keeps n_true in the output so the oracle can
    certify both halves; a release view would drop it.)

    Noise: u = house md5 uniform per group key, X = −b·sgn(u−½)·
    ln(1−2|u−½|) — the Laplace inverse CDF. Like l42's A-ES keys,
    this is the SINGLE-transcendental class: ln on bit-identical
    doubles, no accumulation, so r6 comfortably absorbs the ≤1-ulp
    libm spread. Plan: one hash agg (map-side partials), noise
    applied post-aggregation on |groups| rows."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    counts = documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("lang"), F.lit(f":{L48_SEED}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(_L48_DENOM))
    noise = (
        F.lit(-1.0 / L48_EPS)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "lang",
        "n_true",
        F.round(F.col("n_true") + noise, 6).alias("noisy_n"),
    )


# --------------------------------------------------------------------------
# L51 — padding efficiency of length-bucketed batching
# --------------------------------------------------------------------------

L51_GRAIN = 32  # bucket granularity in tokens

L51_ORACLE = f"""
WITH t AS (
    SELECT GREATEST(len(string_split(text, ' ')), 1) AS n_tokens
    FROM documents
),
b AS (
    SELECT n_tokens,
           CAST(CEIL(n_tokens / {L51_GRAIN}.0) AS BIGINT) AS bucket
    FROM t
),
g AS (
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket * {L51_GRAIN} AS BIGINT) AS padded_tokens
    FROM b GROUP BY bucket
),
tot AS (SELECT CAST(MAX(bucket) * {L51_GRAIN} AS BIGINT) AS global_max FROM g)
SELECT bucket, n_docs, real_tokens, padded_tokens,
       ROUND(real_tokens * 1.0 / padded_tokens, 6)   AS bucket_efficiency,
       ROUND(real_tokens * 1.0 / (n_docs * (SELECT global_max FROM tot)), 6)
           AS naive_efficiency
FROM g
"""


@query("l51_padding_efficiency", oracle=L51_ORACLE)
def l51_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L51 — how much padding does length-bucketed batching save?
    For every 32-token length bucket: the real token mass, the
    padded mass if each doc pads to its BUCKET ceiling, and the two
    efficiencies — bucketed (real/padded) vs naive (padding every
    doc to the GLOBAL max, what a single-bucket loader does). The
    difference is wasted accelerator FLOPs, which is why every
    serious training loader length-groups; this operator is the
    planning query that sizes those buckets.

    One scan → one |buckets|-key hash agg (map-side partials); the
    global max is a 1-row subquery over the already-aggregated
    bucket table. All counts int64; the efficiencies are single
    divisions of identical integers, r6. Grain is a constant; a
    production pass would sweep several grains in one query (the
    same lateral-sizes shape as l44)."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    n_tokens = F.greatest(
        F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(1)
    )
    b = documents.select(
        n_tokens.alias("n_tokens"),
        F.ceil(n_tokens / F.lit(float(L51_GRAIN))).cast("long").alias("bucket"),
    )
    g = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("real_tokens"),
        (F.count(F.lit(1)) * F.col("bucket") * L51_GRAIN)
        .cast("long")
        .alias("padded_tokens"),
    )
    tot = g.agg((F.max("bucket") * L51_GRAIN).cast("long").alias("global_max"))
    return g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_docs",
        "real_tokens",
        "padded_tokens",
        F.round(F.col("real_tokens") * F.lit(1.0) / F.col("padded_tokens"), 6)
        .alias("bucket_efficiency"),
        F.round(
            F.col("real_tokens")
            * F.lit(1.0)
            / (F.col("n_docs") * F.col("global_max")),
            6,
        ).alias("naive_efficiency"),
    )


# --------------------------------------------------------------------------
# L53 — contrastive negative sampling (seeded, cross-source)
# --------------------------------------------------------------------------

L53_K = 3
L53_N_ANCHORS = 20
L53_SEED = "neg42"

L53_ORACLE = f"""
WITH anchors AS (
    SELECT doc_id AS anchor_id, source AS anchor_source
    FROM documents WHERE doc_id < {L53_N_ANCHORS}
),
ranked AS (
    SELECT a.anchor_id, d.doc_id AS negative_id, d.source AS negative_source,
           row_number() OVER (
               PARTITION BY a.anchor_id
               ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || ':'
                            || CAST(d.doc_id AS VARCHAR) || ':{L53_SEED}'),
                        d.doc_id
           ) AS rk
    FROM anchors a
    JOIN documents d ON d.source <> a.anchor_source
)
SELECT anchor_id, negative_id, negative_source, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {L53_K}
"""


@query("l53_negative_sampling", oracle=L53_ORACLE)
def l53_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L53 — contrastive-training negative mining: for each anchor
    document, K=3 reproducible pseudo-random negatives drawn from
    OTHER sources (the cross-domain constraint that makes negatives
    informative rather than near-duplicates of the anchor). The
    seeded md5 rank over the (anchor, candidate) PAIR gives every
    anchor an independent draw — same engine-portable determinism
    as l27's per-stratum sample, extended to pair keys — so the
    exact training pairs reproduce on any engine, cluster layout,
    or rerun; bumping the seed rotates the negative set.

    Shape: the anchor table (bounded) broadcasts onto the corpus
    scan; the per-anchor rank is W6's rank-filter, so
    WindowGroupLimit prunes to K rows per anchor below the
    exchange — the shuffle carries ≤K·|anchors| id rows, never the
    corpus. (In-batch negatives are the no-shuffle degenerate case;
    this operator is for the curated-negatives regime where quality
    constraints — here cross-source — must hold.)"""
    (documents,) = load_tables(spark, sf_dir, "documents")
    anchors = documents.filter(F.col("doc_id") < L53_N_ANCHORS).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("anchor_source"),
    )
    pairs = documents.join(
        F.broadcast(anchors), F.col("source") != F.col("anchor_source")
    )
    rank_key = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
            F.lit(f":{L53_SEED}"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(rank_key, "doc_id")
    return (
        pairs.select(
            "anchor_id",
            F.col("doc_id").alias("negative_id"),
            F.col("source").alias("negative_source"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= L53_K)
    )


# --------------------------------------------------------------------------
# L56 — k-anonymity audit over quasi-identifiers
# --------------------------------------------------------------------------

L56_ORACLE = """
WITH classes AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM customer
    GROUP BY 1, 2, 3
),
banded AS (
    SELECT CASE WHEN k >= 10 THEN '10+'
                WHEN k >= 5  THEN '5-9'
                ELSE CAST(k AS VARCHAR) END AS k_band,
           k
    FROM classes
)
SELECT k_band,
       CAST(COUNT(*) AS BIGINT)  AS n_classes,
       CAST(SUM(k) AS BIGINT)    AS n_customers,
       CAST(MIN(k) AS BIGINT)    AS min_k,
       CAST(MAX(k) AS BIGINT)    AS max_k,
       MIN(k) < 5                AS needs_suppression
FROM banded
GROUP BY k_band
ORDER BY k_band
"""


@query("l56_k_anonymity", oracle=L56_ORACLE)
def l56_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L56 — k-anonymity audit: group the table by its
    quasi-identifier tuple (nation × market segment × account-balance
    band — attributes an adversary could link externally) and report
    the equivalence-class size distribution. Classes with k below
    the threshold (5 here) are re-identifiable and must be suppressed
    or generalized before the dataset ships; `needs_suppression`
    flags the bands that fail.

    This is the release-gate companion to the privacy pair already
    in the suite: l13 REMOVES direct identifiers (PII regexes), l48
    NOISES aggregate outputs (DP Laplace) — l56 measures the
    LINKAGE risk of what remains, which neither of the others sees.
    All-integer semantics: counts, FLOOR banding on exact doubles,
    no float surface.

    Scale: one scan, one shuffle on the QI tuple (bounded classes:
    |nations|×|segments|×|bands|), then a second |classes|-row
    aggregate — the k histogram costs the same as any group-by at
    100 TB, which is why it can run on every release candidate."""
    (customer,) = load_tables(spark, sf_dir, "customer")
    classes = (
        customer.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    banded = classes.select(
        F.when(F.col("k") >= 10, F.lit("10+"))
        .when(F.col("k") >= 5, F.lit("5-9"))
        .otherwise(F.col("k").cast("string"))
        .alias("k_band"),
        "k",
    )
    return (
        banded.groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("k").cast("bigint").alias("n_customers"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            (F.min("k") < 5).alias("needs_suppression"),
        )
        .orderBy("k_band")
    )
