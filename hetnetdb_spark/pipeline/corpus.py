"""Corpus-preparation operators — the steps between a raw document
table and a training shard that SURVEY §2.9's L-rows don't already
cover: context-window chunking, benchmark decontamination, and
quantized similarity search.

All three are pure DataFrame/higher-order-function plans (no UDFs,
no collects): chunking is a per-row lateral expansion, so it scales
linearly and shuffles nothing; decontamination is an n-gram semi-join
(the standard "drop eval overlap" pass, GPT-3 appendix-C style); the
int8 quantization path is the memory-bound ANN trick — 4× less
vector traffic at a ~1e-2 cosine error, with the exact score
recomputed only for the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hetnetdb_spark.catalog import load_tables, spread
from hetnetdb_spark.expr import r6
from hetnetdb_spark.pipeline.similarity import duck_dot
from hetnetdb_spark.registry import query

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

L17_ORACLE = f"""
WITH c AS (
    SELECT doc_id,
           list_transform(range(1, len(string_split(text, ' ')) + 1, {CHUNK_STRIDE}),
                          s -> array_to_string(
                                 list_slice(string_split(text, ' '), s, s + {CHUNK_TOKENS - 1}),
                                 ' ')) AS chunks
    FROM documents
),
z AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(chunks) + 1),
                  i -> {{'chunk_id': i - 1, 'chunk_text': chunks[i]}}),
                  recursive := true)
    FROM c
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT)                          AS chunk_id,
       chunk_text,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens
FROM z
ORDER BY doc_id, chunk_id
"""


@query("l17_doc_chunking", oracle=L17_ORACLE)
def l17_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — split every document into overlapping
    context-window chunks (32 tokens, stride 24 ⇒ 8-token overlap),
    the standard pretraining tokenize-and-window pass.

    The chunk windows are a higher-order ``transform`` over a stride
    ``sequence`` followed by ``posexplode`` — all codegen, per-row
    lateral expansion with NO shuffle at all (the final sort exists
    for deterministic output and is the only exchange; a real export
    would `write` partition-parallel instead of sorting). Chunk
    boundaries depend only on the row itself, so the operator is
    embarrassingly parallel and survives any scale-up: the natural
    100 TB form is exactly this plan feeding a partitioned sink
    (S6). Tail chunks shorter than the window are kept — dropping
    them is a one-line filter policy, not an operator property.
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE)),
        lambda s: F.concat_ws(" ", F.slice(toks, s, CHUNK_TOKENS)),
    )
    return (
        documents.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .withColumn("n_tokens", F.size(F.split(F.col("chunk_text"), " ")).cast("long"))
        .orderBy("doc_id", "chunk_id")
    )


TRAIN_SOURCES = tuple(f"src{i}" for i in range(10))
NGRAM = 5

_TRAIN_IN = ", ".join(f"'{s}'" for s in TRAIN_SOURCES)

L19_ORACLE = f"""
WITH g AS (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - {NGRAM - 1}, 0) + 1),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + {NGRAM - 1}), ' ')
           ))) AS gram
    FROM documents
    WHERE len(string_split(text, ' ')) >= {NGRAM}
),
train AS (SELECT DISTINCT gram FROM g WHERE source IN ({_TRAIN_IN})),
eval_docs AS (
    SELECT source, doc_id,
           MAX(CASE WHEN gram IN (SELECT gram FROM train) THEN 1 ELSE 0 END) AS hit
    FROM g
    WHERE source NOT IN ({_TRAIN_IN})
    GROUP BY source, doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)  AS n_docs,
       CAST(SUM(hit) AS BIGINT)  AS n_contaminated,
       ROUND(SUM(hit) * 1.0 / COUNT(*), 6) AS contaminated_frac
FROM eval_docs
GROUP BY source
ORDER BY source
"""


@query("l19_decontamination", oracle=L19_ORACLE)
def l19_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — benchmark decontamination: flag eval-split
    documents sharing any 5-gram with the training split (sources
    src0–src9 = train, the rest = eval), reported per eval source.

    Shape: explode distinct 5-grams on both splits; the train side
    reduces to DISTINCT grams (bounded by vocabulary, not corpus);
    contaminated docs surface via a LEFT SEMI join on the gram —
    the join carries (gram, doc_id) pairs only, never text. At
    corpus scale the train-gram relation is the big side, so the
    semi join shuffles on the gram hash and AQE handles the skew of
    stop-gram buckets; swapping in a Bloom filter of train grams
    (j11 machinery) is the constant-memory variant. 5 is the
    shortest n that separates real overlap from vocabulary noise on
    this corpus (2/3-grams flag 100% of docs; 5-grams ~8%).
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (NGRAM - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM)),
        )
    )
    with_grams = documents.filter(F.size(toks) >= NGRAM).select(
        "doc_id", "source", F.explode(grams).alias("gram")
    )
    is_train = F.col("source").isin(*TRAIN_SOURCES)
    train_grams = with_grams.filter(is_train).select("gram").distinct()
    eval_grams = with_grams.filter(~is_train)
    hits = (
        eval_grams.join(train_grams, "gram", "left_semi")
        .select("source", "doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    eval_docs = (
        eval_grams.select("source", "doc_id")
        .distinct()
        .join(hits, ["source", "doc_id"], "left")
        .withColumn("hit", F.coalesce(F.col("hit"), F.lit(0)))
    )
    return (
        eval_docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").cast("long").alias("n_contaminated"),
            r6(F.sum("hit") / F.count(F.lit(1))).alias("contaminated_frac"),
        )
        .orderBy("source")
    )


QSCALE = 127

L18_ORACLE = f"""
WITH codes AS (
    SELECT vec_id, label, embedding,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE} + 0.5) AS INTEGER)) AS code
    FROM embeddings
),
q AS (SELECT code AS qcode, embedding AS qemb FROM codes WHERE vec_id = 0)
SELECT c.vec_id,
       c.label,
       ROUND(list_aggregate(list_transform(range(1, 65),
               i -> CAST(c.code[i] AS DOUBLE) * CAST(q.qcode[i] AS DOUBLE)), 'sum')
             / {QSCALE * QSCALE}.0, 6)                       AS approx_cos,
       ROUND({{exact}}, 6)                                    AS exact_cos
FROM codes c, q
WHERE c.vec_id <> 0
ORDER BY approx_cos DESC, c.vec_id
LIMIT 10
""".replace("{exact}", duck_dot("c.embedding", "q.qemb"))


@query("l18_quantized_topk", oracle=L18_ORACLE)
def l18_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-extension — int8-quantized cosine top-k: symmetric scalar
    quantization (code = floor(x·127 + 0.5), exact on both engines —
    no round-half-mode dependence), approximate dot on the codes,
    exact double dot re-computed alongside for the survivors.

    Why it matters at scale: the candidate scan reads 64 bytes per
    vector instead of 256 — the brute-force path is memory-bandwidth
    bound, so int8 codes are a ~4× scan speedup for ~1e-2 cosine
    error (visible in the approx_cos vs exact_cos columns). Same
    zero-shuffle broadcast shape as `emb_topk_cosine`: the 1-row
    query side broadcasts, top-10 plans as TakeOrderedAndProject.
    In a production layout the codes are a precomputed column
    (write-once via S6), not re-derived per query.
    """
    (embeddings,) = load_tables(spark, sf_dir, "embeddings")
    code = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * QSCALE + F.lit(0.5)).cast("int"),
    )
    codes = embeddings.select("vec_id", "label", "embedding", code.alias("code"))
    qside = codes.filter(F.col("vec_id") == 0).select(
        F.col("code").alias("qcode"), F.col("embedding").alias("qemb")
    )
    int_dot = F.aggregate(
        F.zip_with(
            F.col("code"), F.col("qcode"), lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact_dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qemb"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qside))
        .select(
            "vec_id",
            "label",
            r6(int_dot / F.lit(float(QSCALE * QSCALE))).alias("approx_cos"),
            r6(exact_dot).alias("exact_cos"),
        )
        .orderBy(F.col("approx_cos").desc(), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# L24 — seeded global corpus shuffle + sharding (epoch reshuffle)
# --------------------------------------------------------------------------

SHUFFLE_SEED = 7

L24_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id,
           md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}') AS k
    FROM documents
)
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(k, 1, 1)) - 1 AS BIGINT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY substr(k, 1, 1) ORDER BY k, doc_id
       ) AS BIGINT) AS pos
FROM keyed
"""


@query("l24_corpus_shuffle", oracle=L24_ORACLE)
def l24_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24 — seeded deterministic global shuffle: assign every
    document a pseudo-random shard and a position within it, the
    epoch-reshuffle step of a training-data loader. Seed in, same
    order out on any cluster size — ``rand()`` cannot give that
    (its draw depends on partition layout), so the shuffle key is
    ``md5(doc_id:seed)``: stable, uniform, and computable identically
    by any engine. A new seed is a new permutation of the corpus.

    Shard = first hex nibble of the key (16 shards); position =
    rank of the key within the shard. One exchange on the nibble,
    per-shard sort on a 32-char key — at 100 TB the same plan is
    ``repartitionByRange(key).sortWithinPartitions(key)`` feeding a
    partitioned sink, with shard count scaled to target file sizes;
    the rank-within-shard form here keeps the result a checkable
    table instead of a side-effecting write (S6 owns the sink).
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    keyed = documents.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{SHUFFLE_SEED}"))).alias("k"),
    )
    from pyspark.sql.window import Window

    nibble = F.substring("k", 1, 1)
    w = Window.partitionBy(nibble).orderBy("k", "doc_id")
    return keyed.select(
        "doc_id",
        (F.expr("instr('0123456789abcdef', substr(k, 1, 1))") - 1).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# --------------------------------------------------------------------------
# L30 — graded contamination report (per-doc n-gram overlap ratio)
# --------------------------------------------------------------------------

L30_ORACLE = f"""
WITH g AS (
    SELECT doc_id, source,
           unnest(list_distinct(list_transform(
               range(1, GREATEST(len(string_split(text, ' ')) - {NGRAM - 1}, 0) + 1),
               i -> array_to_string(list_slice(string_split(text, ' '), i, i + {NGRAM - 1}), ' ')
           ))) AS gram
    FROM documents
    WHERE len(string_split(text, ' ')) >= {NGRAM}
),
train AS (SELECT DISTINCT gram FROM g WHERE source IN ({_TRAIN_IN})),
per_doc AS (
    SELECT source, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN gram IN (SELECT gram FROM train) THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_hit
    FROM g
    WHERE source NOT IN ({_TRAIN_IN})
    GROUP BY source, doc_id
)
SELECT doc_id, source, n_grams, n_hit,
       ROUND(CAST(n_hit AS DOUBLE) / n_grams, 6) AS overlap_frac
FROM per_doc
ORDER BY overlap_frac DESC, doc_id
LIMIT 20
"""


@query("l30_contamination_report", oracle=L30_ORACLE)
def l30_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30 — the graded companion to l19's binary flag: for every
    eval-split document, the FRACTION of its distinct 5-grams that
    appear anywhere in the training split, top-20 most-contaminated.
    Binary decontamination over-drops (one boilerplate 5-gram kills
    a document); real pipelines threshold on this ratio instead and
    audit the tail — which is exactly this report.

    Same physical discipline as l19: distinct grams explode once,
    the train side reduces to a DISTINCT gram relation (vocabulary-
    bounded), and the per-doc hit count comes from an INNER join on
    the gram hash carrying (gram, doc ids) only — text never
    shuffles. The denominator is a count over the same exploded
    relation, so one scan feeds both sides; top-20 is a
    TakeOrderedAndProject, not a global sort.
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    documents = spread(documents)  # CPU-bound hash family: see catalog.spread
    toks = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (NGRAM - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM)),
        )
    )
    with_grams = documents.filter(F.size(toks) >= NGRAM).select(
        "doc_id", "source", F.explode(grams).alias("gram")
    )
    is_train = F.col("source").isin(*TRAIN_SOURCES)
    train_grams = with_grams.filter(is_train).select("gram").distinct()
    eval_grams = with_grams.filter(~is_train)
    totals = eval_grams.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    hits = (
        eval_grams.join(train_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("overlap_frac"),
        )
        .orderBy(F.col("overlap_frac").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# L32 — corpus mixture plan + deterministic down-sample to target weights
# --------------------------------------------------------------------------

L32_BUDGET_FRAC = 0.5   # sample down to half the corpus tokens
L32_HASH_MOD = 10000    # md5 bucket resolution for the sampler

L32_ORACLE = f"""
WITH per_doc AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8)
                AS BIGINT) % {L32_HASH_MOD} AS bucket
    FROM documents
),
per_src AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS src_tokens
    FROM per_doc GROUP BY source
),
tot AS (
    SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT)        AS n_sources
    FROM per_src
),
rates AS (
    SELECT s.source, s.n_docs, s.src_tokens,
           LEAST(1.0,
                 CAST(t.total_tokens AS DOUBLE) * {L32_BUDGET_FRAC}
                   / t.n_sources / s.src_tokens) AS rate
    FROM per_src s, tot t
)
SELECT r.source, r.n_docs, r.src_tokens,
       ROUND(r.rate, 6) AS rate,
       CAST(COUNT(d.doc_id) FILTER (
            WHERE CAST(d.bucket AS DOUBLE) / {L32_HASH_MOD} < r.rate
       ) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(d.n_tok) FILTER (
            WHERE CAST(d.bucket AS DOUBLE) / {L32_HASH_MOD} < r.rate
       ), 0) AS BIGINT) AS sampled_tokens
FROM rates r JOIN per_doc d ON d.source = r.source
GROUP BY r.source, r.n_docs, r.src_tokens, r.rate
ORDER BY r.source
"""


@query("l32_corpus_mixture", oracle=L32_ORACLE)
def l32_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32 — training-mixture planning AND the down-sample that
    executes it, in one pass: given a token budget (half the corpus)
    and a target mixture (uniform across sources), compute each
    source's sampling rate `min(1, budget_share / src_tokens)` and
    apply it with a deterministic content hash — the data-mixing
    step that turns a raw crawl into a weighted training corpus.

    Plan shape: ONE scan computes per-doc token counts and the md5
    sample bucket map-side, then immediately collapses to the
    (source, bucket) grain — at most |sources|×10000 rows, the only
    relation that ever shuffles, bounded regardless of corpus size.
    The rate table derives from that relation (|sources| groups),
    broadcasts back onto it, and the sample decision
    `bucket/10000 < rate` plus the final rollup run over the
    bucket-grain rows — the text column is read exactly once at any
    scale, and every post-scan exchange is constant-size.

    Determinism: the sampler is the house md5-bucket spell (l10's
    split discipline — engine-portable, reshuffle-invariant, and
    stable run-to-run, unlike `rand()` or engine hashes); rates are
    derived from exact BIGINT token counts through an identically-
    associated chain of double ops, so both engines compare
    bit-identical doubles at the `< rate` branch."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    per_doc = documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % L32_HASH_MOD
        ).alias("bucket"),
    )
    # Cache the bucket-grain relation: it is consumed twice (rate
    # derivation + final rollup) and Spark recomputes shared
    # subtrees, which would re-scan the text column. The cache is
    # bounded at |sources|×10000 short rows by construction — the
    # one relation you'd persist at 100 TB too.
    per_bucket = (
        per_doc.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs_b"),
            F.sum("n_tok").alias("tok_b"),
        )
        .cache()
    )
    per_src = per_bucket.groupBy("source").agg(
        F.sum("n_docs_b").alias("n_docs"),
        F.sum("tok_b").alias("src_tokens"),
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.least(
            F.lit(1.0),
            F.col("total_tokens").cast("double")
            * F.lit(L32_BUDGET_FRAC)
            / F.col("n_sources")
            / F.col("src_tokens"),
        ).alias("rate"),
    )
    picked = F.col("bucket").cast("double") / F.lit(float(L32_HASH_MOD)) < F.col(
        "rate"
    )
    return (
        per_bucket.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "src_tokens", "rate")
        .agg(
            F.coalesce(F.sum(F.when(picked, F.col("n_docs_b"))), F.lit(0))
            .cast("long")
            .alias("n_sampled"),
            F.coalesce(F.sum(F.when(picked, F.col("tok_b"))), F.lit(0))
            .cast("long")
            .alias("sampled_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "src_tokens",
            r6(F.col("rate")).alias("rate"),
            "n_sampled",
            "sampled_tokens",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# L34 — repeated-passage removal (C4-style sub-document dedup)
# --------------------------------------------------------------------------

PASSAGE_TOKENS = 8

L34_ORACLE = f"""
WITH t AS (
    SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
p AS (
    SELECT doc_id, source, CAST(u.s AS BIGINT) AS s,
           array_to_string(list_slice(toks, u.s, u.s + {PASSAGE_TOKENS - 1}), ' ')
               AS passage
    FROM t, LATERAL unnest(range(1, len(toks) + 1, {PASSAGE_TOKENS})) AS u(s)
),
dup AS (SELECT md5(passage) AS h FROM p GROUP BY 1 HAVING COUNT(*) > 1),
flag AS (
    SELECT doc_id, source, s, passage,
           md5(passage) IN (SELECT h FROM dup) AS dropped
    FROM p
),
clean AS (
    SELECT doc_id, source,
           COUNT(*)                                   AS n_pass,
           SUM(CASE WHEN dropped THEN 1 ELSE 0 END)   AS n_drop,
           COALESCE(string_agg(passage, ' ' ORDER BY s)
                    FILTER (WHERE NOT dropped), '')   AS clean_text
    FROM flag GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                       AS n_docs,
       CAST(SUM(n_pass) AS BIGINT)                    AS n_passages,
       CAST(SUM(n_drop) AS BIGINT)                    AS n_dropped,
       CAST(COUNT(DISTINCT md5(clean_text)) AS BIGINT) AS n_clean_distinct,
       CAST(SUM(length(clean_text)) AS BIGINT)        AS clean_chars,
       ROUND(1.0 - SUM(n_drop) * 1.0 / SUM(n_pass), 6) AS kept_frac
FROM clean GROUP BY source ORDER BY source
"""


@query("l34_passage_dedup", oracle=L34_ORACLE)
def l34_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34 — sub-document dedup: drop every non-overlapping 8-token
    passage that occurs more than once ANYWHERE in the corpus, then
    reassemble the surviving passages in order (the C4 "repeated
    three-sentence span" rule re-expressed at passage granularity —
    exact-dedup (L1) removes whole duplicate documents, this removes
    boilerplate shared *between* otherwise-distinct documents).

    Plan shape — text never crosses a shuffle: passage hashes derive
    map-side from one scan; the duplicate set is an md5-key hash agg
    (16-byte keys + counts); per-doc dropped *positions* (not text)
    aggregate on doc_id; the drop-position arrays join back to the
    documents scan (tiny side — only docs that lose a passage — so
    Catalyst broadcasts it by estimate, and at 100 TB the join keys
    are still just (doc_id, int array)); reassembly is a map-side
    index-filter over the re-derived chunk array. The output rollup
    ships per-source partial states only. At 100 TB the same plan
    holds: the only payload-bearing relation (documents) is read
    twice and shuffled never; a production variant would write
    clean_text to a partitioned sink (S6) instead of rolling up.

    Determinism: passage boundaries are pure per-row arithmetic
    (same `sequence`/`range` spell l17 proved engine-parity for);
    duplicate membership is exact string equality via md5; the
    rollup compares exact BIGINTs plus one r6 ratio of exact counts.
    """
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(PASSAGE_TOKENS)),
        lambda s: F.concat_ws(" ", F.slice(toks, s, PASSAGE_TOKENS)),
    )

    # Cached: consumed by both the duplicate-hash agg and the
    # drop-position semi-join; without it Spark recomputes the
    # subtree and the text column is scanned a third time. Bounded
    # at one (doc_id, pos, 32-char hash) row per passage — ~1/10 of
    # corpus text bytes, the hash index you'd persist at 100 TB.
    pass_ids = (
        documents.select("doc_id", F.posexplode(chunks).alias("pos", "passage"))
        .select("doc_id", "pos", F.md5("passage").alias("h"))
        .cache()
    )

    dup_hashes = (
        pass_ids.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("h")
    )

    drops_per_doc = (
        pass_ids.join(dup_hashes, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("drop_pos"))
    )

    empty = F.array().cast("array<integer>")
    drop_pos = F.coalesce(F.col("drop_pos"), empty)
    kept = F.filter(chunks, lambda c, i: ~F.array_contains(drop_pos, i))
    cleaned = (
        documents.join(drops_per_doc, "doc_id", "left")
        .select(
            "source",
            F.size(chunks).cast("long").alias("n_pass"),
            F.size(drop_pos).cast("long").alias("n_drop"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )
    return (
        cleaned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_pass").alias("n_passages"),
            F.sum("n_drop").alias("n_dropped"),
            F.countDistinct(F.md5("clean_text")).alias("n_clean_distinct"),
            F.sum(F.length("clean_text")).alias("clean_chars"),
            r6(
                F.lit(1.0)
                - F.sum("n_drop").cast("double") / F.sum("n_pass").cast("double")
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# L40 — end-to-end corpus-prep funnel (the stages composed, one DAG)
# --------------------------------------------------------------------------

L40_MIN_TOKENS = 20
L40_LANGS = ("de", "en", "es", "fr")
L40_PREFIX = 16

_L40_LANG_IN = ", ".join(f"'{lang}'" for lang in L40_LANGS)

L40_ORACLE = f"""
WITH base AS (
    SELECT doc_id, source, lang, text,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
),
q AS (
    SELECT * FROM base
    WHERE n_tok >= {L40_MIN_TOKENS} AND lang IN ({_L40_LANG_IN})
),
ex AS (
    SELECT *, row_number() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS rn1
    FROM q
),
e2 AS (SELECT * FROM ex WHERE rn1 = 1),
pf AS (
    SELECT *, row_number() OVER (
        PARTITION BY md5(array_to_string(
            list_slice(string_split(text, ' '), 1, {L40_PREFIX}), ' '))
        ORDER BY doc_id) AS rn2
    FROM e2
),
final AS (SELECT * FROM pf WHERE rn2 = 1)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT)                          AS n_raw,
       CAST((SELECT COUNT(*) FROM q f
             WHERE f.source = b.source) AS BIGINT)       AS n_quality,
       CAST((SELECT COUNT(*) FROM e2 f
             WHERE f.source = b.source) AS BIGINT)       AS n_exact,
       CAST((SELECT COUNT(*) FROM final f
             WHERE f.source = b.source) AS BIGINT)       AS n_final,
       CAST((SELECT COALESCE(SUM(f.n_tok), 0) FROM final f
             WHERE f.source = b.source) AS BIGINT)       AS tokens_final
FROM base b
GROUP BY b.source
ORDER BY b.source
"""


@query("l40_prep_pipeline", oracle=L40_ORACLE)
def l40_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L40 — the corpus-prep stages COMPOSED, proving the pieces are
    a pipeline and not a demo shelf: language/length quality gate
    (L9's shape) → exact dedup with the deterministic lowest-id
    keeper (L1) → leading-16-token prefix dedup (the cheap
    boilerplate-header catch between L1 and the full MinHash pass)
    → per-source funnel with surviving token mass. One DAG, built
    lazily; Catalyst fuses the flags into a single scan followed by
    two hash-key window passes.

    Scale shape: stage flags are per-row codegen; the two dedup
    stages shuffle (md5-key, doc_id, flags) — never text (the md5 IS
    the partition key, l01's discipline); the funnel rollup ships
    per-source partials. At 100 TB each stage's survivors feed the
    next without materialization, and the same DAG with a
    partitioned sink after `final` IS the production prep job —
    the funnel counts here are its observability sidecar.

    Determinism: keepers are lowest-doc_id per hash group (total
    order, no ties); every count is an exact BIGINT."""
    (documents,) = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = documents.select(
        "doc_id",
        "source",
        "lang",
        "text",
        F.size(toks).alias("n_tok"),
        F.md5("text").alias("h_exact"),
        F.md5(F.concat_ws(" ", F.slice(toks, 1, L40_PREFIX))).alias("h_prefix"),
    )
    is_q = (F.col("n_tok") >= L40_MIN_TOKENS) & F.col("lang").isin(*L40_LANGS)

    # Rank only the stage's survivors within each hash group: the
    # conditional partition key keeps dropped rows out of the keeper
    # election without a second pass. Dropped rows get a SINGLETON
    # key (their own doc_id) rather than a shared NULL — a shared
    # key would funnel every dropped row into one window partition,
    # exactly the skew this engine's window discipline forbids.
    def stage_key(cond, key):
        return F.when(cond, key).otherwise(
            F.concat(F.lit("solo:"), F.col("doc_id").cast("string"))
        )

    flagged = (
        base.withColumn("is_q", is_q)
        .withColumn(
            "rn1",
            F.row_number().over(
                Window.partitionBy(
                    stage_key(F.col("is_q"), F.col("h_exact"))
                ).orderBy("doc_id")
            ),
        )
        .withColumn("is_exact", F.col("is_q") & (F.col("rn1") == 1))
        .withColumn(
            "rn2",
            F.row_number().over(
                Window.partitionBy(
                    stage_key(F.col("is_exact"), F.col("h_prefix"))
                ).orderBy("doc_id")
            ),
        )
        .withColumn("is_final", F.col("is_exact") & (F.col("rn2") == 1))
    )
    cnt = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            cnt(F.col("is_q")).alias("n_quality"),
            cnt(F.col("is_exact")).alias("n_exact"),
            cnt(F.col("is_final")).alias("n_final"),
            F.coalesce(
                F.sum(F.when(F.col("is_final"), F.col("n_tok"))), F.lit(0)
            ).cast("long").alias("tokens_final"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# L55 — alpha-temperature multilingual mixture (the mT5/XLM-R sampler)
# --------------------------------------------------------------------------

L55_ORACLE = """
WITH per_lang AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                            AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)   AS n_tokens
    FROM documents
    GROUP BY lang
),
tot AS (
    SELECT SUM(n_tokens)             AS t_tokens,
           SUM(POWER(n_tokens, 0.3)) AS t_weight
    FROM per_lang
)
SELECT lang, n_docs, n_tokens,
       ROUND(n_tokens / t_tokens, 6)                                AS nat_share,
       ROUND(POWER(n_tokens, 0.3) / t_weight, 6)                    AS alpha_share,
       ROUND((POWER(n_tokens, 0.3) / t_weight)
             / (n_tokens / t_tokens), 6)                            AS upsample
FROM per_lang, tot
ORDER BY lang
"""


@query("l55_alpha_mixture", oracle=L55_ORACLE)
def l55_alpha_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L55 — α-temperature language sampling (the mT5/XLM-R/CC-100
    convention): sampling probability p_l ∝ n_l^α with α = 0.3,
    flattening the natural distribution so low-resource languages
    are up-sampled (upsample > 1) and the head language is
    down-sampled — the standard knob between "proportional drowns
    the tail" (α=1) and "uniform overfits it" (α=0).

    Complements l32 (budget-capped source mixture): l32 allocates a
    fixed token budget by per-source caps; l55 reshapes the LANGUAGE
    distribution by exponent. A multilingual pretraining pipeline
    runs both — l55 to pick language rates, l32 to spend the budget
    within each.

    Float posture: pow(double, 0.3) may differ in the final ulp
    between libm implementations, but every output is a share in
    [0, ~5] built from 5-term sums of O(1)-ratio quantities —
    relative drift O(1e-15), far inside r6 (the q11 ratio
    discipline; verified differentially at all three SFs).

    Scale: one scan of documents, token counting inside codegen,
    |lang| bounded groups; the totals are a 1-row broadcast
    cross-join (l32's shape). The shuffle carries per-lang partial
    sums only — flat at any corpus size."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    # |lang| rows, cached: per_lang feeds both the totals aggregate
    # and the final projection — Spark recomputes shared subtrees,
    # which would scan (and re-tokenize) the text column twice
    # (l32's lesson; plan test pins FileScan count == 1).
    per_lang = (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
        .cache()
    )
    weight = F.pow(F.col("n_tokens"), F.lit(0.3))
    totals = per_lang.agg(
        F.sum("n_tokens").alias("t_tokens"),
        F.sum(weight).alias("t_weight"),
    )
    nat = F.col("n_tokens") / F.col("t_tokens")
    alpha = weight / F.col("t_weight")
    return (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(nat, 6).alias("nat_share"),
            F.round(alpha, 6).alias("alpha_share"),
            F.round(alpha / nat, 6).alias("upsample"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# L64 — exact token-budget selection (greedy prefix under a cap)
# --------------------------------------------------------------------------

L64_BUDGET = 100_000

L64_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR) || ':l64')       AS rank_key
    FROM documents
),
ordered AS (
    SELECT *,
           SUM(n_tokens) OVER (ORDER BY rank_key, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum_tokens
    FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)                       AS n_selected,
       CAST(SUM(n_tokens) AS BIGINT)                  AS tokens_selected,
       CAST(MAX(cum_tokens) AS BIGINT)                AS cum_at_last
FROM ordered
WHERE cum_tokens <= {L64_BUDGET}
GROUP BY source
ORDER BY source
"""


@query("l64_token_budget_selection", oracle=L64_ORACLE)
def l64_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L64 — materialize an EXACT token-budget selection: documents
    take a deterministic shuffled order (portable md5 rank key —
    l24's seeded-permutation idiom, so the "random" prefix is the
    same on any engine or cluster layout), a running token sum walks
    that order, and the selection is the maximal prefix whose
    cumulative tokens fit the budget. This is the step AFTER l32:
    l32 plans per-source rates against a budget; l64 actually cuts
    the corpus at the budget line and reports what made it in, per
    source — the greedy prefix rule (not bin packing) being exactly
    what streaming corpus assembly can implement online.

    All-integer: token counts, cumulative sums, and the cut compare
    are exact; the only ordering inputs are md5 strings with the
    doc_id tiebreaker (registry discipline).

    Scale: ONE global running sum — rank keys are uniform, so at
    100 TB this runs as o09's bucketed prefix-sum construction
    (range-bucket by key prefix, per-bucket windows + a B-row
    offset pass); the single-window spelling here is the
    oracle-scale form and the docstring names the rewrite."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":l64"))).alias(
            "rank_key"
        ),
    )
    w = (
        Window.orderBy("rank_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        ordered.filter(F.col("cum_tokens") <= L64_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
            F.max("cum_tokens").cast("bigint").alias("cum_at_last"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# L65 — deterministic source interleave (balanced curriculum order)
# --------------------------------------------------------------------------

L65_ORACLE = """
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR) || ':l65'),
                                       doc_id) AS rank_in_source
    FROM documents
)
SELECT rank_in_source, source, doc_id,
       row_number() OVER (ORDER BY rank_in_source, source, doc_id)
           AS global_pos
FROM ranked
WHERE rank_in_source <= 4
ORDER BY global_pos
"""


@query("l65_source_interleave", oracle=L65_ORACLE)
def l65_source_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L65 — round-robin source interleaving: each source's docs get
    a deterministic within-source shuffle rank (portable md5 +
    doc_id tiebreak), and the global order sorts by (rank, source) —
    so position 1..|sources| is one doc from EVERY source, then the
    next round, and so on. This is the "balanced batch" ordering
    multi-source loaders want (no source ever starves a batch, no
    window of N consecutive docs over-represents one source by more
    than ⌈N/|sources|⌉), materialized as a deterministic permutation
    rather than runtime sampling — reproducible across runs,
    engines, and cluster layouts (l24's argument, upgraded from
    per-shard to cross-source structure).

    The head (4 rounds) is emitted for the hash; the census pins
    both the within-source ranking and the global interleave
    arithmetic. Scale: within-source ranks ride a per-source window
    (bounded partitions after `_parallel_by`-style keying); the
    global positions of the FULL permutation come from the same
    (rank, source) sort key o09 bucket-ranks at scale — no global
    sort is required to WRITE the order, only to display it."""
    (docs,) = load_tables(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":l65"))), "doc_id"
    )
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w_src).alias("rank_in_source"),
    ).filter(F.col("rank_in_source") <= 4)
    w_glob = Window.orderBy("rank_in_source", "source", "doc_id")
    return ranked.select(
        "rank_in_source",
        "source",
        "doc_id",
        F.row_number().over(w_glob).alias("global_pos"),
    ).orderBy("global_pos")
