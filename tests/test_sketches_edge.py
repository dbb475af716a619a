"""Edge-case regressions for pipeline/sketches.py queries.

r13 (ADVICE high): l77's bigram arm used an unguarded
``F.sequence(1, size(toks) - 1)``, which DESCENDS to [1, 0] for a
single-token document and throws INVALID_INDEX_OF_ZERO — while the
DuckDB oracle's ``range(1, len(toks))`` yields empty and succeeds.
This fixture pins the fixed behavior: single-token docs contribute
their unigram (not nothing, not a crash) on BOTH engines.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_compare import assert_frames_match


@pytest.fixture(scope="module")
def tiny_docs_dir(spark, tmp_path_factory):
    """A documents.parquet whose raw pool includes single-token,
    two-token, and empty-text docs — the sequence(1, size-1) traps."""
    out = str(tmp_path_factory.mktemp("l77_edge"))
    rows = [
        # target slice (lang='en') — needs >=1 doc with bigrams
        (1, "the quick brown fox jumps", "en", "web", 25),
        (2, "hello", "en", "web", 5),  # single-token TARGET doc
        (3, "quick quick fox", "en", "books", 15),
        # raw pool (lang<>'en')
        (4, "hola", "es", "web", 4),  # single-token POOL doc (the crash)
        (5, "der schnelle braune fuchs", "de", "web", 24),
        (6, "vite vite", "fr", "web", 9),  # exactly two tokens
        (7, "", "es", "web", 0),  # empty text -> zero tokens
        (8, "  ", "de", "web", 2),  # whitespace-only -> zero tokens
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_l77_single_token_docs_match_oracle(spark, tiny_docs_dir):
    from hetnetdb_spark.pipeline.sketches import L77_ORACLE, l77_dsir_selection

    sdf = l77_dsir_selection(spark, tiny_docs_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tiny_docs_dir}/documents.parquet/*.parquet')"
    )
    ddf = con.execute(L77_ORACLE).fetchdf()
    con.close()
    # the single-token pool doc must be a CANDIDATE (its unigram
    # scored), not dropped and not a crash
    assert "es" in set(sdf["lang"]), "single-token 'es' doc lost from pool"
    assert_frames_match(sdf, ddf, "l77_single_token_edge")
