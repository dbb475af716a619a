"""Named-query registry — the engine's public contract.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when the operator
is SQL-expressible) an ANSI-SQL twin that DuckDB can run over the
same parquet tables. The driver compares the two sides (row count +
schema + order-insensitive value hash), so:

- every computed/aggregate column is aliased identically on both
  sides;
- double-valued aggregates are rounded to 6 decimals on both sides
  (summation-order last-ulp drift would otherwise break hashes);
- every ORDER BY used for top-k/limit carries a unique tiebreaker so
  the selected row set is deterministic across engines.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}

#: Names registered with ``impure=True`` — their construction runs
#: side effects (scratch-dir writes, streaming runs), so they sort
#: behind pure batch queries within each verification tier.
IMPURE: set[str] = set()

#: Prepared-plan cache for PURE queries, keyed by (applicationId,
#: sf_dir, name). Building a DataFrame costs ~250-300 ms of Py4J
#: round trips; a resident engine prepares a statement once and
#: re-executes it. CRITICAL SEMANTICS (round-10 discovery): a
#: DataFrame re-collected through the SAME QueryExecution re-serves
#: its materialized AQE query stages — the shuffle map outputs of
#: the first run — so a second `.toPandas()` on the cached object
#: executes ONLY the final stage (measured: q1 over a 60M-row
#: corpus, 24.5 s cold, 0.08 s "re-executed"; a plan-identical but
#: object-distinct query re-runs in full). That is result caching,
#: not prepared-statement reuse, and it silently inflated every
#: warm benchmark between the cache's introduction and round 10.
#: `registered` therefore hands out `df.select("*")` — a fresh
#: Dataset/QueryExecution over the same analyzed plan (~20 ms, one
#: Py4J call, schema-identical, no stage reuse) — so every
#: invocation EXECUTES from the source files while the analysis
#: work stays amortized.
_PLAN_CACHE: dict[tuple[str, str, str], "DataFrame"] = {}


def query(
    name: str, oracle: str | None = None, impure: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    """Register ``fn`` as query ``name`` with an optional DuckDB oracle.

    ``oracle=None`` marks a rows-only operator (not SQL-expressible:
    approximate, stateful-streaming, or side-effecting) — the driver
    then records the weaker rows-only check.

    ``impure=True`` opts out of prepared-plan caching for queries
    whose *construction* has side effects that must re-run on every
    invocation (scratch-dir writes, streaming runs, view/UDTF
    registration).
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if impure:
            IMPURE.add(name)
            registered = fn
        else:

            @functools.wraps(fn)
            def registered(spark: "SparkSession", sf_dir: str) -> "DataFrame":
                key = (spark.sparkContext.applicationId, sf_dir, name)
                df = _PLAN_CACHE.get(key)
                if df is None:
                    df = fn(spark, sf_dir)
                    _PLAN_CACHE[key] = df
                # Fresh QueryExecution per invocation — see the
                # _PLAN_CACHE note: returning `df` itself re-serves
                # materialized AQE stages (cached results, stale
                # under data change, and not a legitimate "warm
                # latency" vs a baseline that re-executes fully).
                return df.select("*")

        QUERIES[name] = registered
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _certification_rounds() -> dict[str, int]:
    """Per-query driver-certification state from CORRECTNESS files.

    Returns ``{name: round}`` where ``round`` is the round number of
    the LATEST driver CORRECTNESS file that mentions the name — but
    only for names whose latest mention is GREEN. A name whose latest
    row is red (or that no file mentions) is absent from the dict.

    The driver records per-round ``CORRECTNESS_r{N}.json`` at the repo
    root but verifies only a bounded prefix of the registry (round 2
    stopped at exactly 50 entries). ``_prioritize`` uses this to put
    never-verified and last-failed queries at the front of the
    registry, and — once everything is green — to refresh the STALEST
    certifications first, so the bounded window rotates through the
    registry instead of re-checking last round's freshest rows.

    "Green" means rows+schema+hash all matched, or — for queries that
    declare no oracle (rows-only contract) — that the driver ran the
    query and recorded a row count. Later rounds override earlier
    ones: a query that regressed is re-queued for verification.
    """
    import json
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    files = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.stem).group(1)),
    )
    rounds: dict[str, int] = {}
    for path in files:
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    bool(row.get("rows_match"))
                    and bool(row.get("schema_match"))
                    and bool(row.get("hash_match"))
                    and row.get("err") is None
                )
            if ok:
                rounds[name] = rnd
            else:
                rounds.pop(name, None)
    return rounds


def _verified_names() -> set[str]:
    """Names whose latest driver CORRECTNESS mention is green."""
    return set(_certification_rounds())


#: Queries added in the CURRENT round, i.e. after the newest recorded
#: CORRECTNESS file. They yield window priority to queries that have
#: already waited a full round unverified (the round-2 driver stopped
#: at 50 entries; round 2's L/T/S/U tail must not be displaced
#: again). Once the next CORRECTNESS file lands, survivors of this
#: list sort first automatically and the list should be rotated.
#: (Round 5: rotated — round 4's 14 additions have now waited a full
#: round and sort into tiers 0/1 via CORRECTNESS_r04.json.)
NEW_THIS_ROUND: frozenset[str] = frozenset(
    {
        # Round 14: rotated — CORRECTNESS_r13 certified the round-13
        # additions (s45_parquet_robustness, l78_hybrid_retrieval_rrf
        # both driver-green), so they sort into the verified tier by
        # staleness. Round-14 newcomers land here.
        # Round 15: rotated — CORRECTNESS_r14 certified l79/l80/t28
        # (driver-green; s46's red row re-entered via RECHECK).
        # Round 16: rotated — CORRECTNESS_r15 certified the round-15
        # newcomers (s47_merge_snapshot_diff, t29_stream_cdc_merge,
        # l81_index_maintenance, all driver-green), so they sort into
        # the verified tier by staleness. No round-16 newcomers: this
        # is an optimization round, no new features.
    }
)

#: Queries whose ORACLE or semantics changed this round while already
#: holding a green/rows-only CORRECTNESS row. The green row certifies
#: the OLD contract, so they must re-enter the verification window as
#: if unverified (a19's round-4 hash fail plus every query touched by
#: the round-5 float-discipline fixes).
RECHECK_THIS_ROUND: frozenset[str] = frozenset(
    {
        # Round 8: rotated to empty. CORRECTNESS_r07 certified both
        # previously-listed names (l08_frame_sample's new full oracle
        # and emb_topk_cosine's rebuilt literal-inlined plan, both
        # driver-green), so nothing needs a forced re-check and every
        # driver slot goes to the 29-name never-sampled backlog.
        #
        # Round 12: rotated to empty. CORRECTNESS_r11 re-certified
        # every previously-listed rewrite (q1, sessionize, tumbling,
        # a04, l70, l02_minhash, l04_lsh — all driver-green), so the
        # whole bounded window goes to the staleness tail: the r12
        # verdict names the 28 queries whose latest cert is r05
        # (f18/f19, s03/s16/s20, the l10–l31 dataset-mechanics
        # family, l02_simhash_neardup, l03_knn_ivf, l04_simjoin_exact,
        # l08_image_features) — tier 3's stalest-first ordering puts
        # exactly those at the front without naming them here.
        #
        # Round 14: rotated — CORRECTNESS_r13 re-certified all six
        # round-13 rewrites (l01 packed-long keeper, l14 packed fold,
        # l77 bigram guard, l20 bm25_scores extraction, l02/l59
        # no-broadcast hashed verification — all driver-green), so the
        # bounded window goes to the staleness tail: the r13 verdict
        # names the 37 queries whose latest cert is r07
        # (emb_topk_cosine, a27, f27, l08_frame_sample, l33, l37, l39,
        # l41-l49, l51-l57, l60/l61/l64/l65, s11/s12/s13/s19/s21/s23,
        # u10/u11/u17, w20) — tier 3's stalest-first ordering puts
        # exactly those at the front without naming them here. Any
        # round-14 rewrite that changes a certified query's Spark side
        # or oracle re-enters here.
        #
        # Round 15: rotated — CORRECTNESS_r14 re-certified the r14
        # hv-ordering rewires (l02_minhash_neardup and
        # l59_minhash_index_probe, both driver-green).
        #
        # Round 16: rotated — CORRECTNESS_r15 re-certified the r15
        # entries (s46_merge_into and l80_ivf_index_probe, both
        # driver-green, hash_match true).
        #
        # r16 entries, per the r15 verdict's "close the certification
        # gap": the five r15 optimizer rewrites changed each query's
        # Spark expression tree (oracles unchanged, 334/334 local
        # sweeps green at sf0.001 and sf0.01) but none landed in the
        # r15 driver sample, so the driver has never certified the
        # rewritten plans. Re-enter them per the standing convention
        # that any rewrite of a certified query's Spark side re-enters
        # here:
        "q1_pricing_summary",          # r15 §2: _sorted_small (no rangepartitioning)
        "q1_pricing_summary_decimal",  # r15 §2: same helper
        "q5_local_supplier",           # r15 §2: same helper
        "window_top3_orders_per_cust", # r15 §1: LIMIT pushed through window
        "s17_table_profile",           # r15 §4: per-column union, no Expand
        # r16 banding-spelling rewrite (banded_keys: one nested
        # planes literal + one transform lambda instead of 64
        # per-plane HOF dots — Catalyst analysis was the wall, guide
        # §7.3; fresh-process l04 7.6->1.4 s, tuned 7.2->2.5 s).
        # Same dot fold, frame-identical banding (pinned by
        # test_banded_keys_matches_band_structs), oracles unchanged —
        # re-certify the rewritten Spark side:
        "l04_simjoin_lsh",
        "l04_simjoin_lsh_tuned",
        "l16_components_lsh",
        # r16 l58 rewrite: per-round COALESCE carry join removed
        # (dead code on the symmetric edge set — every node receives
        # votes; fresh-process 2.67->1.43 s, frame-identical at 3
        # SFs, oracle unchanged) — re-certify the rewritten side:
        "l58_label_propagation",
        # r16 f25 rewrite: global sort moved below the xml/xpath
        # projections (the range-sampling pass re-executed them;
        # 1.95->1.21 s, frames identical, oracle unchanged):
        "f25_xml_roundtrip",
        # r16 l68 rewrite: repeated-gram filter as a window count
        # over g instead of groupBy(g) + SMJ back onto a second gram
        # computation — the double shuffle's spill exhausted >68 GB
        # at the 300× slope corpus (query could not finish; window
        # spelling peaks ~22 GB, 99 s). Oracle unchanged, green at
        # sf0.001/0.01/0.1 — re-certify the rewritten side:
        "l68_dup_span_removal",
        # r16 j14 rewrite: per-day overlapping-pair count as the
        # sweep-line window over 2N endpoint rows instead of the
        # day-blocked self-join (whose residual evaluated
        # (users/day)^2 pairs per block). Frame-identical at 3 SFs,
        # oracle unchanged, fresh-process 1.83->0.68 s — re-certify
        # the rewritten side:
        "j14_interval_overlap_join",
    }
)

#: Names forced to the very front of the verification window while
#: they lack a driver-green CORRECTNESS row. Round 9: rotated to
#: empty — CORRECTNESS_r08 certified all eight round-8 names and the
#: cumulative ledger reached 301/301 green / 0 never-sampled, so
#: there is no backlog left to pin. With everything green, the
#: staleness ordering below (verified queries sort oldest-certified
#: first) is what fills the driver's bounded window: round 9's
#: 50-slot window re-certifies the r2-era P/J/W/F rows untouched for
#: six rounds.
FRONT_OF_LINE: tuple[str, ...] = ()


def _prioritize() -> None:
    """Reorder QUERIES/ORACLE so unverified queries register first.

    Python dicts iterate in insertion order, and the driver walks the
    registry in that order — rebuilding the dicts is how we control
    which queries land in a bounded verification window. Tiers:

    1. unverified since a prior round, pure (cheapest to check)
    2. unverified since a prior round, impure (scratch/streaming)
    3. added this round (locally verified only; waited zero rounds)
    4. verified — STALEST certification first (the round of each
       name's latest green row, ascending), so once the registry is
       fully green the bounded window becomes a rolling re-audit of
       the oldest evidence instead of re-checking last round's
       freshest rows. Registration order breaks ties.

    Pure-before-impure keeps the unverified backlog cheap in case the
    driver's cutoff is time-based rather than count-based (within the
    verified tier staleness outranks purity: an impure query whose
    green row is six rounds old needs refreshing more than a pure one
    certified yesterday). Registration order is preserved within each
    tier, so the ordering is deterministic for a given set of
    CORRECTNESS files.
    """
    cert_rounds = _certification_rounds()
    verified = set(cert_rounds) - RECHECK_THIS_ROUND

    def tier(name: str) -> tuple[int, int]:
        if name in FRONT_OF_LINE and name not in verified:
            # Tier -1 honors the FRONT_OF_LINE tuple's own order (it
            # is a priority list, not a set) — the stable sort keeps
            # registration order for every other tier.
            return (-1, FRONT_OF_LINE.index(name))
        if name in verified:
            return (3, cert_rounds[name])
        if name in NEW_THIS_ROUND:
            return (2, 0)
        return (name in IMPURE, 0)

    ordered = sorted(QUERIES, key=tier)  # stable: keeps registration order
    for d in (QUERIES, ORACLE):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)


def load_all() -> None:
    """Import every query module so registration side effects run."""
    # Imported lazily so `import hetnetdb_spark` stays cheap and so a
    # syntax error in one operator family doesn't take down the rest
    # during development (tests import load_all and fail loudly).
    from hetnetdb_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        joins,
        profiling,
        projection,
        setops,
        sql_surface,
        tpch,
        tpch_ext,
        windows,
    )
    from hetnetdb_spark.functions import scalar  # noqa: F401
    from hetnetdb_spark.pipeline import (  # noqa: F401
        corpus,
        decompose,
        dedup,
        multimodal,
        similarity,
        sketches,
        splits,
        text,
    )
    from hetnetdb_spark.sources import io  # noqa: F401
    from hetnetdb_spark.streaming import queries  # noqa: F401
    from hetnetdb_spark.udfs import surface  # noqa: F401

    _prioritize()
