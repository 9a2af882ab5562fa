"""Contract tests for the driver-artifact registry rotation policy.

The grading driver records CORRECTNESS rows for only the FIRST 50
entries of ``entry_queries.QUERIES``; the rotation policy (comment at
the top of the registry) promises that no registered query sits past
that cap for 2+ rounds without a driver row.  That policy was only a
comment until now — these tests make it load-bearing: a future
addition that silently pushes a query past the cap for too long, or a
query added without an oracle, fails CI instead of quietly starving
the correctness evidence.

Pure-Python over the committed artifacts: no SparkSession needed.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from vcfdbr_spark.entry_queries import ORACLE, QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50


def _committed_rounds() -> dict[int, set[str]]:
    """Round number → key set of each committed driver artifact."""
    rounds: dict[int, set[str]] = {}
    for name in os.listdir(ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if not m:
            continue
        with open(os.path.join(ROOT, name)) as fh:
            rounds[int(m.group(1))] = set(json.load(fh))
    return rounds


def test_every_query_has_an_oracle():
    """The correctness gate compares values, not just row counts —
    every registered query ships its DuckDB oracle SQL (genuinely
    non-SQL-expressible ops live outside the registry)."""
    assert set(QUERIES) == set(ORACLE)


def test_driver_window_is_full():
    """With more than 50 registered queries, exactly 50 occupy the
    driver window — an accidental short window wastes driver evidence
    slots."""
    assert len(QUERIES) >= DRIVER_CAP


def _is_frozen_round(n: int) -> bool:
    """OPTIMIZATION rounds contractually pin the driver query set to
    the previous round's (a rotated-away query counts as DROPPED and
    fails the round), so they cannot advance the rotation — the
    policy's clock must not tick across them.  A round is frozen when
    its committed PERF artifact says ``optimization_round: true``."""
    path = os.path.join(ROOT, f"PERF_r{n}.json")
    if not os.path.exists(path):
        return False
    try:
        with open(path) as fh:
            return bool(json.load(fh).get("optimization_round"))
    except Exception:
        return False


def test_no_query_starves_past_the_cap():
    """Every key past the driver cap must have a green driver row in
    one of the two most recent ROTATION-CAPABLE committed rounds —
    the rotation policy's actual invariant.  Optimization rounds
    freeze the driver set by contract (see ``_is_frozen_round``), so
    the coverage window extends past them (their artifacts still
    count toward coverage — a frozen round's 50 rows are real rows);
    a build round that forgets to rotate still fails."""
    rounds = _committed_rounds()
    if not rounds:
        pytest.skip("no committed driver artifacts (round 1)")
    recent: list[int] = []
    capable = 0
    for n in sorted(rounds, reverse=True):
        recent.append(n)
        if not _is_frozen_round(n):
            capable += 1
            if capable == 2:
                break
    covered = set().union(*(rounds[r] for r in recent))
    tail = list(QUERIES)[DRIVER_CAP:]
    starved = [k for k in tail if k not in covered]
    assert not starved, (
        f"tail queries with no driver row in rounds {sorted(recent)}: "
        f"{starved} — rotate them into the first {DRIVER_CAP} registry "
        f"entries"
    )


def test_next_window_can_cover_the_tail():
    """Forward-looking satisfiability at HEAD (r12 verdict item 7):
    after THIS round's artifact lands, the following round's window
    must still be able to cover every key it will owe a row — i.e.
    the keys currently in the window (they rotate to the tail next
    round) plus any tail key whose only recent row would expire.
    With a 50-key cap and a 2-round window that bound is
    |QUERIES| <= 2 * cap; at exactly 2 * cap the next round must be
    net-zero on registry size (fold new evidence into existing keys)
    or retire keys first.  This fails AT HEAD — when the over-sized
    registry is authored — not at artifact-commit time when the
    starvation is already baked."""
    assert len(QUERIES) <= 2 * DRIVER_CAP, (
        f"{len(QUERIES)} registered queries cannot rotate through a "
        f"{DRIVER_CAP}-key driver window within 2 rounds: retire or "
        f"fold keys before adding more"
    )


def test_committed_artifacts_only_name_registered_queries():
    """The LATEST committed artifact's keys are all present-tense
    registry members: a rename/removal that orphans driver evidence
    should be deliberate, not silent.  (Older artifacts may legitimately
    reference since-renamed keys.)"""
    rounds = _committed_rounds()
    if not rounds:
        pytest.skip("no committed driver artifacts (round 1)")
    latest = rounds[max(rounds)]
    unknown = sorted(latest - set(QUERIES))
    assert not unknown, f"latest driver artifact names unregistered keys: {unknown}"


def test_sf1_gate_keys_are_registered_and_cover_iterative_family():
    """The scale-tier gate (tools/check_correctness.py --sf1) only
    catches r9-CC-style silent-wrong-at-scale bugs if its key list
    stays wired to the registry: every SF1 key must exist in
    QUERIES/ORACLES, and the iteration/convergence-dependent core —
    connected components and every registered consumer of it, plus
    the corpus-size-adaptive banding paths — must be in the gate.
    A future round that renames a key or adds a CC consumer without
    gating it fails here, not at the next sf1 incident."""
    from tools.check_correctness import SF1_QUERIES

    unknown = [k for k in SF1_QUERIES if k not in QUERIES or k not in ORACLE]
    assert not unknown, f"sf1 gate names unregistered keys: {unknown}"
    required = {
        "dedup_clusters",      # connected components itself
        "corpus_dedup",        # CC consumer (MinHash)
        "semantic_dedup",      # CC consumer (embedding)
        "semantic_dedup_capped",
        "dedup_keep_best",     # CC consumer (quality keep)
        "corpus_filter",       # CC consumer (capstone)
        "dedup_incremental",   # incremental probe vs stored index
        "embedding_dup_pairs",         # corpus-size-adaptive width
        "embedding_dup_pairs_recall",  # + corpus-size-adaptive count
        "embedding_cap_skew",  # cap-effect at scale
    }
    missing = required - set(SF1_QUERIES)
    assert not missing, f"iterative/adaptive family missing from sf1 gate: {missing}"


def test_scale_py_cc_oracles_match_sql_closure_at_small_sf():
    """The scale-tier python oracles (union-find + policy replay over
    DuckDB's linear stages) must equal the registry's recursive-CTE
    closure oracles wherever BOTH are feasible — pinned at sf0.01 so
    a policy drift in either formulation fails CI, not the next
    scale-tier incident.  (At scale tiers only the python form runs:
    the closure materializes O(sum |comp|^2) reach rows and sat >100
    CPU-minutes / 36 GB inside one sf5 component.)"""
    import duckdb
    import pandas as pd

    from tools.check_correctness import (
        SCALE_PY_CC_KEYS,
        TABLES,
        _py_cc_expected,
        normalize,
        table_scan,
    )
    from vcfdbr_spark.entry_queries import ORACLE

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan({table_scan(sf_dir, t)})"
        )
    for name in sorted(SCALE_PY_CC_KEYS):
        want_sql = normalize(con.execute(ORACLE[name]).df())
        want_py = normalize(_py_cc_expected(name, con))
        pd.testing.assert_frame_equal(
            want_py, want_sql, check_dtype=False, check_exact=True,
        ), name
