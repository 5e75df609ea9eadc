"""Driver CORRECTNESS-window discipline.

The driver samples the FIRST 50 queries in queries() dict order. Round 2
silently evicted 8 previously-green queries by registering new ones ahead
of them; these invariants make that impossible to repeat:

* the curated DRIVER_WINDOW fills the sample window exactly (every name
  valid, no duplicates, at most 50);
* every query that has never had a driver CORRECTNESS row in a previous
  round IS in the current window;
* every registered query is attested somewhere: a green row in a past
  round's CORRECTNESS file, or a seat in the current window.
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SAMPLE = 50


def _entry():
    import __spark_entry__ as e
    return e


def _past_rounds() -> dict[str, dict]:
    from tests.driver_records import latest_rows

    return latest_rows()


def test_window_names_valid_and_within_sample():
    e = _entry()
    qs = e.queries()
    assert len(e.DRIVER_WINDOW) <= DRIVER_SAMPLE
    assert len(set(e.DRIVER_WINDOW)) == len(e.DRIVER_WINDOW)
    missing = [n for n in e.DRIVER_WINDOW if n not in qs]
    assert not missing, f"DRIVER_WINDOW names not registered: {missing}"
    assert list(qs)[:len(e.DRIVER_WINDOW)] == e.DRIVER_WINDOW


def test_every_query_attested_past_or_windowed():
    e = _entry()
    qs = e.queries()
    window = set(list(qs)[:DRIVER_SAMPLE])
    past = _past_rounds()
    green = {n for n, r in past.items()
             if r.get("rows_match") and r.get("schema_match")
             and r.get("hash_match")}
    orphans = [n for n in qs if n not in green and n not in window]
    assert not orphans, (
        f"queries with no driver row in any round and no seat in the "
        f"current window: {orphans}")


def test_rewritten_rows_reseat_next_round():
    """Rewrite-resets-staleness (r13 VERDICT item 2): a driver-visible
    row whose query-path code was rewritten in round R AFTER its last
    green attestation (__spark_entry__.REWRITTEN, strict >: the driver
    attests at round end, so a same-round attestation covers the
    rewrite) is a hard seat at round R+1 — it must hold a seat in that
    window, not wait out the staleness rotation on unattested code.
    A rewrite recorded for the CURRENT round (rnd >= current: its
    CORRECTNESS file does not exist yet) is not due until next round —
    the current window was built to the rotation obligation and the
    rule's seating obligation is R+1 (window_math budgets it into the
    next window's plan)."""
    e = _entry()
    rewritten = getattr(e, "REWRITTEN", {})
    assert rewritten, "REWRITTEN history must exist from r14 on"
    from tests import driver_records
    from tests.driver_records import last_green_round

    past = _past_rounds()
    last_green = last_green_round()
    current_round = max((n for n, _ in driver_records._rounds()),
                        default=0) + 1
    visible = set(e.queries())
    window = set(e.DRIVER_WINDOW)
    stale_rewrites = [
        name for name, rnd in rewritten.items()
        if name in visible and rnd > last_green.get(name, -1)
        and rnd < current_round and name not in window]
    assert not stale_rewrites, (
        f"rows rewritten after their last attestation but not seated "
        f"in the current window: {stale_rewrites}")
    assert past, "driver CORRECTNESS history expected"
    # typo guard: a REWRITTEN key that names nothing in the full
    # registry would silently never trigger the rule
    from kafka_connect_oss_spark.registry import QUERIES
    ghosts = [n for n in rewritten if n not in QUERIES]
    assert not ghosts, f"REWRITTEN names unregistered rows: {ghosts}"


def test_red_rows_are_rechecked():
    e = _entry()
    window = set(list(e.queries())[:DRIVER_SAMPLE])
    past = _past_rounds()
    red = {n for n, r in past.items()
           if not (r.get("rows_match") and r.get("schema_match")
                   and r.get("hash_match"))}
    unhandled = sorted(red - window)
    assert not unhandled, f"red CORRECTNESS rows not in window: {unhandled}"


#: window entries deliberately registered WITHOUT an oracle (iterative /
#: non-SQL-expressible ops — the driver records a rows-only check, and a
#: dedicated pytest module carries the correctness burden instead).
#: Empty since r05: sim_ann_ivf_kmeans_topk gained a lazy fitted-centroid
#: oracle (registry_llm._kmeans_ivf_oracle).
NO_ORACLE_BY_DESIGN: set[str] = set()


def test_oracles_exist_for_window():
    e = _entry()
    osql = e.oracle_sql()
    no_oracle = [n for n in e.DRIVER_WINDOW
                 if n not in osql and n not in NO_ORACLE_BY_DESIGN]
    assert not no_oracle, f"window queries without oracle: {no_oracle}"


#: the r12 capacity policy (__spark_entry__.py RETIRED_SEATS comment):
#: 50 driver seats/round x 3-round staleness ceiling = 150 driver-visible
#: queries max; beyond that some row must cross the 4-round ceiling
#: every round, forever (the r11 judge's structural-debt finding).
REGISTRY_CAPACITY = 3 * DRIVER_SAMPLE


def test_registry_capacity():
    e = _entry()
    n = len(e.queries())
    assert n <= REGISTRY_CAPACITY, (
        f"driver-visible registry ({n}) exceeds the 50-seat/3-round "
        f"rotation capacity ({REGISTRY_CAPACITY}); retire a near-redundant "
        f"latest-green row into RETIRED_SEATS before registering")


def test_retired_seats_valid():
    """A retirement must not hide anything: the row stays in the full
    registry (local DuckDB parity keeps running), it left the driver
    shape, its LATEST driver row was green (never retire a red row),
    and the waiver names at least one sibling query that is still
    DRIVER-VISIBLE — the machinery the retired row exercised keeps
    earning driver attestations (r14 ADVICE item 3: membership checks
    alone would let a future retirement silently lose the only
    attestation of broken machinery)."""
    import re

    e = _entry()
    from kafka_connect_oss_spark.registry import QUERIES
    qs = e.queries()
    past = _past_rounds()
    for name, why in e.RETIRED_SEATS.items():
        assert name in QUERIES, f"retired {name} missing from full registry"
        assert name not in qs, f"retired {name} still driver-visible"
        assert why.strip(), f"retired {name} has no waiver note"
        row = past.get(name)
        assert row is not None, f"retired {name} was never driver-attested"
        assert (row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match")), (
            f"retired {name} latest driver row is red — fix, don't retire")
        siblings = set(re.findall(r"[a-z0-9_]+", why)) & set(qs)
        assert siblings, (
            f"retired {name}: waiver names no driver-visible sibling — "
            f"the covered machinery would stop earning attestations")


def test_measure_resolver_three_tiers():
    """measure.resolve_query must cover all three timer tiers: a
    driver-window row, a RETIRED_SEATS row (full registry only), and a
    staged-for-a-future-round row — the bench/time_query contract that
    keeps every wall-time row alive across the capacity policy (r12
    harness-review fix; regressions here drop rows SILENTLY from the
    bench artifact)."""
    e = _entry()
    from kafka_connect_oss_spark.measure import resolve_query
    from kafka_connect_oss_spark.registry import staged_queries

    qs = e.queries()
    assert resolve_query("q1_pricing_summary", qs) is qs["q1_pricing_summary"]
    retired = sorted(e.RETIRED_SEATS)[0]
    assert callable(resolve_query(retired, qs))
    staged = staged_queries()
    for name in staged:
        assert resolve_query(name, qs) is staged[name]


def test_bench_covers_every_query_and_staged_row():
    """Every full-registry query AND every staged row must have a bench
    wall-time row: HEADLINE + the auto-enumerated staged set (bench.py
    builds bench_names the same way)."""
    _entry()  # fully register the live registry first (order-independent)
    import bench as B
    from kafka_connect_oss_spark.registry import QUERIES, staged_queries

    bench_names = set(B.HEADLINE) | set(staged_queries())
    missing = sorted(set(QUERIES) - bench_names)
    assert not missing, f"registered rows with no bench row: {missing}"
    assert len(B.HEADLINE) == len(set(B.HEADLINE)), "duplicate HEADLINE row"


def test_staged_queries_order_independent():
    """staged_queries() must not depend on the caller's import order
    (r12 ADVICE item 1): called in a FRESH interpreter before anything
    imported the seated/entry modules, it must still exclude every
    already-seated row — registry._force_full_registration() makes the
    QUERIES snapshot complete before the subtraction."""
    import subprocess
    import sys

    code = (
        "from kafka_connect_oss_spark.registry import staged_queries\n"
        "import kafka_connect_oss_spark.registry_seated_r13 as s13\n"
        "from kafka_connect_oss_spark import registry_staged_r13 as S\n"
        "got = set(staged_queries())\n"
        "leak = got & set(S.STAGED_QUERIES)\n"
        "assert not leak, f'seated rows reported as staged: {leak}'\n"
    )
    # stricter still: call staged_queries with NO other imports at all
    code2 = (
        "from kafka_connect_oss_spark.registry import staged_queries\n"
        "got = set(staged_queries())\n"
        "assert 'q2_min_cost_supplier' not in got, got\n"
        "assert 'text_bpe_encode' not in got, got\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for c in (code, code2):
        proc = subprocess.run([sys.executable, "-c", c], cwd=repo,
                              capture_output=True, text=True)
        assert proc.returncode == 0, proc.stderr


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
