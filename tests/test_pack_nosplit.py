"""Whole-document no-split packing (packing.pack_documents_nosplit):
capacity invariant, oversize semantics, order modes, determinism, and
a plain-Python next-fit reference under hypothesis. (DuckDB parity runs
in tests/test_staged_seats_r12.py through the staged entry.)"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import packing as P
from kafka_connect_oss_spark.sources.batch import load_table

BUDGET = 50


def _docs(spark, lens, n_shards_mod=1):
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in
            enumerate(lens)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_capacity_invariant_and_offsets(spark):
    lens = [30, 25, 20, 10, 5, 60, 1, 0]
    out = P.pack_documents_nosplit(_docs(spark, lens), BUDGET,
                                   n_shards=1).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, rows in by_pack.items():
        if not any(r.oversize for r in rows):
            assert sum(r.n_tokens for r in rows) <= BUDGET
        # offsets are the running total in pack order
        rows.sort(key=lambda r: r.offset_in_pack)
        cum = 0
        for r in rows:
            assert r.offset_in_pack == cum
            cum += r.n_tokens
    # the 60-token doc exceeds the budget: own pack, flagged
    over = [r for r in out if r.n_tokens == 60]
    assert over[0].oversize
    assert len(by_pack[over[0].pack_id]) == 1


def test_length_desc_beats_id_order_on_fill(spark):
    """FFD-flavored ordering must not produce MORE packs than arrival
    order on a skewed length mix (the reason the mode exists)."""
    lens = [45, 6, 45, 6, 45, 6, 45, 6]
    n_ffd = max(r.pack_id for r in P.pack_documents_nosplit(
        _docs(spark, lens), BUDGET, n_shards=1,
        order="length_desc").collect()) + 1
    n_id = max(r.pack_id for r in P.pack_documents_nosplit(
        _docs(spark, lens), BUDGET, n_shards=1,
        order="id").collect()) + 1
    assert n_ffd <= n_id


def test_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, P.pack_documents_nosplit(
        docs, 128).collect()))
    b = sorted(map(tuple, P.pack_documents_nosplit(
        docs.repartition(13), 128).collect()))
    assert a == b


def test_unknown_order_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="order"):
        P.pack_documents_nosplit(_docs(spark, [1]), BUDGET,
                                 order="random")


def _py_next_fit(lens_with_ids, budget):
    """Reference: next-fit over (len desc, id) order."""
    rows = sorted(lens_with_ids, key=lambda x: (-x[1], x[0]))
    out = {}
    cur, pack, first = 0, 0, True
    for i, n in rows:
        if not first and cur + n > budget:
            pack += 1
            cur = 0
        first = False
        out[i] = (pack, cur, n > budget)
        cur += n
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lens=st.lists(st.integers(min_value=0, max_value=70),
                     min_size=1, max_size=12))
def test_matches_python_next_fit(spark, lens):
    got = {r.doc_id: (r.pack_id, r.offset_in_pack, r.oversize)
           for r in P.pack_documents_nosplit(
               _docs(spark, lens), BUDGET, n_shards=1).collect()}
    want = _py_next_fit(list(enumerate(lens)), BUDGET)
    assert got == want, lens
