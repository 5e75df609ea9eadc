"""End-to-end training-order export (packing.training_order_export):
budget realization, epoch materialization semantics, determinism across
partitionings, and the digest's sensitivity to every chained stage.
(DuckDB parity is carried by the registered oracle in
tests/test_oracle_parity.py.)"""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import packing as P
from kafka_connect_oss_spark.sources.batch import load_table


def _export(spark, sf_dir, **kw):
    args = dict(budget_tokens=70_000, seed=11, seq_tokens=2048,
                n_shards=16)
    args.update(kw)
    return P.training_order_export(load_table(spark, sf_dir, "documents"),
                                   **args)


def test_budget_realization(spark, sf_dir):
    """Realized token take must concentrate at the planner's budget:
    full epochs are exact, the fractional epoch is Bernoulli(frac) over
    ~500 docs, so +-20% is a generous determinism-safe band."""
    rows = _export(spark, sf_dir).collect()
    total = sum(r.shard_tokens for r in rows)
    assert 0.8 * 70_000 <= total <= 1.2 * 70_000, total
    assert len(rows) <= 16
    assert all(r.n_instances >= r.n_docs for r in rows)


def test_epoch_materialization_counts(spark, sf_dir):
    """Every doc appears exactly floor(epochs) or floor(epochs)+1 times
    across the export (same epochs for every source under natural
    weights), and the plan's epoch factor is what the instances show."""
    docs = load_table(spark, sf_dir, "documents")
    plan = P.epoch_plan(docs, budget_tokens=70_000).collect()
    eps = {r.source: r.epochs for r in plan}
    # natural weights -> near-uniform epochs (per-source target rounding
    # perturbs the 4th decimal only), with one shared floor
    assert max(eps.values()) - min(eps.values()) < 0.01
    floors = {int(v) for v in eps.values()}
    assert len(floors) == 1
    full = floors.pop()
    n_docs = docs.count()
    total_inst = sum(r.n_instances
                     for r in _export(spark, sf_dir).collect())
    assert full * n_docs <= total_inst <= (full + 1) * n_docs
    # fractional selection actually selects SOME docs (frac ~ 0.5 here)
    assert total_inst > full * n_docs


def test_deterministic_across_partitionings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, P.training_order_export(
        docs, 70_000, seed=11).collect()))
    b = sorted(map(tuple, P.training_order_export(
        docs.repartition(13), 70_000, seed=11).collect()))
    assert a == b


def test_seed_changes_permutation_not_take(spark, sf_dir):
    """A new seed reshuffles (digests change) but the planned take is
    epoch-plan-driven, so totals stay in the same band; the fractional
    selection is seed-dependent so totals need not be equal."""
    a = _export(spark, sf_dir, seed=11).collect()
    b = _export(spark, sf_dir, seed=12).collect()
    assert {r.shard: r.content_digest for r in a} != \
           {r.shard: r.content_digest for r in b}
    ta, tb = (sum(r.shard_tokens for r in x) for x in (a, b))
    assert abs(ta - tb) / max(ta, tb) < 0.1


def test_pack_count_bounds(spark, sf_dir):
    """Concat-and-split invariant: a doc is assigned to the pack where
    its first token lands, so n_packs = floor(cum_before_last/seq) + 1,
    which is >= 1 and <= ceil(shard_tokens/seq) (the last instance's
    tokens spill forward, never opening an extra pack)."""
    import math

    for r in _export(spark, sf_dir, seq_tokens=512).collect():
        assert 1 <= r.n_packs <= max(1, math.ceil(r.shard_tokens / 512))
