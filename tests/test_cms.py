"""Count-Min-Sketch operators (operators/sketches.cms_table /
cms_calibration): the bounded-memory token-frequency sketch.

Pins the three properties the 100 TB story rests on:

* one-sided guarantee — est >= exact for every queried token, at the
  default width AND at a tiny width that forces collisions (where the
  overestimate must actually appear, so the guarantee is tested on its
  non-trivial side);
* mergeability — the sketch of a union equals the cell-wise sum of the
  per-shard sketches (what lets shards/micro-batches maintain running
  frequencies in d*w counters);
* boundedness — the table never exceeds d*w rows regardless of corpus.

DuckDB parity for the registry-facing calibration row lives in
test_staged_seats_r13.py (driver contract, two SFs).
"""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import sketches as SK
from kafka_connect_oss_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_cms_table_bounded(docs):
    w = 64
    rows = SK.cms_table(docs, w=w).collect()
    assert 0 < len(rows) <= SK.CMS_D * w
    assert all(0 <= r.bucket < w and 0 <= r.j < SK.CMS_D for r in rows)
    # total mass per sketch row j == total token count (each token lands
    # in exactly one bucket per row)
    per_j = {}
    for r in rows:
        per_j[r.j] = per_j.get(r.j, 0) + r.cnt
    assert len(set(per_j.values())) == 1


@pytest.mark.parametrize("w", [SK.CMS_W, 8])
def test_one_sided_guarantee(docs, w):
    rows = SK.cms_calibration(docs, k=20, w=w).collect()
    assert len(rows) == 20
    assert all(r.cms_est >= r.exact_freq for r in rows), (
        "CMS must never underestimate")
    assert all(r.overestimate == r.cms_est - r.exact_freq for r in rows)
    if w == 8:
        # 8 buckets << vocabulary: collisions are certain, so the
        # guarantee is exercised on its non-trivial side
        assert any(r.overestimate > 0 for r in rows), (
            "tiny width must force collisions")


def test_estimate_matches_exact_when_collision_free(spark):
    # a 3-token corpus in a wide sketch: no collisions, est == exact
    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "bb cc"), (3, "aa")], "doc_id long, text string")
    rows = {r.token: r for r in SK.cms_calibration(docs, k=3).collect()}
    assert rows["aa"].cms_est == rows["aa"].exact_freq == 3
    assert rows["bb"].cms_est == rows["bb"].exact_freq == 2
    assert rows["cc"].cms_est == rows["cc"].exact_freq == 1


def test_mergeability(docs):
    """sketch(A union B) == cellwise-sum(sketch(A), sketch(B))."""
    w = 64
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    whole = {(r.j, r.bucket): r.cnt
             for r in SK.cms_table(docs, w=w).collect()}
    merged: dict = {}
    for part in (a, b):
        for r in SK.cms_table(part, w=w).collect():
            merged[(r.j, r.bucket)] = merged.get((r.j, r.bucket), 0) + r.cnt
    assert merged == whole


def test_partitioning_determinism(docs):
    one = {(r.j, r.bucket): r.cnt
           for r in SK.cms_table(docs.repartition(1), w=64).collect()}
    many = {(r.j, r.bucket): r.cnt
            for r in SK.cms_table(docs.repartition(13), w=64).collect()}
    assert one == many
