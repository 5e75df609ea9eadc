"""Round-8 operator tests: snapshot diff, exact incremental dedup
candidates, large-K IVF assignment, pair-cap guard."""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import dedup, similarity


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_ivf_assign_join_path_matches_literal(spark, sf_dir):
    """Above the K threshold ivf_assign must switch to the broadcast-join
    argmax and return bit-identical assignments (ties to lowest cid,
    zero vectors included); below it the plan stays the r07 zero-join
    literal form."""
    from kafka_connect_oss_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    cents = similarity.kmeans_centroids(emb, n_centroids=8)
    lit = similarity.ivf_assign(emb, cents)
    join = similarity.ivf_assign(emb, cents, literal_max_k=2)
    assert sorted(map(tuple, lit.collect())) == \
        sorted(map(tuple, join.collect()))
    assert "Join" not in _plan(lit)
    assert "BroadcastNestedLoopJoin" in _plan(join)


def test_ivf_assign_join_path_keep_nv_and_ties(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])],
        "cid int, cv array<double>")
    for kw in ({}, {"literal_max_k": 1}):
        got = {r.vec_id: r.cid
               for r in similarity.ivf_assign(emb, cents, **kw).collect()}
        # vec 1 ties cids 1 and 3 -> lowest; zero vec 3 ties all -> 1
        assert got == {1: 1, 2: 2, 3: 1}, kw
        nv = {r.vec_id: r.cid for r in similarity.ivf_assign(
            emb, cents, keep_nv=True, **kw).collect()}
        assert nv == got


def test_incremental_recall_is_exact_on_r7_counterexample(spark):
    """The round-7 judge's hypothesis counterexample: J('ep alpha ep ep',
    'alpha alpha ep alpha ep ep') = 0.5 >= 0.3 but the 8-hash/4-band
    minhash banding deterministically missed it (s-curve recall ~68% at
    J=0.5). The round-8 shingle-posting candidates must catch it."""
    base = spark.createDataFrame(
        [(2, "alpha alpha ep alpha ep ep")], "doc_id long, text string")
    inc = spark.createDataFrame(
        [(1, "ep alpha ep ep")], "doc_id long, text string")
    got = dedup.incremental_dedup_status(base, inc).collect()
    assert [(r.doc_id, r.status) for r in got] == [(1, "dup_near")]


def test_incremental_hot_shingle_cap_bounds_candidates(spark):
    """Shingles with base df > cap are excluded from candidate
    generation: with cap=1 every shared shingle of the increment doc is
    hot (df=2), so a true near-dup degrades to kept — deterministic,
    documented miss mode; cap=None restores exactness."""
    base = spark.createDataFrame(
        [(2, "a b c d"), (4, "a b c e")], "doc_id long, text string")
    # shares only the hot shingle "a b c" (base df=2) with either base
    # doc; J vs "a b c d" = 1/3 >= 0.3
    inc = spark.createDataFrame(
        [(1, "a b c x")], "doc_id long, text string")
    capped = dedup.incremental_dedup_status(
        base, inc, hot_shingle_df_cap=1).collect()
    assert capped[0].status == "kept"
    uncapped = dedup.incremental_dedup_status(
        base, inc, hot_shingle_df_cap=None).collect()
    assert uncapped[0].status == "dup_near"


def test_ingest_lifecycle_compact_classify_recompact_audit(
        spark, sf_dir, tmp_path_factory):
    """The full append-mostly lifecycle the r08 pieces compose: compact
    dedup state from the accepted corpus -> classify an arriving batch
    against the tables -> append only the kept arrivals -> snapshot_diff
    audits exactly those ids as 'added' (nothing removed/changed) ->
    re-compaction classifies the NEXT batch identically to the
    in-memory operator on the grown corpus."""
    from kafka_connect_oss_spark.operators import bucketing as B
    from kafka_connect_oss_spark.sources.batch import load_table

    loc = tmp_path_factory.mktemp("lifec")
    B.ensure_database(spark, "lifec", str(loc))
    try:
        docs = load_table(spark, sf_dir, "documents")
        base = docs.where(F.col("doc_id") % 3 == 0)
        inc1 = docs.where(F.col("doc_id") % 3 == 1)
        dedup.compact_base_tables(base, "lifec.s1", n_buckets=4)

        st1 = dedup.incremental_dedup_status_from_tables(
            spark, "lifec.s1", inc1)
        kept_ids = {r.doc_id for r in
                    st1.where(F.col("status") == "kept").collect()}
        kept = inc1.where(F.col("doc_id").isin(list(kept_ids)))
        corpus2 = base.unionByName(kept)

        audit = {r.doc_id: r.status
                 for r in dedup.snapshot_diff(base, corpus2).collect()}
        assert {i for i, s in audit.items() if s == "added"} == kept_ids
        assert all(s in ("added", "unchanged") for s in audit.values())

        dedup.compact_base_tables(corpus2, "lifec.s2", n_buckets=4)
        inc2 = docs.where(F.col("doc_id") % 3 == 2)
        got = sorted(map(tuple, dedup.incremental_dedup_status_from_tables(
            spark, "lifec.s2", inc2).collect()))
        expect = sorted(map(tuple, dedup.incremental_dedup_status(
            corpus2, inc2).collect()))
        assert got == expect
    finally:
        spark.sql("DROP DATABASE lifec CASCADE")


def test_ngram_pair_cap_guard(spark):
    """max_pairs_per_block: a block owing more pairs than the cap fails
    fast with the block named; at or under the cap results are the
    unguarded ones."""
    import pytest as _pt

    rows = [(i, "en", "s", "w x y z") for i in range(1, 5)]  # C(4,2)=6
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string")
    with _pt.raises(ValueError, match="en"):
        dedup.ngram_jaccard_pairs(df, ["lang", "source"], threshold=0.0,
                                  max_pairs_per_block=5)
    capped = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, ["lang", "source"], threshold=0.0,
        max_pairs_per_block=6).collect()))
    plain = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, ["lang", "source"], threshold=0.0).collect()))
    assert capped == plain and len(plain) == 6


def test_snapshot_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string")
    got = {r.doc_id: r.status
           for r in dedup.snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_empty_sides(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert dedup.snapshot_diff(empty, docs).collect()[0].status == "added"
    assert dedup.snapshot_diff(docs, empty).collect()[0].status == "removed"
    assert dedup.snapshot_diff(empty, empty).count() == 0
