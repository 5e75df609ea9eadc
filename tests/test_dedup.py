"""Behavioral checks for the dedup/similarity operators on constructed
near-duplicates (the synthetic corpus has none, so these prove recall)."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog while the cat "
            "sleeps on the warm mat near the old wooden door of the barn")
    mutated = base.replace("warm mat", "cold mat")          # 1-word change
    unrelated = ("completely different words about spark query engines "
                 "processing petabytes of training data with vectorized "
                 "parquet readers and adaptive shuffle partitioning")
    rows = [(0, base), (1, base), (2, mutated), (3, unrelated)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical(near_dup_docs):
    out = dedup.exact_dedup(near_dup_docs).collect()
    by_count = sorted(r.n_copies for r in out)
    assert by_count == [1, 1, 2]            # (0,1) identical, 2 and 3 unique
    dup = [r for r in out if r.n_copies == 2][0]
    assert dup.keep_id == 0                  # keeper = min id


def test_lsh_finds_near_duplicates(near_dup_docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.lsh_candidate_pairs(
                 near_dup_docs, jaccard_threshold=0.3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # identical docs
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.7    # 1-word mutation
    assert not any(3 in p for p in pairs)             # unrelated never pairs


def test_simhash_near_for_near_docs(near_dup_docs):
    fp = {r.doc_id: r.simhash
          for r in dedup.simhash_fingerprints(near_dup_docs).collect()}
    assert fp[0] == fp[1]
    ham_near = bin(fp[0] ^ fp[2]).count("1")
    ham_far = bin(fp[0] ^ fp[3]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_blocked(near_dup_docs):
    docs = near_dup_docs.withColumn("lang", F.lit("en")) \
                        .withColumn("source", F.lit("s"))
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(
                 docs, ["lang", "source"], threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs


def test_ann_lsh_is_subset_of_bruteforce_universe(spark, sf_dir):
    from kafka_connect_oss_spark.sources.batch import load_table
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.query_vector(spark, emb, 0)
    exact = similarity.topk_cosine(emb, q, k=10).collect()
    ann = similarity.ann_lsh_topk(emb, q, k=10).collect()
    assert exact[0].vec_id == 0 and exact[0].cosine == 1.0  # self is top-1
    assert 0 in {r.vec_id for r in ann}      # query's own bucket contains it
    assert all(-1.0 <= r.cosine <= 1.0 for r in ann)


def test_connectivity_edges_same_components(spark, sf_dir):
    # the collapsed graph (rep pairs + identity-group star edges) must
    # produce bit-identical CC labels to the full expanded pair set —
    # both on the real corpus and on a constructed clone cluster
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    full = dedup.dedup_clusters(
        docs, dedup.lsh_candidate_pairs(docs, jaccard_threshold=0.3))
    collapsed = dedup.dedup_clusters(
        docs, dedup.connectivity_edges(docs, jaccard_threshold=0.3))
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, collapsed.collect()))


def test_connectivity_edges_same_components_clone_cluster(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")
    rows = ([(i, base) for i in range(6)]            # 6 identical clones
            + [(10, near), (11, near)]               # near-dup clone pair
            + [(20, "unrelated totally different tokens entirely"),
               (21, ""), (22, "")])                  # empty docs: no edges
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = dedup.dedup_clusters(
        docs, dedup.lsh_candidate_pairs(docs, jaccard_threshold=0.3))
    collapsed = dedup.dedup_clusters(
        docs, dedup.connectivity_edges(docs, jaccard_threshold=0.3))
    got = sorted(map(tuple, collapsed.collect()))
    assert got == sorted(map(tuple, full.collect()))
    labels = {doc_id: cid for doc_id, cid, _ in got}
    assert labels[0] == labels[5] == labels[10] == labels[11] == 0
    assert labels[20] == 20
    assert labels[21] == 21 and labels[22] == 22     # empties stay apart


def test_clusters_from_docs_same_components(spark, sf_dir):
    # the r17 collapsed fast path (min-label loop over verified REP
    # PAIRS only, star members attached by one label join afterward)
    # must produce bit-identical labels to the generic union-graph loop
    # over connectivity_edges — the structural claim it rests on: rep =
    # group min, so member labels never lower any rep's fixpoint min
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    union_graph = dedup.dedup_clusters(
        docs, dedup.connectivity_edges(docs, jaccard_threshold=0.3))
    fast = dedup.dedup_clusters_from_docs(docs, jaccard_threshold=0.3)
    assert sorted(map(tuple, fast.collect())) == \
        sorted(map(tuple, union_graph.collect()))


def test_clusters_from_docs_same_components_constructed(spark):
    # constructed corner cases: clone mega-group, near-dup clone pair,
    # a rep chain (transitive closure through reps), isolated doc,
    # empty-text identity group (no star edges — members stay apart)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.replace("kappa", "lambda")
    far = near.replace("iota", "mu")  # chains 0-cluster via 10/11
    rows = ([(i, base) for i in range(6)]            # 6 identical clones
            + [(10, near), (11, near)]               # near-dup clone pair
            + [(12, far)]                            # 2-hop rep chain
            + [(20, "unrelated totally different tokens entirely"),
               (21, ""), (22, "")])                  # empty docs: no edges
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    union_graph = dedup.dedup_clusters(
        docs, dedup.connectivity_edges(docs, jaccard_threshold=0.3))
    got = sorted(map(tuple, dedup.dedup_clusters_from_docs(
        docs, jaccard_threshold=0.3).collect()))
    assert got == sorted(map(tuple, union_graph.collect()))
    labels = {doc_id: cid for doc_id, cid, _ in got}
    assert labels[0] == labels[5] == labels[10] == labels[11] == 0
    assert labels[20] == 20
    assert labels[21] == 21 and labels[22] == 22     # empties stay apart


def test_connectivity_edges_same_drop_set(spark, sf_dir):
    # cleaned-corpus drop semantics: distinct id_b (docs with a smaller
    # near-dup neighbor) must be identical between pair set and edge set
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs_b = {r.id_b for r in dedup.lsh_candidate_pairs(
        docs, jaccard_threshold=0.3).select("id_b").distinct().collect()}
    edges_b = {r.id_b for r in dedup.connectivity_edges(
        docs, jaccard_threshold=0.3).select("id_b").distinct().collect()}
    assert pairs_b == edges_b


def test_dedup_clusters_repeatable(spark, sf_dir):
    # guard against nondeterminism in the iterative CC loop (cache/
    # convergence races): two independent runs must produce the identical
    # (doc_id, cluster_id, is_representative) set
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents")
    def run():
        spark.catalog.clearCache()
        pairs = dedup.lsh_candidate_pairs(docs, jaccard_threshold=0.3)
        return sorted(map(tuple, dedup.dedup_clusters(docs, pairs).collect()))
    assert run() == run()


def test_cleaned_corpus_no_forced_broadcast(spark, sf_dir):
    # the drop list scales with the corpus dup-rate (clone-dense corpora are
    # 30-50%+ duplicates), so dedup_cleaned_corpus must never carry a
    # broadcast HINT on it — AQE may still choose broadcast at runtime when
    # the side is genuinely small, which is exactly the desired behavior
    from kafka_connect_oss_spark.registry_llm import dedup_cleaned_corpus

    df = dedup_cleaned_corpus(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_dedup_clusters_ignores_non_doc_pair_ids(spark):
    # stale pair tables can reference filtered-out docs: the output row-set
    # must stay exactly `docs` and labels must be doc ids (ADVICE r04)
    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 99), (98, 99)], "id_a long, id_b long")
    got = sorted(map(tuple, dedup.dedup_clusters(docs, pairs).collect()))
    assert got == [(1, 1, True), (2, 1, False), (3, 3, True)]


def test_dedup_clusters_releases_previous_checkpoints(spark):
    # the propagation loop must not pin one checkpoint per iteration for the
    # session lifetime (executor storage would grow with iteration depth);
    # only O(1) checkpointed RDDs may remain after the run
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # a path graph has diameter 7 -> several propagation rounds
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "id_a long, id_b long")
    out = dedup.dedup_clusters(docs, pairs, max_iterations=20)
    assert {r.cluster_id for r in out.collect()} == {0}
    after = jsc.getPersistentRDDs().size()
    # the staged pairs frame (r11) + edges + edge_nodes + the final
    # round's checkpoint survive — a fixed O(1) set. The invariant under
    # test is no PER-ITERATION growth: this path graph ran ~8 rounds, so
    # a leak of intermediate checkpoints would read ~11, not <= 4. (The
    # old bound of 3 pre-dated the pairs staging and passed only when
    # Python GC happened to release it before this count ran.)
    assert after - before <= 4


def test_incremental_status_all_three_classes(spark):
    # base: two docs; inc: an exact twin of base, an intra-inc twin pair,
    # a near-dup of base (one token changed), and a fresh doc
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "one two three four five six seven eight")],
        "doc_id long, text string")
    inc = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),   # = base 0
         (3, "fresh words nothing shared with anything here1"),
         (5, "fresh words nothing shared with anything here1"),  # = inc 3
         (7, "one two three four five six seven nine"),          # near base 2
         (9, "completely different tokens again entirely novel")],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in
           dedup.incremental_dedup_status(base, inc,
                                          jaccard_threshold=0.3).collect()}
    assert got == {1: "dup_exact", 3: "kept", 5: "dup_exact",
                   7: "dup_near", 9: "kept"}


def test_semdedup_flags_planted_duplicate(spark, sf_dir):
    """An exact copy of an existing vector under a higher id must be
    flagged; the lowest id of every cluster can never be flagged."""
    from kafka_connect_oss_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clone = (emb.where(F.col("vec_id") == 17)
             .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    out = dedup.semdedup_flags(emb.union(clone), threshold=0.999)
    rows = {r.vec_id: r for r in out.collect()}
    assert rows[100017].is_dup          # identical vector, higher id
    assert rows[100017].cid == rows[17].cid
    assert not rows[17].is_dup          # original keeps its seat
    # cluster minima are structurally never duplicates
    by_cid = {}
    for r in rows.values():
        by_cid.setdefault(r.cid, []).append(r)
    for members in by_cid.values():
        lowest = min(members, key=lambda r: r.vec_id)
        assert not lowest.is_dup
