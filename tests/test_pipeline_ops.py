"""Edge-semantics tests for the training-pipeline operators added in round
2: as-of join (ties, no-match, one-shuffle plan), sequence packing
(boundary behavior), decontamination (exact n-gram containment)."""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.asof import asof_join
from kafka_connect_oss_spark.operators.packing import pack_sequences
from kafka_connect_oss_spark.operators.text import (benchmark_ngram_hashes,
                                                    decontaminate)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("t").cast("timestamp")).drop("t")


def test_asof_backward_inclusive_and_no_match(spark):
    left = _ts(spark, [(1, 100, "L1"), (1, 50, "L0"), (2, 10, "L2")],
               "k int, t long, lv string")
    right = _ts(spark, [(1, 100, "R100"), (1, 60, "R60"), (1, 120, "R120"),
                        (3, 5, "R3")],
                "k int, t long, rv string")
    out = {r.lv: (r.r_rv, r.r_ts)
           for r in asof_join(left, right, ["k"], right_prefix="r_")
           .collect()}
    # inclusive tie: left@100 matches right@100, not right@60
    assert out["L1"][0] == "R100"
    # left@50 precedes every right row for k=1 -> NULL (left-join semantics)
    assert out["L0"][0] is None
    # k=2 has no right rows at all -> NULL
    assert out["L2"][0] is None


def test_asof_plan_is_single_shuffle(spark):
    left = _ts(spark, [(1, 100, 1.0)], "k int, t long, v double")
    right = _ts(spark, [(1, 90, 2.0)], "k int, t long, w double")
    plan = asof_join(left, right, ["k"])._jdf.queryExecution() \
        .executedPlan().toString()
    # union-tag + window: exactly one exchange, and never a nested-loop /
    # cartesian range join
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_bounds_and_bucket_edges(spark):
    from kafka_connect_oss_spark.operators.asof import range_join

    # window [0, 10s]; pairs at exactly 0s, 10s included; 10.000001s out;
    # timestamps chosen to straddle bucket boundaries (width = 10s)
    left = _ts(spark, [(1, 100, "P")], "k int, t long, lv string")
    right = _ts(spark, [(1, 100, "E0"), (1, 110, "E10"), (1, 111, "E11"),
                        (1, 99, "Ebefore"), (2, 105, "Eotherkey")],
                "k int, t long, rv string")
    out = sorted(r.r_rv for r in
                 range_join(left, right, ["k"], 0, 10_000,
                            right_prefix="r_").collect())
    assert out == ["E0", "E10"]


def test_range_join_no_nested_loop(spark):
    from kafka_connect_oss_spark.operators.asof import range_join

    left = _ts(spark, [(1, 100, 1.0)], "k int, t long, v double")
    right = _ts(spark, [(1, 105, 2.0)], "k int, t long, w double")
    plan = range_join(left, right, ["k"], 0, 60_000)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_boundaries(spark):
    # one shard; 3 docs of 3 tokens, budget 4: starts at 0,3,6 -> packs 0,0,1
    docs = spark.createDataFrame(
        [(0, "a b c"), (8, "d e f"), (16, "g h i")], "doc_id long, text string")
    out = {r.doc_id: r for r in
           pack_sequences(docs, budget_tokens=4, n_shards=1).collect()}
    assert (out[0].pack_id, out[0].offset_in_pack) == (0, 0)
    assert (out[8].pack_id, out[8].offset_in_pack) == (0, 3)
    assert (out[16].pack_id, out[16].offset_in_pack) == (1, 2)
    assert all(r.shard == 0 for r in out.values())


def test_pack_sequences_sharding_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(40)],
        "doc_id long, text string")
    a = sorted(map(tuple, pack_sequences(docs).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(7)).collect()))
    assert a == b                       # layout survives repartitioning
    shards = {r[1] for r in a}
    assert shards == set(range(8))      # doc_id mod 8


def test_pq_encode_codes_and_plan(spark, sf_dir):
    from kafka_connect_oss_spark.operators import similarity
    from kafka_connect_oss_spark.sources.batch import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = similarity.pq_codebooks(emb)
    assert len(cbs) == similarity.PQ_M
    assert all(len(cb) == similarity.PQ_CODES for cb in cbs)
    enc = similarity.pq_encode(emb, cbs)
    rows = enc.select("vec_id", *[f"code_{i}" for i in range(4)]).collect()
    # codes in 1..16; codebook seed vectors quantize to themselves
    for r in rows:
        assert all(1 <= r[f"code_{i}"] <= 16 for i in range(4))
    by_id = {r.vec_id: r for r in rows}
    for j in range(similarity.PQ_CODES):
        assert all(by_id[j][f"code_{i}"] == j + 1 for i in range(4))
    # encode is a pure narrow projection: no KEYED exchange in the plan
    # (a round-robin fan-out exchange is permitted — dedup._fan_out only
    # fires under small local scans and no-ops at production splits)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan


def test_asof_null_payload_carried_atomically(spark):
    # a right row with a legitimately NULL payload column must be matched
    # as a whole row — never stitched with an older row's non-null value
    left = _ts(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = spark.createDataFrame(
        [(1, 50, "old", 5), (1, 90, None, 9)],
        "k int, t long, rv string, rn int").withColumn(
        "ts", F.col("t").cast("timestamp")).drop("t")
    row = asof_join(left, right, ["k"], right_prefix="r_").collect()[0]
    # the matched row IS the ts=90 row: rv NULL, rn 9 — not (old, 9)
    assert row.r_rv is None
    assert row.r_rn == 9


def test_asof_equal_ts_tie_is_deterministic(spark):
    # two right rows at the identical timestamp: the winner must be the
    # same row on every run/partitioning (content-hash tie-break)
    left = _ts(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = _ts(spark, [(1, 100, "A"), (1, 100, "B")],
                "k int, t long, rv string")
    picks = set()
    for reparted in (right, right.repartition(5), right.repartition(2)):
        for _ in range(2):
            picks.add(asof_join(left, reparted, ["k"], right_prefix="r_")
                      .collect()[0].r_rv)
    assert len(picks) == 1


def test_benchmark_hashes_python_matches_spark_expression(spark):
    # the driver-side Python fold must be bit-identical to the generated
    # Spark expression chain it replaced (md5 -> first-15-hex fold over
    # word 3-gram shingles)
    from kafka_connect_oss_spark.functions import hashing as H
    from kafka_connect_oss_spark.operators.text import benchmark_ngram_hashes

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "  doubled  spaces   and trailing "),
         (2, "unicode café naïve 中文 tokens here"),
         (3, "short"), (4, None), (5, "")],
        "doc_id long, text string")
    tok = "filter(split(text, ' '), tt -> tt <> '')"
    sh = H.word_shingles(tok, 3, "spark")
    spark_hashes = sorted(
        r.h for r in bench.where(F.col("text").isNotNull())
        .select(F.explode(F.expr(H.shingle_hashes(sh, "spark")))
                .alias("h")).distinct().collect())
    assert benchmark_ngram_hashes(bench, ngram=3) == spark_hashes


def test_decontaminate_empty_benchmark_passes_all(spark):
    docs = spark.createDataFrame(
        [(10, "some text here ok")], "doc_id long, text string")
    for bench_rows in ([], [(0, "too short")], [(1, None)]):
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        out = decontaminate(docs, bench, ngram=3).collect()
        assert [r.doc_id for r in out] == [10]


def test_decontaminate_exact_ngram_containment(spark):
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "something with the quick brown fox inside"),   # 3-gram hit
         (11, "quick brown wolf is different text entirely"),  # no 3-gram
         (12, "the quick wolf brown fox non contiguous")],     # no 3-gram
        "doc_id long, text string")
    clean = sorted(r.doc_id for r in
                   decontaminate(docs, bench, ngram=3).collect())
    assert clean == [11, 12]


def test_decontaminate_semi_join_fallback_matches_broadcast(spark, sf_dir):
    # golden round-trip discipline (TestOSSSinkConnectorBase.java:128-153):
    # the exploded semi-join (benchmark too big to broadcast) must produce
    # the exact clean set of the broadcast-literal path on the same inputs
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 11 == 0).limit(40)
    broadcast_ids = sorted(
        r.doc_id for r in
        decontaminate(docs, bench, ngram=3,
                      max_broadcast_hashes=None).select("doc_id").collect())
    # max_broadcast_hashes=0: any non-empty benchmark exceeds the bound,
    # forcing the distributed fallback
    fallback_ids = sorted(
        r.doc_id for r in
        decontaminate(docs, bench, ngram=3,
                      max_broadcast_hashes=0).select("doc_id").collect())
    assert broadcast_ids == fallback_ids
    assert 0 < len(broadcast_ids) < docs.count()


def test_benchmark_ngram_hashes_bails_past_bound(spark):
    bench = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(50)],
        "doc_id long, text string")
    assert benchmark_ngram_hashes(bench, ngram=3, max_hashes=10) is None
    # trigram starting at token j arises from rows i=j and i=j-1, i in
    # [0,49] -> j in [0,50]: 51 distinct trigrams
    full = benchmark_ngram_hashes(bench, ngram=3, max_hashes=None)
    assert full is not None and len(full) == 51


def test_asof_skew_bucketed_matches_plain(spark):
    # one hot key spanning many buckets, right-row gaps included: the
    # (key, bucket) plan must reproduce the plain single-window result
    left_rows, right_rows = [], []
    for h in range(0, 48, 2):            # left rows every 2h over 2 days
        left_rows.append((1, h * 3_600, f"L{h}"))
    for h in (1, 3, 30, 31):             # right rows only in a few buckets
        right_rows.append((1, h * 3_600, f"R{h}"))
    right_rows.append((1, 3 * 3_600, f"R3b"))          # equal-ts tie
    left = _ts(spark, left_rows, "k int, t long, lv string")
    right = _ts(spark, right_rows, "k int, t long, rv string")

    def run(**kw):
        return sorted(
            (r.lv, r.r_rv, r.r_ts)
            for r in asof_join(left, right, ["k"], right_prefix="r_",
                               **kw).collect())

    plain = run()
    bucketed = run(skew_bucket_ms=3_600_000)           # 1h buckets
    assert plain == bucketed
    # sanity: carries cross empty buckets (left@8h matches right@3h)
    by_lv = dict((lv, rv) for lv, rv, _ in bucketed)
    assert by_lv["L8"] in ("R3", "R3b")
    assert by_lv["L0"] is None                          # before any right


def test_asof_skew_plan_partitions_by_key_and_bucket(spark):
    left = _ts(spark, [(1, 10, "a")], "k int, t long, lv string")
    right = _ts(spark, [(1, 5, "b")], "k int, t long, rv string")
    out = asof_join(left, right, ["k"], right_prefix="r_",
                    skew_bucket_ms=60_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the in-bucket window must partition by (key, bucket), not key alone
    assert "_bk" in plan
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("_bk" in ln and "k#" in ln for ln in windows), windows


def test_contamination_overlap_fallback_matches_broadcast(spark, sf_dir):
    # same golden both-paths discipline as decontaminate: the distributed
    # hash-join regime must score identically to the broadcast literal
    from kafka_connect_oss_spark.operators.text import contamination_overlap
    from kafka_connect_oss_spark.sources.batch import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") % 11 == 0).limit(40)
    broadcast_rows = sorted(map(tuple, contamination_overlap(
        docs, bench, ngram=3, max_broadcast_hashes=None).collect()))
    fallback_rows = sorted(map(tuple, contamination_overlap(
        docs, bench, ngram=3, max_broadcast_hashes=0).collect()))
    assert broadcast_rows == fallback_rows
    assert any(r[3] > 0 for r in broadcast_rows)       # some contamination
    assert any(r[3] == 0 for r in broadcast_rows)      # not everything


def test_source_cap_salted_matches_plain_window(spark, sf_dir):
    # the two-phase salted top-k must equal the single-window form: the
    # global per-source top-k is a subset of every salt bucket's top-k
    from pyspark.sql import Window

    from kafka_connect_oss_spark.registry_llm import corpus_source_cap, _SOURCE_CAP
    from kafka_connect_oss_spark.operators.text import quality_score
    from kafka_connect_oss_spark.sources.batch import load_table

    got = sorted(map(tuple, corpus_source_cap(spark, sf_dir).collect()))
    docs = load_table(spark, sf_dir, "documents")
    q = (quality_score(docs, keep_cols=("source",))
         .select("source", "doc_id", "quality"))
    w = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    plain = (q.withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") <= _SOURCE_CAP)
             .select("source", "doc_id", "quality", "rk"))
    assert got == sorted(map(tuple, plain.collect()))


def test_dead_letter_split_preserves_raw_bytes(spark):
    from pyspark.sql import types as T

    from kafka_connect_oss_spark.operators import projection

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, 'not json at all'), (3, '}{"k": 7}'),
         (4, '{"k": null}')],
        "id long, value string")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    good, dead = projection.dead_letter_split(df, "value", schema)
    assert {(r.id, r.k) for r in good.collect()} == {(1, 5), (4, None)}
    # DLQ rows keep their ORIGINAL bytes for replay
    assert {(r.id, r.raw_value) for r in dead.collect()} == {
        (2, 'not json at all'), (3, '}{"k": 7}')}


def test_dead_letter_split_envelope_path(spark):
    """Envelope decode must route outer-JSON corruption and missing
    payload members to the DLQ (errors.tolerance=all contract,
    TestDataWriterJson.java:192-201 envelope shape); NULL values (Kafka
    tombstones) stay non-dead."""
    from pyspark.sql import types as T

    from kafka_connect_oss_spark.operators import projection

    df = spark.createDataFrame(
        [(1, '{"schema": {}, "payload": {"k": 5}}'),   # good
         (2, '}{ corrupt outer'),                      # dead: outer corrupt
         (3, '{"schema": {}, "nopayload": 1}'),        # dead: no payload
         (4, None),                                    # tombstone: good/null
         (5, '{"payload": "not an object"}')],         # dead: payload corrupt
        "id long, value string")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    good, dead = projection.dead_letter_split(df, "value", schema,
                                              envelope=True)
    assert {(r.id, r.k) for r in good.collect()} == {(1, 5), (4, None)}
    assert {(r.id, r.raw_value) for r in dead.collect()} == {
        (2, '}{ corrupt outer'), (3, '{"schema": {}, "nopayload": 1}'),
        (5, '{"payload": "not an object"}')}
