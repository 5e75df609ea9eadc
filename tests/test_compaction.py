"""Small-file compaction (`packing.compact_corpus`): layout changes,
content provably does not — the order-independent shard_manifest digest
is the receipt. Reference analog: size-based rotation is the reference's
write-side defense against small objects (OSSSinkConnectorConfig
rotate.file.size); compaction is the corpus-side repair."""

import glob

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators.packing import (compact_corpus,
                                                       shard_manifest)
from kafka_connect_oss_spark.sources.batch import load_table


def _manifest_rows(df):
    return sorted(map(tuple, shard_manifest(df, 8).collect()))


def test_compact_corpus_flat_preserves_content(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "ingested"
    # simulate per-batch sink output: 3 batch partitions x 8 files each
    (docs.withColumn("batch_id", (F.col("doc_id") % 3).cast("int"))
     .repartition(8)
     .write.partitionBy("batch_id").parquet(str(src)))
    files_before = glob.glob(str(src / "**" / "*.parquet"), recursive=True)
    assert len(files_before) >= 12

    dst = tmp_path / "compacted"
    stats = compact_corpus(spark, str(src), str(dst),
                           target_file_bytes=1 << 40)  # everything -> 1
    files_after = glob.glob(str(dst / "*.parquet"))
    assert len(files_after) == 1
    assert stats["n_files"] == 1
    assert stats["files_after"] < stats["files_before"]

    before = spark.read.parquet(str(src)).drop("batch_id")
    after = spark.read.parquet(str(dst)).drop("batch_id")
    assert _manifest_rows(before) == _manifest_rows(after)
    assert after.count() == docs.count()

    # balance=True (shuffled) path: same content, requested file count
    dst2 = tmp_path / "compacted_balanced"
    total = stats["bytes_before"]
    stats2 = compact_corpus(spark, str(src), str(dst2),
                            target_file_bytes=max(1, total // 3),
                            balance=True)
    assert stats2["n_files"] >= 2
    assert len(glob.glob(str(dst2 / "*.parquet"))) == stats2["n_files"]
    assert _manifest_rows(spark.read.parquet(str(dst2))
                          .drop("batch_id")) == _manifest_rows(before)


def test_compact_corpus_keeps_partition_key(spark, sf_dir, tmp_path):
    """partition_by keeps the pruning key (the retroactive_takedown
    layout) while collapsing each partition to ONE file."""
    docs = load_table(spark, sf_dir, "documents")
    src = tmp_path / "ingested"
    (docs.withColumn("batch_id", (F.col("doc_id") % 3).cast("int"))
     .repartition(8)
     .write.partitionBy("batch_id").parquet(str(src)))

    dst = tmp_path / "compacted"
    compact_corpus(spark, str(src), str(dst), partition_by="batch_id")
    for b in range(3):
        part_files = glob.glob(str(dst / f"batch_id={b}" / "*.parquet"))
        assert len(part_files) == 1, f"batch {b}: {part_files}"
    before = spark.read.parquet(str(src))
    after = spark.read.parquet(str(dst))
    assert sorted(map(tuple, before.select("doc_id", "batch_id").collect())) \
        == sorted(map(tuple, after.select("doc_id", "batch_id").collect()))


def test_publish_corpus_snapshot_end_to_end(spark, sf_dir, tmp_path):
    """The facade's published set equals the hand-wired composition of
    blocklist_filter + digest-window exact dedup + Gopher gates; the
    receipt's attribution sums exactly; the manifest sidecar matches a
    recomputed shard_manifest; growing the list changes only the
    affected shard's manifest digest (the O(n_shards) handshake)."""
    from kafka_connect_oss_spark.operators.dedup import blocklist_filter
    from kafka_connect_oss_spark.operators.packing import (
        publish_corpus_snapshot)
    from kafka_connect_oss_spark.operators.text import gopher_quality_flags
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    bl_digests = [r[0] for r in (docs.orderBy("doc_id").limit(4)
                                 .select(F.md5("text")).collect())]
    bl = spark.createDataFrame([(d,) for d in bl_digests], "digest string")

    out = str(tmp_path / "snap")
    receipt = publish_corpus_snapshot(spark, docs, out, blocklist=bl)

    # hand-wired golden composition, each stage its own operator
    gated = blocklist_filter(docs, bl)
    w = Window.partitionBy("_digest")
    uniq = (gated.withColumn("_keep", F.min("doc_id").over(w))
            .where(F.col("doc_id") == F.col("_keep")).drop("_keep"))
    passed = uniq.join(
        gopher_quality_flags(docs).where("pass_gopher").select("doc_id"),
        "doc_id", "semi")
    want = {r.doc_id for r in passed.collect()}

    published = spark.read.parquet(out)
    assert {r.doc_id for r in published.collect()} == want
    assert receipt["n_published"] == len(want)
    assert receipt["n_in"] == docs.count()
    assert (receipt["n_blocklisted"] + receipt["n_duplicate"]
            + receipt["n_quality"]) == receipt["n_in"] - len(want)
    # every clone of a blocklisted work is attributed to the blocklist,
    # never split with 'duplicate'
    n_bl_golden = docs.count() - gated.count()
    assert receipt["n_blocklisted"] == n_bl_golden

    # manifest sidecar == recomputed manifest over the published files
    m_side = sorted(map(tuple, spark.read.parquet(
        receipt["manifest_path"]).collect()))
    m_re = sorted(map(tuple, shard_manifest(published, 8).collect()))
    assert m_side == m_re

    # grow the list by one PUBLISHED work -> only its shard's manifest
    # row moves (a doc that never survived to snapshot 1 would move
    # nothing — the handshake detects published-content change only)
    extra = (published.orderBy("doc_id").limit(1)
             .select(F.md5("text").alias("digest")))
    bl2 = bl.union(extra)
    out2 = str(tmp_path / "snap2")
    publish_corpus_snapshot(spark, docs, out2, blocklist=bl2)
    m2 = sorted(map(tuple, spark.read.parquet(out2 + "_manifest").collect()))
    changed = [a[0] for a, b in zip(m_side, m2) if a != b]
    assert len(changed) == 1


def test_publish_corpus_snapshot_no_gates_no_list(spark, sf_dir, tmp_path):
    """With gates off and no list, publishing is exact dedup only."""
    from kafka_connect_oss_spark.operators.packing import (
        publish_corpus_snapshot)

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "snap")
    receipt = publish_corpus_snapshot(spark, docs, out, apply_gopher=False)
    n_uniq = docs.select(F.md5("text")).distinct().count()
    assert receipt["n_published"] == n_uniq
    assert receipt["n_blocklisted"] == receipt["n_quality"] == 0
    assert receipt["n_duplicate"] == docs.count() - n_uniq
    assert spark.read.parquet(out).count() == n_uniq


def test_publish_decision_plan_is_single_shuffle(spark, sf_dir):
    """The publisher's whole verdict costs ONE hash-partitioning
    Exchange (the digest window); the blocklist is a broadcast join,
    the gates are scan-side projection."""
    from kafka_connect_oss_spark.operators.packing import (
        corpus_publish_decisions)

    docs = load_table(spark, sf_dir, "documents")
    bl = docs.limit(3).select(F.md5("text").alias("digest"))
    plan = (corpus_publish_decisions(docs, bl)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _shard_files(path):
    import os
    return {p: os.path.getmtime(p)
            for p in glob.glob(str(path) + "/shard=*/*.parquet")}


def test_republish_changed_shards_rewrites_only_moved_shards(
        spark, sf_dir, tmp_path):
    """First publish writes all; identical republish writes NOTHING (no
    shard files touched); a one-work takedown rewrites exactly the
    shards holding that work's rows, leaving every other shard's files
    byte-level untouched (mtime-pinned)."""
    from kafka_connect_oss_spark.operators.packing import (
        republish_changed_shards, shard_of)

    docs = load_table(spark, sf_dir, "documents")
    snap = str(tmp_path / "snap")

    r1 = republish_changed_shards(spark, docs, snap, n_shards=8)
    assert r1["first_publish"] and len(r1["shards_written"]) == 8
    pub1 = spark.read.parquet(snap)
    assert r1["n_rows_written"] == pub1.count()

    # identical corpus -> zero writes, zero touched files
    before = _shard_files(tmp_path / "snap")
    r2 = republish_changed_shards(spark, docs, snap, n_shards=8)
    assert r2 == {"shards_written": [], "shards_deleted": [],
                  "n_rows_written": 0, "first_publish": False}
    assert _shard_files(tmp_path / "snap") == before

    # take down one published work -> only its shards move
    victim = pub1.orderBy("doc_id").limit(1).collect()[0]
    bl = spark.createDataFrame([(victim._digest,)], "digest string")
    want_shards = sorted({r.shard for r in pub1
                          .where(F.col("_digest") == victim._digest)
                          .withColumn("shard", shard_of("doc_id", 8))
                          .select("shard").distinct().collect()})
    n_pub1 = pub1.count()
    n_victim = pub1.where(F.col("_digest") == victim._digest).count()
    r3 = republish_changed_shards(spark, docs, snap, blocklist=bl,
                                  n_shards=8)
    assert r3["shards_written"] == want_shards
    after = _shard_files(tmp_path / "snap")
    untouched = {p: t for p, t in before.items()
                 if not any(f"shard={s}/" in p for s in want_shards)}
    assert all(after[p] == t for p, t in untouched.items())
    pub2 = spark.read.parquet(snap)
    assert pub2.where(F.col("_digest") == victim._digest).count() == 0
    assert pub2.count() == n_pub1 - n_victim
    # sidecar reflects the new state
    m = sorted(map(tuple, spark.read.parquet(snap + "_manifest").collect()))
    assert m == sorted(map(tuple, shard_manifest(pub2, 8).collect()))


def test_republish_deletes_emptied_shard(spark, sf_dir, tmp_path):
    """A shard whose every doc leaves the corpus must physically
    disappear (same rule as retroactive_takedown's emptied partition)."""
    from kafka_connect_oss_spark.operators.packing import (
        republish_changed_shards, shard_of)

    docs = (load_table(spark, sf_dir, "documents")
            .orderBy("doc_id").limit(6))
    # pick a doc alone in its shard
    shards = [(r.doc_id, r.s) for r in docs.withColumn(
        "s", shard_of("doc_id", 8)).select("doc_id", "s").collect()]
    from collections import Counter
    counts = Counter(s for _, s in shards)
    lone = next((d, s) for d, s in shards if counts[s] == 1)

    snap = str(tmp_path / "snap")
    republish_changed_shards(spark, docs, snap, apply_gopher=False,
                             n_shards=8)
    r = republish_changed_shards(
        spark, docs.where(F.col("doc_id") != lone[0]), snap,
        apply_gopher=False, n_shards=8)
    assert lone[1] in r["shards_deleted"]
    assert not (tmp_path / "snap" / f"shard={lone[1]}").exists()
    left = spark.read.parquet(snap)
    assert left.where(F.col("doc_id") == lone[0]).count() == 0
