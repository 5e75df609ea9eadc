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
