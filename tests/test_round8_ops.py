"""Round-8 operator tests: snapshot diff, exact incremental dedup
candidates, large-K IVF assignment, pair-cap guard."""

from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import dedup


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
