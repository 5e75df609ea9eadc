"""Schema-evolution semantics (E1/R5), mirroring the reference's
alternating-schema scenarios (TestDataWriterAvro.java:354-437)."""

from pyspark.sql import types as T

import pytest

from kafka_connect_oss_spark.operators.evolution import (
    IncompatibleSchemaError, SchemaTracker, is_backward_compatible)

V1 = T.StructType([
    T.StructField("booleanField", T.BooleanType(), True),
    T.StructField("intField", T.IntegerType(), True),
    T.StructField("longField", T.LongType(), True),
    T.StructField("stringField", T.StringType(), False),
])
# v2 = v1 + nullable defaulted field (FIXTURES.md F-6)
V2 = T.StructType(list(V1.fields) + [T.StructField("extra", T.StringType(), True)])
# incompatible: type clash on intField
V_BAD = T.StructType([T.StructField("intField", T.StringType(), True)])


def test_backward_compat_lattice():
    assert is_backward_compatible(V2, V1)          # added nullable field
    assert is_backward_compatible(V1, V2)          # dropping a field is fine
    assert not is_backward_compatible(V_BAD, V1)   # type clash
    wide = T.StructType([T.StructField("intField", T.LongType(), True)])
    narrow = T.StructType([T.StructField("intField", T.IntegerType(), True)])
    assert is_backward_compatible(wide, narrow)    # int -> long promotes
    assert not is_backward_compatible(narrow, wide)


def test_none_mode_rotates_on_any_change():
    t = SchemaTracker("NONE")
    assert t.observe("p0", V1)          # first schema -> rotate (open files)
    assert not t.observe("p0", V1)      # same schema -> keep writing
    assert t.observe("p0", V2)          # any change -> rotate
    assert t.observe("p0", V1)          # and back -> rotate again


def test_backward_mode_projects_old_records():
    t = SchemaTracker("BACKWARD")
    assert t.observe("p0", V1)
    assert t.observe("p0", V2)                     # newer schema adopted
    assert not t.observe("p0", V1)                 # old record: project, no rotate
    assert t.projection_target("p0") == V2


def test_forward_mode_keeps_oldest():
    t = SchemaTracker("FORWARD")
    assert t.observe("p0", V2)
    assert not t.observe("p0", V1)                 # project onto oldest
    assert t.projection_target("p0") == V2


def test_incompatible_schema_raises():
    t = SchemaTracker("BACKWARD")
    t.observe("p0", V1)
    with pytest.raises(IncompatibleSchemaError):
        t.observe("p0", V_BAD)   # type clash on intField


def test_per_partition_isolation():
    t = SchemaTracker("NONE")
    assert t.observe("p0", V1)
    assert t.observe("p1", V2)                     # independent state
    assert t.projection_target("p0") == V1
    assert t.projection_target("p1") == V2
