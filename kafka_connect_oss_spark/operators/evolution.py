"""Schema-evolution tracking (SURVEY.md §2 E1, R5).

reference semantics (README.md:127-142; TopicPartitionWriter.java:136-137,
217-222):

  NONE      — any schema change rotates the current files; the new schema
              becomes current.
  BACKWARD  — a *newer* (higher-version / superset) schema rotates and
              becomes current; records with *older* schemas are projected
              onto the current one.
  FORWARD   — records are projected onto the *oldest* schema seen; no
              rotation on newer schemas.
  FULL      — same rotation/projection action as BACKWARD (the reference
              README's "FULL performs the same action as BACKWARD"), plus a
              bidirectional compatibility check.

Spark DataFrames are single-schema per plan, so mixed-schema input arrives
as separate DataFrames (or is split by a schema-id column); this module
keeps the per-encoded-partition "current schema" state the reference keeps
in TopicPartitionWriter.java:64,195-197 and decides rotate / project for
each incoming schema. It is driver-side control logic over tiny metadata —
never touches row data, so it costs nothing at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


def _field_map(schema: T.StructType) -> dict[str, T.StructField]:
    return {f.name: f for f in schema.fields}


def is_promotable(old: T.DataType, new: T.DataType) -> bool:
    """Widening primitive promotion (int->long->float->double), the same
    lattice Connect's SchemaProjector allows."""
    order = ["tinyint", "smallint", "int", "bigint", "float", "double"]
    o, n = old.simpleString(), new.simpleString()
    if o == n:
        return True
    return o in order and n in order and order.index(o) <= order.index(n)


def is_backward_compatible(new: T.StructType, old: T.StructType) -> bool:
    """`new` can read data written with `old`: every old field either exists
    in new (promotable type) or is simply dropped; fields added by new must
    be nullable (readable as NULL for old records)."""
    new_fields = _field_map(new)
    for name, f_old in _field_map(old).items():
        if name in new_fields and not is_promotable(f_old.dataType,
                                                    new_fields[name].dataType):
            return False
    for name, f_new in new_fields.items():
        if name not in _field_map(old) and not f_new.nullable:
            return False
    return True


class IncompatibleSchemaError(Exception):
    """Analog of Connect's SchemaProjectorException — the record's schema
    cannot be reconciled with the tracked one under the configured mode."""


@dataclass
class _PartitionState:
    current: T.StructType | None = None
    current_version: int = 0
    seen: dict[str, int] = field(default_factory=dict)  # schema json -> version


@dataclass
class SchemaTracker:
    """Per-encoded-partition current-schema state (E1/R5 driver).

    The reference orders schemas by the Connect schema `version()`; batch
    DataFrames carry no version, so versions are assigned in arrival order
    (a replayed old schema keeps its original version — deterministic under
    reprocessing, which the exactly-once story requires).

    `observe` returns True when the writer must rotate (commit open files,
    start new ones with the adopted schema) — the reference's
    `compatibility.shouldChangeSchema` (TopicPartitionWriter.java:217-222).
    """

    compatibility: str = "NONE"
    _state: dict[str, _PartitionState] = field(default_factory=dict)

    def observe(self, partition_key: str, schema: T.StructType) -> bool:
        st = self._state.setdefault(partition_key, _PartitionState())
        key = schema.json()
        version = st.seen.setdefault(key, len(st.seen) + 1)

        if st.current is None:
            st.current, st.current_version = schema, version
            return True
        if schema == st.current:
            return False

        mode = self.compatibility
        if mode == "NONE":
            st.current, st.current_version = schema, version
            return True
        if mode in ("BACKWARD", "FULL"):
            if mode == "FULL" and not is_backward_compatible(st.current, schema):
                raise IncompatibleSchemaError(partition_key)
            if version > st.current_version:
                if not is_backward_compatible(schema, st.current):
                    raise IncompatibleSchemaError(partition_key)
                st.current, st.current_version = schema, version
                return True
            return False  # older schema: project onto current, keep writing
        if mode == "FORWARD":
            # records are projected onto the first schema seen; never adopt
            if not is_backward_compatible(st.current, schema):
                raise IncompatibleSchemaError(partition_key)
            return False
        raise ValueError(f"unknown compatibility {mode!r}")

    def projection_target(self, partition_key: str) -> T.StructType | None:
        st = self._state.get(partition_key)
        return st.current if st else None


def process_mixed_schema_batch(batch, schema_registry: dict[int, T.StructType],
                               tracker: SchemaTracker, write_fn,
                               value_col: str = "value",
                               schema_id_col: str = "schema_id",
                               partition_key: str = "_stream") -> list:
    """Mixed-schema micro-batch: split by schema id, decode each group with
    its schema, let the tracker rotate/adopt, project onto the tracked
    target, write groups sequentially in version order.

    This is the Spark answer to the reference's per-record schema checks on
    an alternating-schema stream (createRecordsWithAlteringSchemas,
    TestDataWriterAvro.java:411-437): records carry a schema id (the Schema
    Registry wire-format model), and a DataFrame being single-schema forces
    group-at-a-time processing. Documented deviation (SURVEY.md §7.4 #2):
    under NONE with schemas alternating record-by-record the reference cuts
    a file at every flip; grouping cuts one file set per (schema, batch) —
    same records, same projection semantics, coarser file boundaries.

    `write_fn(decoded_df) -> list` performs the actual commit (e.g.
    sinks.commit_batch curried with config); returns the concatenated
    write_fn results in processing order. Only the tiny distinct-id set is
    collected to the driver; row data never leaves executors.
    """
    from pyspark.sql import functions as F

    from kafka_connect_oss_spark.operators.projection import project_to_schema

    ids = sorted(r[0] for r in
                 batch.select(schema_id_col).distinct().collect())
    committed: list = []
    for sid in ids:
        schema = schema_registry[sid]
        tracker.observe(partition_key, schema)
        target = tracker.projection_target(partition_key) or schema
        sub = batch.where(F.col(schema_id_col) == sid)
        # envelope columns are dropped in the same select that expands the
        # decoded struct — payload fields may legally shadow their names
        carried = [c for c in sub.columns
                   if c not in (value_col, schema_id_col)]
        decoded = (sub
                   .withColumn("_decoded",
                               F.from_json(F.col(value_col), schema))
                   .select(*carried, "_decoded.*"))
        full_target = T.StructType(
            [f for f in decoded.schema.fields if f.name in carried]
            + list(target.fields))
        committed.extend(write_fn(project_to_schema(decoded, full_target)))
    return committed
