"""Schema projection & decode operators (SURVEY.md §2 E2-E6).

reference:
  E2 `compatibility.project(record, null, currentSchema)`
     (TopicPartitionWriter.java:228; Confluent SchemaProjector semantics:
     fields present in both -> cast; fields only in target -> default/null)
  E3 JSON decode with/without schema envelope (format/json/JsonFormat.java:37-46)
  E4 JSON -> registry schema -> Parquet (ParquetJsonRecordWriterProvider.java:85-122;
     the protobuf class registry becomes a StructType registry here)
  E6 Struct -> JSON encode (JsonRecordWriterProvider.java:71-85)

All pure column expressions: projection is a `select` of casts + coalesced
defaults, which Catalyst folds into the scan (column pruning + constant
folding) — the 100 TB cost is exactly the cost of reading the projected
columns, nothing more.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def project_to_schema(df: DataFrame, target: T.StructType,
                      defaults: dict[str, object] | None = None) -> DataFrame:
    """E2: project a DataFrame onto `target`.

    - field exists in df  -> cast to the target type
    - field missing       -> default literal (or NULL), mirroring
      SchemaProjector's defaulted-field fill (TestDataWriterAvro.java:465-466)
    - extra df fields     -> dropped (projection onto the narrower schema)
    """
    defaults = defaults or {}
    cols: list[Column] = []
    have = {f.name for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(defaults.get(field.name)).cast(field.dataType)
                        .alias(field.name))
    return df.select(*cols)


def decode_json_value(df: DataFrame, value_col: str, schema: T.StructType,
                      envelope: bool = False) -> DataFrame:
    """E3/E4: parse a JSON string column into typed columns.

    `envelope=True` handles the Connect `{"schema":..., "payload":...}`
    envelope (TestDataWriterJson.java:192-201) by decoding the payload
    member; otherwise the whole string is the record
    (schemas.enable=false path, JsonFormat.java:40-45).
    """
    src = F.get_json_object(F.col(value_col), "$.payload") if envelope \
        else F.col(value_col)
    decoded = F.from_json(src, schema).alias("_decoded")
    return df.withColumn("_decoded", decoded).select(
        *[c for c in df.columns if c != "_decoded"], "_decoded.*")


def encode_json_value(df: DataFrame, cols: list[str],
                      out_col: str = "json_value") -> DataFrame:
    """E6: struct -> JSON-lines payload (to_json of a struct of columns)."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


#: column carrying the raw value of records that failed to decode
CORRUPT_COL = "_corrupt"


def decode_json_with_dlq(df: DataFrame, value_col: str,
                         schema: T.StructType,
                         envelope: bool = False) -> DataFrame:
    """JSON decode with dead-letter capture — the Kafka Connect
    ``errors.tolerance=all`` + DLQ contract the reference sink runs under
    (framework-level in Connect: a record whose conversion throws is
    routed to ``errors.deadletterqueue.topic.name`` instead of killing
    the task; the reference relies on that, README.md quick-start).

    PERMISSIVE ``from_json`` with ``columnNameOfCorruptRecord``: rows
    that fail to parse keep every schema column NULL and carry their RAW
    value in ``CORRUPT_COL`` (so the DLQ writer can preserve bytes
    exactly); rows that parse carry NULL there. A pure narrow projection
    — malformed data costs no shuffle and never fails the job.

    Envelope path: a non-NULL value whose OUTER JSON is corrupt (or has
    no ``payload`` member) makes ``get_json_object`` return NULL, and
    ``from_json(NULL)`` yields a NULL struct rather than a corrupt
    marker — so the extraction miss is folded into ``CORRUPT_COL``
    explicitly (raw value preserved). NULL values (Kafka tombstones)
    stay non-dead, matching Connect's tolerance of null records.
    """
    full = T.StructType(list(schema.fields) +
                        [T.StructField(CORRUPT_COL, T.StringType())])
    src = F.get_json_object(F.col(value_col), "$.payload") if envelope \
        else F.col(value_col)
    decoded = F.from_json(
        src, full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL})
    out = df.withColumn("_decoded", decoded).select(
        *[c for c in df.columns if c != "_decoded"], "_decoded.*")
    if not envelope:
        return out
    # envelope path: (a) extraction miss — src NULL while the raw value
    # is not — is dead; (b) a payload-level parse failure must carry the
    # ORIGINAL record bytes (not the extracted payload) for exact replay
    return out.withColumn(
        CORRUPT_COL,
        F.when(F.col(CORRUPT_COL).isNotNull() |
               (src.isNull() & F.col(value_col).isNotNull()),
               F.col(value_col)))


def dead_letter_split(df: DataFrame, value_col: str, schema: T.StructType,
                      envelope: bool = False) -> tuple[DataFrame, DataFrame]:
    """(good, dead) frames from one decode pass: ``good`` has the typed
    columns, ``dead`` has the original row plus the raw value for DLQ
    replay. Both derive from the same narrow projection."""
    decoded = decode_json_with_dlq(df, value_col, schema, envelope)
    good = decoded.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = (decoded.where(F.col(CORRUPT_COL).isNotNull())
            .select(*df.columns, F.col(CORRUPT_COL).alias("raw_value")))
    return good, dead
