"""De-risk probe for the r17 staging candidates (run this before
writing registry_staged_r17.py): proves that run_ingest_qc and
run_drift_monitor — the two foreachBatch monitors named as r17 seat
candidates in registry_staged_r16.py's docstring — can be driven as
driver rows with EXACT DuckDB SQL oracles, composed entirely from
fragments that already back green rows:

  * per-doc quality  -> functions/text.sql_quality_duckdb (backs
    corpus_curriculum_order / corpus_domain_profile oracles)
  * gopher flags     -> operators/text.gopher_quality_flags_oracle_sql
    (backs text_gopher_quality_flags)
  * drift report     -> operators/drift.drift_report_oracle_sql
    (backs corpus_drift_report)
  * replay plumbing  -> streaming/replay.py (pin_time_order makes the
    batch_id -> chunk mapping deterministic, so the oracle can label
    batches by predicate)

Prints MATCH/MISMATCH per candidate. Both monitors are stateless
across batches (each row set describes only its own batch), so no
sentinel flush is needed — the whole difficulty is the deterministic
batch labeling, which pin_time_order settles.

Usage: python scripts/probe_r17_monitors.py  [env: SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.01]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_oss_spark.functions import text as X  # noqa: E402
from kafka_connect_oss_spark.functions.rounding import round_sql  # noqa: E402
from kafka_connect_oss_spark.operators import drift as DRIFT  # noqa: E402
from kafka_connect_oss_spark.operators import text as TXT  # noqa: E402
from kafka_connect_oss_spark.sources.batch import load_table  # noqa: E402
from kafka_connect_oss_spark.streaming import analytics as A  # noqa: E402
from kafka_connect_oss_spark.streaming.replay import (  # noqa: E402
    drop_single_file, pin_time_order)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")


def compare(name, got_rows, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    want = sorted(tuple(str(r[i]) for i in order) for r in res.fetchall())
    tag = "MATCH" if got_rows == want else "MISMATCH"
    print(f"{name}: {tag} spark={len(got_rows)} oracle={len(want)}")
    if tag == "MISMATCH":
        print("  spark:", got_rows[:2])
        print("  duck :", want[:2])
    return tag == "MATCH"


def rows_of(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


#: the two micro-batches, by predicate — uneven split so the QC rows
#: differ; pin_time_order fixes batch_id 0 -> PREDS[0]
PREDS = ["doc_id % 4 = 0", "doc_id % 4 <> 0"]


def stream_two_chunks(docs, workdir):
    chunk_dir = f"{workdir}/chunks"
    os.makedirs(chunk_dir)
    for i, pred in enumerate(PREDS):
        drop_single_file(docs.where(F.expr(pred)), workdir, chunk_dir,
                         f"c{i}")
    pin_time_order(chunk_dir, [f"c{i}" for i in range(len(PREDS))])
    schema = spark.read.parquet(chunk_dir).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(chunk_dir))


def qc_batch_sql(pred: str) -> str:
    """The run_ingest_qc per-batch row in DuckDB — quality/gopher/dup
    fragments identical to the seated rows' oracles."""
    tok = X.sql_tokens("text", "duckdb")
    gopher = TXT.gopher_quality_flags_oracle_sql(
        f"(SELECT * FROM documents WHERE {pred})")
    return f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       {round_sql('AVG(quality)', 4)} AS mean_quality,
       {round_sql('AVG(CASE WHEN pass_gopher THEN 1.0 ELSE 0.0 END)', 4)}
         AS gopher_pass_rate,
       {round_sql('AVG(CASE WHEN _dup THEN 1.0 ELSE 0.0 END)', 4)}
         AS exact_dup_rate
    FROM (SELECT doc_id, {X.sql_quality_duckdb('t')} AS quality
          FROM (SELECT doc_id, {tok} AS t
                FROM documents WHERE {pred})) q
    JOIN (SELECT doc_id, pass_gopher FROM ({gopher})) g USING (doc_id)
    JOIN (SELECT doc_id,
                 doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
                   AS _dup
          FROM documents WHERE {pred}) d USING (doc_id)"""


ok = True

# ---- candidate (b): run_ingest_qc ----------------------------------
workdir = tempfile.mkdtemp(prefix="probe_r17_qc_")
docs = load_table(spark, SF, "documents")
sdf = stream_two_chunks(docs, workdir)
out, ck = f"{workdir}/out", f"{workdir}/ck"
A.run_ingest_qc(sdf, out, ck).awaitTermination()
got = (spark.read.parquet(out)
       .withColumn("batch_id", F.col("batch_id").cast("long")))
oracle = " UNION ALL ".join(
    f"SELECT b.*, CAST({i} AS BIGINT) AS batch_id FROM ({qc_batch_sql(p)}) b"
    for i, p in enumerate(PREDS))
ok &= compare("stream_ingest_qc_batch_equivalence", rows_of(got), oracle)

# ---- candidate (a): run_drift_monitor ------------------------------
workdir = tempfile.mkdtemp(prefix="probe_r17_drift_")
base_pred, arrival_preds = "doc_id % 2 = 0", \
    ["doc_id % 4 = 1", "doc_id % 4 = 3"]
docs.where(F.expr(base_pred)).write.parquet(f"{workdir}/baseline")
chunk_dir = f"{workdir}/chunks"
os.makedirs(chunk_dir)
for i, pred in enumerate(arrival_preds):
    drop_single_file(docs.where(F.expr(pred)), workdir, chunk_dir, f"c{i}")
pin_time_order(chunk_dir, [f"c{i}" for i in range(len(arrival_preds))])
schema = spark.read.parquet(chunk_dir).schema
sdf = (spark.readStream.schema(schema)
       .option("maxFilesPerTrigger", "1").parquet(chunk_dir))
out, ck = f"{workdir}/out", f"{workdir}/ck"
A.run_drift_monitor(sdf, f"{workdir}/baseline", out, ck).awaitTermination()
got = (spark.read.parquet(out)
       .withColumn("batch_id", F.col("batch_id").cast("long")))
base_sql = f"(SELECT * FROM documents WHERE {base_pred})"
oracle = " UNION ALL ".join(
    f"SELECT r.*, CAST({i} AS BIGINT) AS batch_id FROM "
    f"({DRIFT.drift_report_oracle_sql(base_sql, f'(SELECT * FROM documents WHERE {p})')}) r"
    for i, p in enumerate(arrival_preds))
ok &= compare("stream_drift_monitor_batch_equivalence", rows_of(got), oracle)

spark.stop()
print("PROBE", "OK — both r17 candidates oracle-exact" if ok else "FAILED")
sys.exit(0 if ok else 1)
