"""Round-11 staged seat definitions, SEATED at round 12.

Same contract as the round-10 batch in registry_staged: each entry is
the EXACT (query builder, oracle) pair the registry holds, proven
through the tests/parity.compare driver contract BEFORE registration
(tests/test_staged_seats_r12.py, round 11). registry_seated_r12
performed the mechanical seating move at round 12; this module remains
the single definition site. Importing THIS module never mutates
QUERIES/ORACLES — only importing registry_seated_r12 does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_oss_spark.operators import bpe
from kafka_connect_oss_spark.operators import drift as DRIFT
from kafka_connect_oss_spark.operators import packing as PK
from kafka_connect_oss_spark.operators import text as TXT
from kafka_connect_oss_spark.sources.batch import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}
STAGED_LAZY_ORACLES: dict[str, Callable[[str], str]] = {}

#: merge-table size shared by the query and its lazy oracle; 24 keeps the
#: oracle's packed-replace replay (one replace per merge) readable while
#: exercising multi-character merges well past the first round
BPE_N_MERGES = 24

# -- text_bpe_encode: LAZY oracle (merge table fitted from the data) -------

_BPE_MERGE_CACHE: dict[str, list] = {}


def _bpe_merges(spark: SparkSession, sf_dir: str) -> list:
    """Fit-once-per-sf cache shared by the query and its lazy oracle —
    legitimate because fit_bpe_merges is DETERMINISTIC (vocab-scale
    argmax with freq-desc + lexicographic tie-break, pinned by
    tests/test_bpe.py), the same discipline as the k-means and
    quality-model lazy oracles."""
    if sf_dir not in _BPE_MERGE_CACHE:
        docs = load_table(spark, sf_dir, "documents")
        _BPE_MERGE_CACHE[sf_dir] = bpe.fit_bpe_merges(docs, BPE_N_MERGES)
    return _BPE_MERGE_CACHE[sf_dir]


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with a corpus-fitted BPE merge table
    (operators/bpe.fit_bpe_merges + bpe_encode_ranked): the end-to-end
    tokenizer-training -> encoding path, per doc (n_tokens + the
    space-joined token string — subword pieces contain no spaces, the
    words were split on them). The ranked greedy encoder runs in one
    Arrow-batched mapInPandas pass, merge table shipped once per
    executor; ranked == in-order-replay == the oracle's packed replace
    is pinned by test_bpe."""
    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges(spark, sf_dir)
    enc = bpe.bpe_encode_ranked(docs, merges)
    return enc.select(
        "doc_id", "n_tokens",
        F.array_join("tokens", " ").alias("tokens_str"))


def _bpe_encode_oracle(sf_dir: str) -> str:
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate())
    merges = _bpe_merges(spark, sf_dir)
    return bpe.bpe_encode_oracle_sql("documents", merges)


STAGED_QUERIES["text_bpe_encode"] = text_bpe_encode
STAGED_LAZY_ORACLES["text_bpe_encode"] = _bpe_encode_oracle


def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility under the corpus-fitted merge
    table (operators/bpe.fertility_report): subword tokens per word and
    chars per token by lang — the eval row set a tokenizer-training run
    reads before the mixture bakes in over-segmented minority
    languages. Shares the deterministic fit cache with
    text_bpe_encode."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe.fertility_report(docs, _bpe_merges(spark, sf_dir))


def _bpe_fertility_oracle(sf_dir: str) -> str:
    spark = SparkSession.getActiveSession() or (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate())
    merges = _bpe_merges(spark, sf_dir)
    return bpe.fertility_report_oracle_sql("documents", merges)


STAGED_QUERIES["text_bpe_fertility"] = text_bpe_fertility
STAGED_LAZY_ORACLES["text_bpe_fertility"] = _bpe_fertility_oracle


def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span excision (operators/text.span_dedup): every
    cross-doc-duplicated merged chunk interval is cut out of the text,
    keeping the remainder in order — the repair half of Lee et al.
    2021's exact-substring dedup (dedup_span_coverage is the decision
    half over the same chunk grid)."""
    return TXT.span_dedup(load_table(spark, sf_dir, "documents"))


STAGED_QUERIES["text_span_dedup"] = text_span_dedup
STAGED_ORACLES["text_span_dedup"] = TXT.span_dedup_oracle_sql("documents")


def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution-shift report (operators/drift.
    drift_report) between two snapshots carved from the documents table
    with the corpus_snapshot_diff demo convention — base lacks the
    doc_id%10==9 stratum, snap drops %10==0 and rewrites %7==3 with an
    injected vocabulary — so churn, removal, AND real lexical drift are
    all present in the report."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 10 != 9)
    snap = (docs.where(F.col("doc_id") % 10 != 0)
            .withColumn("text",
                        F.when(F.col("doc_id") % 7 == 3,
                               F.concat(F.col("text"),
                                        F.lit(" drifted vocabulary"
                                              " injection")))
                        .otherwise(F.col("text"))))
    return DRIFT.drift_report(base, snap)


_DRIFT_BASE_SQL = "(SELECT * FROM documents WHERE doc_id % 10 <> 9)"
# SELECT * REPLACE keeps the oracle tracking the documents schema: a new
# column can't silently diverge this subquery from the Spark side's
# withColumn (r11 ADVICE item 1)
_DRIFT_SNAP_SQL = (
    "(SELECT * REPLACE (CASE WHEN doc_id % 7 = 3 "
    "THEN text || ' drifted vocabulary injection' ELSE text END AS text) "
    "FROM documents WHERE doc_id % 10 <> 0)")

STAGED_QUERIES["corpus_drift_report"] = corpus_drift_report
STAGED_ORACLES["corpus_drift_report"] = DRIFT.drift_report_oracle_sql(
    _DRIFT_BASE_SQL, _DRIFT_SNAP_SQL)

#: no-split pack budget — 128 tokens puts ~2 synthetic docs per pack, so
#: overflow, multi-pack shards, AND the oversize path all exercise
NOSPLIT_BUDGET = 128


def pack_nosplit_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document SFT packing (operators/packing.
    pack_documents_nosplit): greedy next-fit, longest-first, one
    sequential Arrow pass per shard — the no-split complement of the
    concat-and-split pack_training_sequences."""
    return PK.pack_documents_nosplit(
        load_table(spark, sf_dir, "documents"),
        budget_tokens=NOSPLIT_BUDGET)


STAGED_QUERIES["pack_nosplit_layout"] = pack_nosplit_layout
STAGED_ORACLES["pack_nosplit_layout"] = (
    PK.pack_documents_nosplit_oracle_sql("documents",
                                         budget_tokens=NOSPLIT_BUDGET))
