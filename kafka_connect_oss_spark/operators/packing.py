"""Training-sequence packing (driver-mandated extension).

Pretraining dataloaders concatenate documents into fixed token-budget
sequences ("packing"): docs are laid out in a deterministic order and the
stream is split at every `budget` tokens. This module implements the
concat-and-split discipline (each document assigned to the pack where its
FIRST token lands — the common GPT-style pipeline; a doc straddling a
boundary is split/truncated by the downstream tokenizer, which is out of
scope for layout).

Spark-first: layout = one window cumsum per shard — a single shuffle on
the shard key, linear, skew-free (shards are hash-balanced). No bin-search
or driver loop: first-fit-decreasing style packers need sequential state,
but production packing is deliberately order-deterministic so shuffles
reproduce byte-identical batches across restarts — exactly what a cumsum
expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, budget_tokens: int = 4096,
                   n_shards: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign every doc a (shard, pack_id, offset_in_pack) layout slot.

    shard = doc_id mod n_shards (deterministic, hash-balanced at scale);
    docs concatenate in doc_id order within a shard; pack boundaries at
    every `budget_tokens`. Returns (id_col, shard, pack_id, n_tokens,
    offset_in_pack).
    """
    tokens = F.expr(
        f"size(filter(split({text_col}, ' '), tt -> tt <> ''))")
    t = docs.select(
        id_col,
        F.pmod(F.col(id_col), n_shards).cast("long").alias("shard"),
        tokens.cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    c = t.withColumn("cum_before",
                     F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    pack = F.floor(F.col("cum_before") / budget_tokens)
    return c.select(
        id_col, "shard",
        pack.cast("long").alias("pack_id"),
        "n_tokens",
        (F.col("cum_before") - pack * budget_tokens).cast("long")
        .alias("offset_in_pack"))
