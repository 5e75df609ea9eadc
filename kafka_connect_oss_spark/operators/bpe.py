"""Distributed BPE tokenizer training — the tokenizer-fitting stage of a
training-data pipeline, missing from the operator surface until round 10.

Byte-pair encoding per the public recipe (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL —
algorithm 1): start from characters, repeatedly merge the most frequent
adjacent symbol pair, weighting by word frequency. The reference repo has
no tokenizer surface (it ships bytes; SURVEY §2 ends at format encoding),
so this is driver-mandated extension territory like dedup/similarity.

The 100 TB shape — why this parallelizes the way it does:

* ONE corpus-scale pass builds the (word, freq) table: a word-count, the
  canonical map-side-combined shuffle, output is vocabulary-sized
  (sublinear in corpus — Heaps' law), then staged.
* Every merge round runs on the WORD table, never the corpus: explode
  each word's current symbol sequence into adjacent pairs, weight by
  freq, one map-side-combined agg, take the argmax (a 1-row driver
  fetch — the same bounded-collect discipline as the k-means centroid
  fits), then apply the merge to the symbol sequences with a broadcast
  literal. Per-round cost is O(vocab), independent of corpus size.
* The merge application is a higher-order `aggregate` fold over the
  symbol array (JVM codegen, no UDF): a single left-to-right cursor
  that joins neighboring symbols equal to the merge pair — exactly the
  reference algorithm's scan, and the same fold shape text.span_dedup
  uses for interval excision.

Encoding with a fitted merge list (`bpe_encode`) applies merges in
learned order with the same fold — merges are a broadcast list, the
corpus pass is embarrassingly parallel, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to each word's final character, per the
#: reference algorithm (distinguishes "est</w>" from "est" mid-word).
EOW = "▁"

#: symbols never produced by tokenization that the fold can use as
#: separators when packing a symbol pair into one string key
_SEP = "␟"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the single corpus-scale pass of BPE
    training. Whitespace tokenization matching functions/text.sql_tokens;
    one map-side-combined shuffle on the word."""
    tok = f"filter(split({text_col}, ' '), tt -> tt <> '')"
    return (docs.select(F.explode(F.expr(tok)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _initial_symbols(word_col: str = "word") -> str:
    """SQL expr: a word's initial symbol sequence — its characters with
    EOW glued onto the last one."""
    chars = f"split({word_col}, '')"
    n = f"size({chars})"
    return (f"transform({chars}, (c, i) -> "
            f"IF(i = {n} - 1, concat(c, '{EOW}'), c))")


def _merge_fold(syms_col: str, a_lit: str, b_lit: str) -> str:
    """SQL expr applying ONE merge (a, b) -> ab to a symbol array via a
    single left-to-right aggregate fold: each incoming symbol either
    joins the accumulator's tail (tail == a and sym == b) or appends.
    Escapes embedded quotes via concat of char codes is unnecessary —
    symbols come from tokenized text with no quotes by construction of
    the callers' tests; still, literals are SQL-escaped here."""
    a = a_lit.replace("\\", "\\\\").replace("'", "\\'")
    b = b_lit.replace("\\", "\\\\").replace("'", "\\'")
    return (
        f"aggregate({syms_col}, CAST(array() AS ARRAY<STRING>), "
        f"(acc, s) -> IF(size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND s = '{b}', "
        f"concat(slice(acc, 1, size(acc) - 1), array(concat('{a}', '{b}'))), "
        f"concat(acc, array(s))))")


def pair_stats(docs: DataFrame, text_col: str = "text",
               merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """Adjacent-symbol-pair frequencies over the corpus' word table —
    one BPE training round's statistics, exposed as a queryable frame
    (the argmax row is the round's merge). ``merges`` replays an
    already-learned prefix first, so round N's stats are inspectable.

    Returns (sym_a, sym_b, pair_freq, n_words): total weighted count and
    the number of distinct words containing the pair."""
    wf = word_freq_table(docs, text_col)
    syms = F.expr(_initial_symbols("word"))
    df = wf.select("word", "freq", syms.alias("syms"))
    for a, b in merges or []:
        df = df.select("word", "freq",
                       F.expr(_merge_fold("syms", a, b)).alias("syms"))
    pairs = df.select(
        "freq",
        F.explode(F.expr(
            "CASE WHEN size(syms) < 2 THEN CAST(array() AS "
            "ARRAY<STRUCT<sym_a: STRING, sym_b: STRING>>) ELSE "
            "transform(sequence(1, size(syms) - 1), i -> "
            "struct(element_at(syms, i) AS sym_a, "
            "element_at(syms, i + 1) AS sym_b)) END")).alias("p"))
    return (pairs.select("freq", "p.sym_a", "p.sym_b")
            .groupBy("sym_a", "sym_b")
            .agg(F.sum("freq").cast("long").alias("pair_freq"),
                 F.count(F.lit(1)).cast("long").alias("n_words")))


def fit_bpe_merges(docs: DataFrame, n_merges: int,
                   text_col: str = "text",
                   on_round=None) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Iterative by
    nature (each merge depends on the last — Sennrich alg. 1), so this
    is a driver loop like the k-means fits: per round ONE vocab-scale
    job whose driver transfer is a single argmax row. Ties break
    deterministically (freq desc, then pair lexicographic) so the fit
    is reproducible across partitionings.

    The word table is staged once (lifecycle.stage_local) and the
    symbol column evolves per round — each round's plan applies one
    broadcast-literal fold on top of the previous staged frame, and the
    frame is re-staged per round so plan depth stays flat (the
    localCheckpoint-per-round discipline of the CC loop in
    dedup.connected components).

    ``on_round`` is an optional monitoring hook — called after each
    round as on_round(round_index, staged_word_frame); used by
    scripts/probe_r12_bpe.py to record per-round wall time and pin the
    flat-plan-depth claim at realistic merge counts. No effect on the
    fit.

    Returns [(sym_a, sym_b, pair_freq), ...] in merge order.
    """
    from kafka_connect_oss_spark.operators.lifecycle import stage_local

    wf = stage_local(word_freq_table(docs, text_col).select(
        "freq", F.expr(_initial_symbols("word")).alias("syms")))
    merges: list[tuple[str, str, int]] = []
    for _round in range(n_merges):
        pairs = wf.select(
            "freq",
            F.explode(F.expr(
                "CASE WHEN size(syms) < 2 THEN CAST(array() AS "
                "ARRAY<STRUCT<sym_a: STRING, sym_b: STRING>>) ELSE "
                "transform(sequence(1, size(syms) - 1), i -> "
                "struct(element_at(syms, i) AS sym_a, "
                "element_at(syms, i + 1) AS sym_b)) END")).alias("p"))
        top = (pairs.select("freq", "p.sym_a", "p.sym_b")
               .groupBy("sym_a", "sym_b")
               .agg(F.sum("freq").alias("pair_freq"))
               .orderBy(F.col("pair_freq").desc(), "sym_a", "sym_b")
               .limit(1).collect())
        if not top or top[0].pair_freq < 2:
            break  # nothing left worth merging (freq-1 pairs are noise)
        a, b = top[0].sym_a, top[0].sym_b
        merges.append((a, b, int(top[0].pair_freq)))
        wf = stage_local(wf.select(
            "freq", F.expr(_merge_fold("syms", a, b)).alias("syms")))
        if on_round is not None:
            on_round(_round, wf)
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize documents with a fitted merge list: per word, start from
    characters and apply every merge in learned order (the reference
    encoder). Merges ride the plan as broadcast literals; the pass is
    narrow — no shuffle, no UDF, one fold per merge inside whole-stage
    codegen.

    Returns (id_col, tokens array<string>, n_tokens). Out-of-vocabulary
    character sequences simply stay as smaller pieces — BPE's open-vocab
    property."""
    tok = f"filter(split({text_col}, ' '), tt -> tt <> '')"
    d = docs.select(id_col, F.explode_outer(F.expr(tok)).alias("word"))
    d = d.withColumn("syms", F.expr(_initial_symbols("word")))
    for m in merges:
        a, b = m[0], m[1]
        d = d.withColumn("syms", F.expr(_merge_fold("syms", a, b)))
    return (d.groupBy(id_col)
            .agg(F.flatten(F.collect_list("syms")).alias("tokens"))
            .select(id_col, "tokens",
                    F.expr("size(tokens)").cast("long").alias("n_tokens")))


def pair_stats_oracle_sql(table_expr: str, text_col: str = "text",
                          merges: list[tuple[str, str]] | None = None) -> str:
    """DuckDB mirror of ``pair_stats``: same tokenization, same EOW
    gluing, same fold semantics. DuckDB lacks a typed fold, so the
    merge replay runs on a PACKED symbol string with boundary-safe
    delimiters: ``SEP <sym> SEP SEP <sym> ... SEP`` (single sentinel at
    the ends, double between symbols). A merge (a, b) -> ab is then one
    plain ``replace(packed, 'SEP a SEP SEP b SEP', 'SEP ab SEP')``:

    * the flanking sentinels make the pattern match only FULL symbols
      (a suffix like 'xa' cannot match — 'a' must sit right after a
      boundary), without regexp lookarounds (RE2 has none);
    * the single-at-edges/double-between invariant survives each
      replacement (the match consumes one of the two inner sentinels on
      each side, the replacement restores it), so back-to-back
      occurrences ('a b a b') all merge — replace() resumes scanning
      after the replaced segment exactly like the fold's cursor;
    * within one round neither form can cascade (the merged symbol
      'ab' is strictly longer than 'a', so it can never satisfy the
      rule again), which makes left-to-right single-pass replace
      semantically identical to the aggregate fold.

    Sentinel characters (_SEP, and EOW as a symbol suffix) must not
    occur in the input text — true for tokenized natural text and the
    synthetic corpus; the Spark side has no such constraint."""
    merges = merges or []
    # packed initial symbols: chars double-SEP-joined, EOW glued to the
    # last char, single SEP at both ends
    packed = (f"concat('{_SEP}', array_to_string(string_split_regex("
              f"word, ''), '{_SEP}{_SEP}'), '{EOW}{_SEP}')")
    for a, b in merges:
        pa = a.replace("'", "''")
        pb = b.replace("'", "''")
        packed = (f"replace({packed}, '{_SEP}{pa}{_SEP}{_SEP}{pb}{_SEP}',"
                  f" '{_SEP}{pa}{pb}{_SEP}')")
    toks = f"list_filter(string_split({text_col}, ' '), tt -> tt <> '')"
    return f"""WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({toks}) AS word FROM {table_expr})
      GROUP BY word),
    s AS (SELECT freq, string_split(
            trim({packed}, '{_SEP}'), '{_SEP}{_SEP}') AS syms
          FROM wf),
    p AS (SELECT freq, syms[i] AS sym_a, syms[i + 1] AS sym_b
          FROM s, unnest(range(1, len(syms))) AS t(i)
          WHERE len(syms) >= 2)
    SELECT sym_a, sym_b, CAST(SUM(freq) AS BIGINT) AS pair_freq,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM p GROUP BY sym_a, sym_b"""


def bpe_encode_oracle_sql(table_expr: str, merges: list,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB mirror of the fitted encoders: per word, the same
    boundary-safe packed-replace replay ``pair_stats_oracle_sql``
    documents (replay-in-learned-order == greedy ranked, pinned by
    test_bpe), reassembled per document in word order. Docs with no
    words keep an empty token string via the left join."""
    packed = (f"concat('{_SEP}', array_to_string(string_split_regex("
              f"word, ''), '{_SEP}{_SEP}'), '{EOW}{_SEP}')")
    for m in merges:
        pa = m[0].replace("'", "''")
        pb = m[1].replace("'", "''")
        packed = (f"replace({packed}, '{_SEP}{pa}{_SEP}{_SEP}{pb}{_SEP}',"
                  f" '{_SEP}{pa}{pb}{_SEP}')")
    toks = f"list_filter(string_split({text_col}, ' '), tt -> tt <> '')"
    return f"""WITH w0 AS (
      SELECT {id_col}, {toks} AS ws FROM {table_expr}),
    w AS (SELECT {id_col}, ws[i] AS word, i AS wp
          FROM w0, unnest(range(1, len(ws) + 1)) AS t(i)),
    s AS (SELECT {id_col}, wp, string_split(
            trim({packed}, '{_SEP}'), '{_SEP}{_SEP}') AS syms
          FROM w),
    d AS (SELECT {id_col},
                 flatten(list(syms ORDER BY wp)) AS toks
          FROM s GROUP BY {id_col})
    SELECT t.{id_col},
           CAST(COALESCE(len(d.toks), 0) AS BIGINT) AS n_tokens,
           COALESCE(array_to_string(d.toks, ' '), '') AS tokens_str
    FROM {table_expr} t LEFT JOIN d USING ({id_col})"""


def bpe_encode_ranked(docs: DataFrame, merges: list,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Production-scale BPE encoder: greedy lowest-rank-first merging per
    word inside an Arrow-batched ``mapInPandas`` — the standard encoder
    algorithm (apply, at each step, the learned merge with the smallest
    rank among pairs present; equivalent to replaying merges in learned
    order, which is how every deployed BPE tokenizer encodes).

    ``bpe_encode``'s fold form is the zero-Python path but stacks one
    plan node per merge — ideal for tens of merges, unusable at a real
    32k-merge vocabulary (a 32k-deep expression tree breaks codegen and
    analysis long before execution). Here the merge table rides the
    closure ONCE per executor (broadcast by task serialization), the
    pass stays embarrassingly parallel with no shuffle before the
    output, and a per-batch word cache encodes each distinct word once
    (Zipf makes the cache hit rate high — the classic tokenizer
    optimization).

    Same output contract as ``bpe_encode``: (id_col, tokens, n_tokens);
    equality between the two encoders is pinned by test_bpe."""
    import pandas as pd

    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    def _encode_word(word: str, cache: dict) -> list:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = [*word[:-1], word[-1] + EOW]
        while len(syms) >= 2:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def _encode(batches):
        cache: dict = {}
        for pdf in batches:
            toks, ns = [], []
            for text in pdf[text_col]:
                out: list = []
                for w in (text or "").split(" "):
                    if w:
                        out.extend(_encode_word(w, cache))
                toks.append(out)
                ns.append(len(out))
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks,
                                "n_tokens": ns})

    return docs.select(id_col, text_col).mapInPandas(
        _encode, f"{id_col} long, tokens array<string>, n_tokens long")


def fertility_report(docs: DataFrame, merges: list,
                     text_col: str = "text", lang_col: str = "lang",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-language tokenizer fertility under a fitted merge table — the
    standard tokenizer evaluation (fertility = subword tokens emitted
    per whitespace word; chars per token as the byte-economy view). A
    tokenizer trained on a skewed mixture over-segments the minority
    languages; this report is how that shows up as one row per lang
    before a training run bakes it in.

    One ``bpe_encode_ranked`` pass (Arrow, merge table in the closure)
    plus a words/chars projection and a lang-keyed aggregate — cost is
    the encoder's, the report adds one small shuffle.

    Returns (lang_col, n_docs, total_words, total_chars, total_tokens,
    fertility, chars_per_token), ratios rounded to 4.
    """
    from kafka_connect_oss_spark.functions.rounding import fround

    enc = bpe_encode_ranked(docs, merges, text_col, id_col)
    words = F.expr(
        f"size(filter(split({text_col}, ' '), tt -> tt <> ''))")
    base = docs.select(id_col, lang_col,
                       words.cast("long").alias("_w"),
                       F.length(text_col).cast("long").alias("_c"))
    j = base.join(enc.select(id_col, "n_tokens"), id_col)
    return (j.groupBy(lang_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("_w").cast("long").alias("total_words"),
                 F.sum("_c").cast("long").alias("total_chars"),
                 F.sum("n_tokens").cast("long").alias("total_tokens"),
                 fround(F.sum("n_tokens")
                        / F.nullif(F.sum("_w").cast("double"),
                                   F.lit(0.0)), 4).alias("fertility"),
                 fround(F.sum("_c")
                        / F.nullif(F.sum("n_tokens").cast("double"),
                                   F.lit(0.0)), 4)
                 .alias("chars_per_token")))


def fertility_report_oracle_sql(table_expr: str, merges: list,
                                text_col: str = "text",
                                lang_col: str = "lang",
                                id_col: str = "doc_id") -> str:
    """DuckDB mirror: the encode oracle's per-doc token counts joined
    back to the words/chars projection, aggregated by language."""
    from kafka_connect_oss_spark.functions.rounding import round_sql

    enc = bpe_encode_oracle_sql(table_expr, merges, text_col, id_col)
    words = f"len(list_filter(string_split({text_col}, ' '), tt -> tt <> ''))"
    return f"""WITH enc AS ({enc}),
    base AS (SELECT {id_col}, {lang_col},
                    CAST({words} AS BIGINT) AS w,
                    CAST(length({text_col}) AS BIGINT) AS c
             FROM {table_expr})
    SELECT b.{lang_col}, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.w) AS BIGINT) AS total_words,
           CAST(SUM(b.c) AS BIGINT) AS total_chars,
           CAST(SUM(e.n_tokens) AS BIGINT) AS total_tokens,
           {round_sql("SUM(e.n_tokens) / CAST(nullif(SUM(b.w), 0)"
                      " AS DOUBLE)", 4)} AS fertility,
           {round_sql("SUM(b.c) / CAST(nullif(SUM(e.n_tokens), 0)"
                      " AS DOUBLE)", 4)} AS chars_per_token
    FROM base b JOIN enc e USING ({id_col})
    GROUP BY b.{lang_col}"""
