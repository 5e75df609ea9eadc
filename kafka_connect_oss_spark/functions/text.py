"""Text-analysis expressions (driver-mandated extension: SURVEY.md §2
"Driver-mandated extensions"; all built-in string/array functions —
JVM-side, no UDFs).

Each helper also exposes the DuckDB rendering where an oracle needs it;
ratios are exact rationals (int/int) rounded identically on both sides.
"""

from __future__ import annotations

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic; membership counting is dialect-neutral SQL
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
}

#: words treated as stopwords for the quality score (subset of the synthetic
#: vocabulary so the ratio is non-trivial on the documents table)
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

#: BPE-ish token pattern: lowercase runs, digit runs, or any single
#: non-space symbol — a public-regex stand-in for a real BPE pre-tokenizer
BPE_TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def sql_tokens(text_expr: str, dialect: str) -> str:
    """Whitespace tokens with empties removed."""
    if dialect == "spark":
        return f"filter(split({text_expr}, ' '), tt -> tt <> '')"
    return f"list_filter(string_split({text_expr}, ' '), tt -> tt <> '')"


def sql_in_list(item: str, values: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{v}'" for v in values)
    return f"{item} IN ({quoted})"


def sql_count_matching(tokens_expr: str, values: tuple[str, ...], dialect: str) -> str:
    fil = "filter" if dialect == "spark" else "list_filter"
    size = "size" if dialect == "spark" else "len"
    return f"{size}({fil}({tokens_expr}, w -> {sql_in_list('w', values)}))"


def sql_bpe_token_count(text_expr: str, dialect: str) -> str:
    if dialect == "spark":
        return f"size(regexp_extract_all({text_expr}, '{BPE_TOKEN_PATTERN}', 0))"
    return f"len(regexp_extract_all({text_expr}, '{BPE_TOKEN_PATTERN}'))"


def sql_quality_duckdb(tokens_expr: str) -> str:
    """DuckDB rendering of the quality_score composite (rounded 4) over a
    tokens expression — the single source for every oracle that embeds
    per-doc quality (curriculum order, quality-dup profile, domain
    profile), mirroring operators/text.quality_score exactly."""
    from kafka_connect_oss_spark.functions.rounding import round_sql

    n_tok = f"len({tokens_expr})"
    distinct_ratio = (f"(len(list_distinct({tokens_expr})) "
                      f"/ CAST(nullif({n_tok}, 0) AS DOUBLE))")
    stop_ratio = (f"({sql_count_matching(tokens_expr, QUALITY_STOPWORDS, 'duckdb')}"
                  f" / CAST(nullif({n_tok}, 0) AS DOUBLE))")
    return round_sql(
        f"(CASE WHEN {n_tok} BETWEEN 10 AND 1000 THEN CAST(0.4 AS DOUBLE) "
        f"ELSE CAST(0.0 AS DOUBLE) END) + CAST(0.3 AS DOUBLE) * "
        f"{distinct_ratio} + CAST(0.3 AS DOUBLE) * (CASE WHEN {stop_ratio} "
        f"> 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)", 4)
