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
