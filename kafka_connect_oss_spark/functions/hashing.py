"""Cross-engine deterministic hashing (dedup/fingerprint core).

Engine-native hash functions differ between Spark (xxhash64/murmur3) and
DuckDB, so every hash the oracle must reproduce is built from two
primitives both engines share bit-for-bit:

* ``md5(string)`` -> 32 lowercase hex chars,
* 64-bit integer arithmetic.

``base_hash``: fold the first 15 hex chars of md5 (60 bits < 2^63) into a
BIGINT via acc*16 + hexval. ``minhash``/``simhash`` then use universal
hashing g_i(x) = (a_i * (x mod p) + b_i) mod p with p = 2^31 - 1 so all
products stay < 2^62 (no signed overflow in either engine).

Each helper emits BOTH dialects from the same constants — the Spark side
uses F.expr over the generated fragment, the oracle embeds the DuckDB
fragment — so parity is structural, not coincidental.

At 100 TB these are narrow per-row expressions inside whole-stage codegen:
no shuffle, no Python; cost is linear in scanned bytes.
"""

from __future__ import annotations

MERSENNE31 = 2_147_483_647  # 2^31 - 1, prime

#: (a_i, b_i) for the 8 minhash permutations — fixed, public, arbitrary odd
#: constants < p (seeded once; stability across runs is what matters)
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1_203_114_875, 613_845_907),
    (1_854_214_013, 153_211_577),
    (949_484_407, 1_290_575_411),
    (1_634_902_243, 402_271_517),
    (724_100_789, 1_952_577_221),
    (1_179_823_477, 868_048_391),
    (336_465_782, 1_481_293_315),
    (2_071_923_125, 727_939_199),
)

_HEX = "0123456789abcdef"


def hex_fold(md5_expr: str, dialect: str) -> str:
    """First 15 hex chars of an md5 string -> BIGINT (60 bits).

    Single built-in per engine (Spark conv(h,16,10), DuckDB '0x'||h cast) —
    an earlier per-character fold via nested higher-order lambdas was
    interpreted (not codegen'd) and dominated the LSH pipeline's runtime.
    Verified to produce identical values on both engines.
    """
    if dialect == "spark":
        return (f"CAST(conv(substring({md5_expr}, 1, 15), 16, 10) AS BIGINT)")
    if dialect == "duckdb":
        return f"CAST('0x' || substr({md5_expr}, 1, 15) AS BIGINT)"
    raise ValueError(dialect)


def base_hash(str_expr: str, dialect: str) -> str:
    """String -> deterministic 60-bit BIGINT, identical on both engines."""
    return hex_fold(f"md5({str_expr})", dialect)


def universal_hash(x_expr: str, a: int, b: int) -> str:
    """g(x) = (a*(x mod p) + b) mod p — dialect-neutral integer arithmetic."""
    p = MERSENNE31
    return f"(({a} * ({x_expr} % {p}) + {b}) % {p})"


def word_shingles(tokens_expr: str, n: int, dialect: str) -> str:
    """Word n-gram shingle array from a token array (empty if < n tokens)."""
    if dialect == "spark":
        joined = ", ".join(f"element_at({tokens_expr}, i + {k})" for k in range(n))
        return (f"CASE WHEN size({tokens_expr}) >= {n} THEN "
                f"transform(sequence(1, size({tokens_expr}) - {n - 1}), "
                f"i -> concat_ws(' ', {joined})) "
                f"ELSE CAST(array() AS ARRAY<STRING>) END")
    if dialect == "duckdb":
        joined = " || ' ' || ".join(f"{tokens_expr}[i + {k}]" for k in range(n))
        return (f"CASE WHEN len({tokens_expr}) >= {n} THEN "
                f"list_transform(range(1, len({tokens_expr}) - {n - 2}), "
                f"i -> {joined}) "
                f"ELSE [] END")
    raise ValueError(dialect)


def shingle_hashes(shingles_expr: str, dialect: str) -> str:
    """Array of shingles -> array of base hashes (distinct not applied).

    Two-step transform: materialize md5 digests first, then hex-fold —
    otherwise the md5 call sits inside the per-hex-char lambda and gets
    re-evaluated 15x per shingle (measured 4-5x slowdown on the LSH
    pipeline; codegen does not CSE across lambda scopes).
    """
    fn = "transform" if dialect == "spark" else "list_transform"
    md5s = f"{fn}({shingles_expr}, s -> md5(s))"
    return f"{fn}({md5s}, hx -> {hex_fold('hx', dialect)})"


def minhash_signature(hashes_expr: str, dialect: str) -> list[str]:
    """Array of shingle hashes -> the 8 minhash components (one expr each).

    Empty input -> component = p (sentinel max), so empty docs never
    collide with real signatures accidentally... they collide with each
    other, which exact-jaccard verification then rejects.
    """
    tf = "transform" if dialect == "spark" else "list_transform"
    amin = "array_min" if dialect == "spark" else "list_min"
    out = []
    for a, b in MINHASH_COEFFS:
        g = universal_hash("h", a, b)
        expr = f"{amin}({tf}({hashes_expr}, h -> {g}))"
        out.append(f"coalesce({expr}, {MERSENNE31})")
    return out


def minhash_signature_array(hashes_expr: str) -> str:
    """Array of shingle hashes -> ARRAY<BIGINT> of all 8 minhash components
    in ONE expression (Spark dialect; the oracle keeps per-component SQL).

    A single fold carrying an 8-slot accumulator: the hash array — and
    everything under it, the md5-shingle chain once projection collapse
    inlines it — is evaluated ONCE per row. Emitting m0..m7 as 8 separate
    expressions re-evaluated the whole chain 8-9x during the LSH signature
    materialization (measured 44s -> ~8s at 50k docs). Values are identical
    to minhash_signature's, component by component.
    """
    p = MERSENNE31
    a_arr = "array(" + ", ".join(str(a) + "L" for a, _ in MINHASH_COEFFS) + ")"
    b_arr = "array(" + ", ".join(str(b) + "L" for _, b in MINHASH_COEFFS) + ")"
    n = len(MINHASH_COEFFS)
    init = f"array_repeat(CAST({p} AS BIGINT), {n})"
    step = (f"(acc, h) -> zip_with(acc, sequence(0, {n - 1}), (cur, i) -> "
            f"least(cur, (element_at({a_arr}, CAST(i + 1 AS INT)) * (h % {p}) "
            f"+ element_at({b_arr}, CAST(i + 1 AS INT))) % {p}))")
    return f"aggregate({hashes_expr}, {init}, {step})"


def simhash(hashes_expr: str, dialect: str, bits: int = 16) -> str:
    """Array of shingle hashes -> `bits`-bit SimHash.

    bit_b(doc) = 1 iff sum over shingles of (+1 if bit b of hash else -1) > 0.
    """
    tf = "transform" if dialect == "spark" else "list_transform"
    if dialect == "spark":
        def bitsum(b: int) -> str:
            return (f"aggregate({tf}({hashes_expr}, h -> CASE WHEN (h div {1 << b}) % 2 = 1 "
                    f"THEN 1 ELSE -1 END), 0, (acc, x) -> acc + x)")
    else:
        def bitsum(b: int) -> str:
            return (f"list_sum({tf}({hashes_expr}, h -> CASE WHEN (h // {1 << b}) % 2 = 1 "
                    f"THEN 1 ELSE -1 END))")
    terms = [f"(CASE WHEN {bitsum(b)} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def rolling_hash(str_expr: str, dialect: str, mod: int = 1_000_000_007) -> str:
    """Polynomial rolling hash over codepoints: acc = (acc*31 + c) mod m.

    The classic document-fingerprint primitive; both dialects fold
    left-to-right so results are identical.
    """
    if dialect == "spark":
        return (f"aggregate(transform(sequence(1, length({str_expr})), "
                f"i -> CAST(ascii(substring({str_expr}, i, 1)) AS BIGINT)), "
                f"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {mod})")
    if dialect == "duckdb":
        return (f"coalesce(list_reduce(list_transform(range(1, length({str_expr}) + 1), "
                f"i -> CAST(unicode(substr({str_expr}, i, 1)) AS BIGINT)), "
                f"(acc, c) -> (acc * 31 + c) % {mod}), 0)")
    raise ValueError(dialect)
