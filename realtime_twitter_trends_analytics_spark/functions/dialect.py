"""Dual-dialect SQL fragment builders (Spark SQL + DuckDB).

The driver's correctness gate compares every Spark query against an ANSI-SQL
oracle executed by DuckDB (value-hash equality). For operators whose semantics
are *defined by arithmetic on hashes and arrays* (MinHash, SimHash, LSH,
lexicon sentiment), hand-writing two independent implementations invites
drift. Instead, each such operator is generated from ONE template via these
primitives; the Spark side is used through ``F.expr(...)`` so both engines
evaluate literally the same construction.

Only functions with bit-identical cross-engine behavior are exposed:
``md5`` (hex lowercase), integer arithmetic, array transform/slice/sum with
sequential left-to-right folds.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def split_ws(d: str, col: str) -> str:
    """Split a string on single spaces into an array of tokens."""
    return f"split({col}, ' ')" if d == SPARK else f"string_split({col}, ' ')"


def arr_size(d: str, arr: str) -> str:
    return f"size({arr})" if d == SPARK else f"len({arr})"


def arr_slice(d: str, arr: str, start_1based: str, length: str) -> str:
    """Slice ``length`` elements starting at 1-based ``start``."""
    if d == SPARK:
        return f"slice({arr}, {start_1based}, {length})"
    return f"list_slice({arr}, {start_1based}, ({start_1based}) + ({length}) - 1)"


def seq(d: str, lo: str, hi: str) -> str:
    """Inclusive integer sequence [lo..hi]; empty when hi < lo."""
    if d == SPARK:
        # Spark sequence(a,b) with b<a counts DOWN; guard to yield empty.
        return (
            f"(CASE WHEN ({hi}) >= ({lo}) THEN sequence({lo}, {hi}) "
            f"ELSE CAST(array() AS ARRAY<INT>) END)"
        )
    return (
        f"(CASE WHEN ({hi}) >= ({lo}) THEN generate_series({lo}, {hi}) "
        f"ELSE CAST([] AS BIGINT[]) END)"
    )


def transform(d: str, arr: str, var: str, body: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def arr_filter(d: str, arr: str, var: str, body: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def arr_sum_bigint(d: str, arr: str) -> str:
    """Sum an integer array -> BIGINT; empty array sums to 0."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))"
    return f"CAST(coalesce(list_sum({arr}), 0) AS BIGINT)"


def arr_sum_double(d: str, arr: str) -> str:
    """Sum a double array left-to-right -> DOUBLE; empty array sums to 0."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    return f"CAST(coalesce(list_sum({arr}), 0.0) AS DOUBLE)"


def arr_distinct(d: str, arr: str) -> str:
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def arr_sort(d: str, arr: str) -> str:
    return f"array_sort({arr})" if d == SPARK else f"list_sort({arr})"


def arr_join(d: str, arr: str, sep: str) -> str:
    fn = "array_join" if d == SPARK else "array_to_string"
    return f"{fn}({arr}, '{sep}')"


def arr_contains(d: str, arr: str, value: str) -> str:
    fn = "array_contains" if d == SPARK else "list_contains"
    return f"{fn}({arr}, {value})"


def arr_element(d: str, arr: str, idx_1based: str) -> str:
    if d == SPARK:
        return f"element_at({arr}, {idx_1based})"
    return f"list_extract({arr}, {idx_1based})"


def unnest(d: str, arr: str) -> str:
    """Array-to-rows in a SELECT list (Spark explode / DuckDB unnest)."""
    return f"explode({arr})" if d == SPARK else f"unnest({arr})"


def hex_nibble(d: str, hexchar: str) -> str:
    """Value 0..15 of one lowercase hex character (portable strpos trick)."""
    fn = "instr" if d == SPARK else "strpos"
    return f"({fn}('0123456789abcdef', {hexchar}) - 1)"


def md5_prefix_nibble(d: str, s: str) -> str:
    """First hex nibble (0..15) of md5(s) — a portable 4-bit hash."""
    return hex_nibble(d, f"substr(md5({s}), 1, 1)")


def hex_prefix_uint(d: str, hexcol: str, nchars: int) -> str:
    """First ``nchars`` hex chars of an (already computed) lowercase hex
    column as a BIGINT in [0, 16^nchars) — a portable uniform hash. Takes
    the hex COLUMN, not the plaintext, so md5 is evaluated once, not
    nchars times. nchars <= 15 keeps the fold inside BIGINT."""
    assert 1 <= nchars <= 15
    nib = hex_nibble(d, f"substr({hexcol}, i, 1)")
    if d == SPARK:
        return (
            f"aggregate(sequence(1, {nchars}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc * 16 + CAST({nib} AS BIGINT))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, {nchars}), i -> CAST({nib} AS BIGINT))), "
        f"(acc, i2) -> acc * 16 + i2)"
    )


def hex_prefix_u60(d: str, hexcol: str) -> str:
    """First 15 hex chars of an (already computed) lowercase hex column as a
    BIGINT in [0, 2^60) — a portable 60-bit uniform hash."""
    return hex_prefix_uint(d, hexcol, 15)


def int_div(d: str, a: str, b: str) -> str:
    return f"({a} DIV {b})" if d == SPARK else f"({a} // {b})"


def round_ratio(d: str, num: str, den: str, digits: int = 4) -> str:
    """round(num/den, digits) for NON-NEGATIVE INTEGER num/den, computed
    entirely in BIGINT: half-up integer division of (2*num*10^digits + den)
    by (2*den), then one exact division by 10^digits.

    Why: an exact rational can land exactly on a .xxx5 rounding tie, where
    Spark's round (BigDecimal over the binary double) and DuckDB's round
    disagree by 1 ulp of the last kept digit (observed live:
    textstats_quality at sf0.1, 0.65875 -> 0.6588 vs 0.6587). Integer
    arithmetic has no representation error, so both engines round the tie
    identically. Operands must be integer-typed expressions; num*10^digits
    must fit BIGINT."""
    scale = 10**digits
    q = int_div(d, f"(2 * CAST({num} AS BIGINT) * {scale} + CAST({den} AS BIGINT))", f"(2 * CAST({den} AS BIGINT))")
    return f"(CAST({q} AS DOUBLE) / {scale}.0)"
