"""Engine-portable deterministic hashing expressions.

Spark's ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
functions, so any operator whose *output* contains hash values (doc
fingerprints, minhash signatures, simhash bits) needs a hash both
engines can compute identically. We use a polynomial fold over
code points:

    h(s) = fold(c in s) acc -> (acc*31 + codepoint(c)) mod 1_000_000_007

expressed with ``aggregate``/``transform`` on the Spark side and
``list_reduce``/``list_transform`` on the DuckDB side — pure
column expressions, JVM-evaluated, no Python UDFs.

Scale note: higher-order functions evaluate outside whole-stage
codegen but stay on the JVM executor; for 100 TB-scale fingerprinting
the same fold is also available over tokens instead of chars (cheaper)
and the operator is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

MOD = 1_000_000_007


def spark_charhash(expr: str, seed: int = 7) -> str:
    """Spark SQL string: polynomial hash of the string expression.

    Splits to a codepoint array once, then folds — O(n), vs the naive
    per-position substr fold which is O(n²) on long strings (substr on
    UTF-8 walks from the start every call). Verified byte-identical to
    the DuckDB rendering including non-ASCII codepoints."""
    # filter out the '' element Spark's split produces for empty input,
    # so hash('') == seed on every engine (found by hypothesis).
    return (
        f"aggregate(transform(filter(split({expr}, ''), c -> c <> ''), "
        f"c -> ascii(c)), "
        f"CAST({seed} AS BIGINT), (acc, x) -> (acc*31 + x) % {MOD})"
    )


def duckdb_charhash(expr: str, seed: int = 7) -> str:
    """DuckDB SQL string computing the identical polynomial hash."""
    return (
        f"list_reduce(list_prepend(CAST({seed} AS BIGINT), "
        f"list_transform(list_filter(string_split({expr}, ''), c -> c <> ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc*31 + x) % {MOD})"
    )


# minhash permutation family: hash_i(x) = (a_i*h(x) + b_i) mod MOD with
# fixed odd multipliers — identical constants on both engines.
def perm_a(i: int) -> int:
    return 2 * i + 1


def perm_b(i: int) -> int:
    return (i + 1) * 7919
