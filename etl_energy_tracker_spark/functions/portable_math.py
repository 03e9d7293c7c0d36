"""Cross-engine deterministic math expressions.

``ln`` differs between engines at the last ulp (Spark evaluates
through JVM ``Math.log``, DuckDB through the platform libm), so any
idiom that rounds ``ln(x)`` to fixed decimals — the catalog's
micro-nat trick — can flip when the true value sits within an ulp of
a rounding boundary. psi_drift_report hit exactly that (two bins off
by one micro-nat at sf0.01, r10). The ops frozen before r10 keep the
libm idiom (their values were checked green); new ln-consuming ops
should use this portable form instead.

``ln_rational``: ln(num/den) for positive BIGINT num, den as a pure
arithmetic expression — identical TEXT up to the integer bit-length
primitive, and identical IEEE evaluation everywhere:

- range reduction by integer BIT LENGTH (no libm): k = bitlen(num) -
  bitlen(den) puts m = num / (den * 2^k) in (0.5, 2); the 2^k factor
  multiplies the smaller-side INTEGER (shiftleft — exact), so m is
  one exact-integer division.
- ln(m) = 2 * atanh(z), z = (m-1)/(m+1), |z| <= 1/3, via the odd
  series through z^15 (truncation < 1.3e-9 — three orders below the
  1e-6 quantum the micro-nat idiom rounds to).
- ln(num/den) = k * ln2 + ln(m), ln2 a literal.

Everything is +, *, / on doubles with every literal explicitly
DOUBLE-cast (bare float literals are DECIMAL in Spark — 1.0/3.0
truncates at decimal scale), so both engines produce bit-identical
ln values; the micro-nat quantization is floor(x*1e6 + 0.5) in the
same arithmetic (ROUND(x, 6) itself is engine-divergent on ties).
"""

from __future__ import annotations

_LN2 = "0.6931471805599453"


def _d(x: str, engine: str) -> str:
    # Spark parses bare float literals as DECIMAL (1.0/3.0 truncates
    # at decimal scale — the 8.5e-9 drift the first draft showed);
    # force DOUBLE literals on both engines.
    return f"CAST({x} AS DOUBLE)"


def _bitlen(x: str, engine: str) -> str:
    # positive integers only: bit length via binary-string length —
    # exact integer path, no floating log2 anywhere
    if engine == "spark":
        return f"LENGTH(BIN({x}))"
    return f"LENGTH(FORMAT('{{:b}}', {x}))"


def ln_rational(num: str, den: str, engine: str) -> str:
    """ln(num/den) for positive integer expressions, deterministic
    across engines. ``engine`` is 'spark' or 'duckdb'."""
    k = f"(CAST({_bitlen(num, engine)} AS BIGINT) - CAST({_bitlen(den, engine)} AS BIGINT))"
    # m = num / (den * 2^k): scale the INTEGER on the smaller side so
    # the division has exact integer operands. shiftleft(1, n) needs
    # n >= 0 on both engines, so branch on k's sign.
    if engine == "spark":
        num_s = f"(CASE WHEN {k} < 0 THEN CAST({num} AS BIGINT) * shiftleft(CAST(1 AS BIGINT), CAST(-{k} AS INT)) ELSE CAST({num} AS BIGINT) END)"
        den_s = f"(CASE WHEN {k} < 0 THEN CAST({den} AS BIGINT) ELSE CAST({den} AS BIGINT) * shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT)) END)"
    else:
        num_s = f"(CASE WHEN {k} < 0 THEN CAST({num} AS BIGINT) * (CAST(1 AS BIGINT) << CAST(-{k} AS INT)) ELSE CAST({num} AS BIGINT) END)"
        den_s = f"(CASE WHEN {k} < 0 THEN CAST({den} AS BIGINT) ELSE CAST({den} AS BIGINT) * (CAST(1 AS BIGINT) << CAST({k} AS INT)) END)"
    one = _d("1", engine)
    m = f"(CAST({num_s} AS DOUBLE) / CAST({den_s} AS DOUBLE))"
    z = f"(({m} - {one}) / ({m} + {one}))"
    z2 = f"({z} * {z})"
    # atanh series, Horner in z^2 through z^15: identical DOUBLE
    # coefficients and association on both engines (every coefficient
    # is an explicit double-cast division — bare float literals are
    # DECIMAL in Spark and would truncate the series)
    def c(n: int) -> str:
        return f"({one} / {_d(str(n), engine)})"

    horner = (
        f"({one} + {z2} * ({c(3)} + {z2} * ({c(5)} + {z2} * "
        f"({c(7)} + {z2} * ({c(9)} + {z2} * ({c(11)} + "
        f"{z2} * ({c(13)} + {z2} * {c(15)})))))))"
    )
    ln2 = f"CAST({_LN2} AS DOUBLE)"
    two = _d("2", engine)
    return f"(CAST({k} AS DOUBLE) * {ln2} + {two} * {z} * {horner})"


def ln_micro_rational(num: str, den: str, engine: str) -> str:
    """Integer micro-nats of ln(num/den) — the micro-nat idiom on the
    portable ln. Quantization is FLOOR(x * 1e6 + 0.5): pure double
    multiply/add/floor, identical on both engines. (ROUND(x, 6) is
    NOT portable even on identical doubles — Spark rounds through
    BigDecimal HALF_UP, DuckDB through float nearbyint, and 64 of
    5000 random rationals landed on disagreeing ties in the r10
    validation sweep.)"""
    ln = ln_rational(num, den, engine)
    return (
        f"CAST(FLOOR({ln} * CAST(1000000 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
