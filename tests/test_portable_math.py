"""Cross-engine deterministic ln (functions/portable_math).

Engine ln() differs at the last ulp (JVM Math.log vs platform libm),
which flipped two micro-nat bins in psi_drift_report's first draft;
and ROUND(x, 6) itself disagrees on ties (Spark BigDecimal HALF_UP
vs DuckDB float rounding — 64 of 5000 random rationals in the r10
sweep). These tests pin the portable form: bit-identical ln values
AND identical micro-nat quantization across engines, within 1e-8 of
the true logarithm."""

from __future__ import annotations

import math
import random

import duckdb

from etl_energy_tracker_spark.functions.portable_math import (
    ln_micro_rational,
    ln_rational,
)


def test_ln_rational_cross_engine_bit_identical(spark):
    random.seed(101)
    pairs = [
        (random.randint(1, 10**9), random.randint(1, 10**9))
        for _ in range(1500)
    ]
    # adversarial corners: equal, off-by-one, power-of-two boundaries
    pairs += [
        (1, 1), (2, 1), (1, 2), (3, 2), (2**40, 2**40 - 1),
        (10**9, 1), (1, 10**9), (7, 5), (5, 7), (2**30 + 1, 2**30),
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in pairs)
        + ") v(a,b)"
    )
    drows = con.sql(
        f"SELECT a, b, {ln_rational('a', 'b', 'duckdb')},"
        f" {ln_micro_rational('a', 'b', 'duckdb')} FROM t"
    ).fetchall()
    sdf = spark.createDataFrame(pairs, "a long, b long")
    sdf.createOrReplaceTempView("pm_t")
    srows = spark.sql(
        f"SELECT a, b, {ln_rational('a', 'b', 'spark')} AS l,"
        f" {ln_micro_rational('a', 'b', 'spark')} AS lm FROM pm_t"
    ).collect()
    smap = {(r.a, r.b): (r.l, r.lm) for r in srows}
    mismatches = [
        (a, b) for a, b, dl, dlm in drows if smap[(a, b)] != (dl, dlm)
    ]
    assert not mismatches, mismatches[:5]
    # accuracy: within 1e-8 of the true ln (series truncation bound)
    maxerr = max(abs(dl - math.log(a / b)) for a, b, dl, _ in drows)
    assert maxerr < 1e-8
    # exactness anchor: ln(1/1) is exactly zero, ln(2/1) is ln2 to
    # the quantum
    exact = {(a, b): dl for a, b, dl, _ in drows}
    assert exact[(1, 1)] == 0.0
    assert abs(exact[(2, 1)] - math.log(2.0)) < 1e-12
