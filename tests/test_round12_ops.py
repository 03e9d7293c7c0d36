"""Round-12 operator tests.

Covers the VERDICT r11 task list: the ICWS production/eval split and
its plan shape, plus (elsewhere) the staged LRS pass and the rate
limiter ring (test_round11_ops.py / test_streaming_misc.py).
"""

from __future__ import annotations

from conftest import SF_DIR


# --------------------- ICWS production op vs its eval harness


def test_icws_prod_matches_eval_verified_set(spark):
    """The production op's pair list is exactly the eval harness's
    verified set: same candidates (hashed keys collide iff the digit
    strings are equal, up to 2^-64), same cap, same exact verify —
    so len(prod) == n_verified when the eval op runs with the same
    cap. The eval op is UNcapped, so prod's pairs must be a SUBSET of
    eval's verified pairs, and every prod wjaccard must clear the
    threshold."""
    from etl_energy_tracker_spark.queries.textops import (
        _WJ_THRESH,
        icws_weighted_lsh_pairs,
        icws_weighted_lsh_pairs_prod,
    )

    prod = icws_weighted_lsh_pairs_prod(spark, SF_DIR).collect()
    ev = icws_weighted_lsh_pairs(spark, SF_DIR).collect()[0]
    assert 0 < len(prod) <= ev.n_verified
    assert all(r.wjaccard >= float(_WJ_THRESH) for r in prod)
    assert all(r.doc_a < r.doc_b for r in prod)


def test_icws_prod_plan_has_no_all_pairs_stage(spark):
    """VERDICT r11 task 3's plan pin: the eval op's ground-truth side
    joins the df-capped tf relation to itself on the gram key alone
    (an all-pairs stage); the production plan must not contain any
    such join — every capped-tf join is driven by the candidate
    relation through a doc_id key, and the band self-join is keyed on
    the 8-byte xxhash64 bucket."""
    from etl_energy_tracker_spark.queries.textops import (
        icws_weighted_lsh_pairs_prod,
    )

    plan = icws_weighted_lsh_pairs_prod(
        spark, SF_DIR
    )._jdf.queryExecution().optimizedPlan().toString()
    # the hashed band key drives the candidate join
    assert "xxhash64" in plan
    # no cartesian anywhere
    assert "Cartesian" not in plan
    # the eval op's exact branch is a join whose condition pairs a
    # gram equality with a doc_id INEQUALITY and nothing else — the
    # all-pairs signature. (A g-only equality join against the
    # one-row-per-gram df-cap list is fine and present in both.)
    import re

    for cond in re.findall(r"Join Inner, \((.*)\)\n", plan):
        has_g_eq = re.search(r"g#\d+ = g#\d+", cond)
        has_doc_lt = re.search(r"doc_id#\d+L? < doc_id#\d+L?", cond)
        assert not (has_g_eq and has_doc_lt), cond
    # and the exact ground-truth op DOES carry that shape (the test's
    # own control). The eval harness consumes it behind a
    # localCheckpoint, which truncates lineage in ITS optimized plan,
    # so the control inspects the exact op directly.
    from etl_energy_tracker_spark.queries.textops import (
        weighted_jaccard_pairs,
    )

    eval_plan = weighted_jaccard_pairs(
        spark, SF_DIR
    )._jdf.queryExecution().optimizedPlan().toString()
    found = any(
        re.search(r"g#\d+ = g#\d+", c)
        and re.search(r"doc_id#\d+L? < doc_id#\d+L?", c)
        for c in re.findall(r"Join Inner, \((.*)\)\n", eval_plan)
    )
    assert found, "control: eval op should contain the all-pairs join"
