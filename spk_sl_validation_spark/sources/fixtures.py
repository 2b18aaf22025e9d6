"""Reference-domain synthetic fixtures (FIXTURES.md, SURVEY.md §5.2.2).

Hand-crafted rows — one or more per cascade rule A0a…D10 plus the
validity-split cases — with the expected Comment/Analysis per row.
Deterministic by construction (no randomness), sized for golden tests;
the engine's scale behavior is exercised by the driver testdata
instead.

RUN_TS is the injected "now" (SURVEY.md §4.4.7): rows with
``Valid to`` = EXPIRED are before it, VALID after it.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from spk_sl_validation_spark import schemas

RUN_TS = datetime(2026, 1, 1)
EXPIRED = datetime(2020, 1, 1)
VALID = datetime(9999, 12, 31)
TS0 = datetime(2015, 6, 1)  # arbitrary 'Valid from'

# --- GAR_Plants: scope dimension -------------------------------------------
# (Plant, Sales Org, Vendor, Country, SPK SL Project, Status Cleansing Project)
GAR_PLANTS_ROWS = [
    ("1000", "3100", "3001000", "Germany", "Yes", "Yes"),
    ("1100", "3100", "3001100", "France", "Yes", "No"),
    ("2000", "3200", "3002000", "India", "No", "Yes"),
    ("3090", "3300", "3003090", "Belgium", "Yes", "No"),
    ("3401", "3405", "3003401", "China", "Yes", "Yes"),
    ("3402", "3405", "3003402", "China", "Yes", "Yes"),
    ("3901", "3900", "3003901", "Japan", "Yes", "No"),
    ("3902", "3900", "3003902", "Japan", "Yes", "No"),
]

# --- SPK_Xref: vendor → SPK lookup ------------------------------------------
SPK_XREF_ROWS = [
    ("9000340", "5S"),
    ("9000341", "77"),   # overwritten by rule A0b anyway
    ("1000001", "30"),   # overwritten by rule A0a ('1'-prefix → '20')
    ("2000002", "40"),
    ("2000005", "40"),
    ("2000006", "99"),
    ("2000007", "99"),
]

# --- MVKE_3090 / MG5_Xref: Apex dimensions ----------------------------------
MVKE_3090_ROWS = [
    ("M010", "300"),
    ("M011", "300"),
    ("M012", "301"),
    ("M014", "302"),  # 302 missing from MG5_Xref → rule B7
    ("M015", "301"),
]
MG5_XREF_ROWS = [
    ("300", "20"),
    ("301", "40"),
]

# --- MARC: (Material, Plant, status double, SPK, Valid from) -----------------
MARC_ROWS = [
    ("M001", "1000", 50.0, "40"),
    ("M005", "1000", 50.0, "40"),
    ("M006", "1000", 70.0, "40"),   # A2 (cancelled in plant)
    ("M026", "1000", 80.0, "40"),   # A2 over dual
    ("M007", "1000", 50.0, "5S"),   # B1
    ("M007", "3090", 50.0, "20"),
    ("M008", "1000", 50.0, "20"),   # B2
    ("M008", "3090", 50.0, "20"),
    # M009 has NO row at 1000 → null Plant SPK (tests pandas != null semantics, B2)
    ("M009", "3090", 50.0, "20"),
    ("M010", "1000", 50.0, "40"),   # B3
    ("M010", "3090", 70.0, "40"),   # cancelled in 3090
    ("M011", "1000", 50.0, "40"),   # B4
    ("M011", "3090", 50.0, "40"),
    ("M012", "1000", 50.0, "40"),   # B5 (MG5('301')='40' matches)
    ("M012", "3090", 50.0, "40"),
    ("M013", "1000", 50.0, "40"),   # B6 (no MVKE row)
    ("M013", "3090", 50.0, "40"),
    ("M014", "1000", 50.0, "40"),   # B7
    ("M014", "3090", 50.0, "40"),
    ("M015", "1000", 50.0, "20"),   # B8 (MG5 '40' ≠ '20')
    ("M015", "3090", 50.0, "40"),
    ("M016", "3401", 50.0, "E1"),   # C1
    ("M016", "3402", 50.0, "E1"),
    ("M017", "3401", 50.0, "E1"),   # C2 (no MARC at 3402)
    ("M018", "3901", 50.0, "E1"),   # C3
    ("M018", "3902", 50.0, "TW"),
    ("M019", "1000", 50.0, "40"),   # A5
    ("M020", "1000", 50.0, "TW"),   # A6
    ("M021", "1000", 50.0, "40"),   # A7
    ("M022", "1000", 50.0, "20"),   # A0a → A5
    ("M023", "1000", 50.0, "40"),   # missing-SL
    ("M024", "1000", 50.0, "40"),   # ROH type → excluded from missing-SL
    ("M025", "2000", 50.0, "40"),   # OOS plant → excluded from missing-SL
    # Status-cleansing cascade D cases:
    ("M030", "1000", 50.0, "40"),   # D1 (no MARA row)
    ("M031", "1000", 50.0, "40"),   # D2
    ("M032", "1000", 50.0, "40"),   # D3
    ("M033", "1000", 80.0, "40"),   # D4
    ("M034", "1000", 80.0, "40"),   # D5
    ("M035", "1000", 70.0, "40"),   # D6
    ("M036", "1000", 70.0, "40"),   # D7
    ("M037", "1000", 70.0, "40"),   # D8
    ("M038", "1000", 41.0, "40"),   # D9
    ("M039", "1000", 40.0, "40"),   # D10
    ("M040", "1000", None, "40"),   # F4: null status dropped by prefilter
]

# --- MARA: (Material, Type, X-plant status, X-distr status, Valid from) ------
_D_XPLANT = {
    "M031": "50", "M032": "80", "M033": "70", "M034": "70", "M035": "80",
    "M036": "50", "M037": "50", "M038": "50", "M039": "50",
}
MARA_ROWS = (
    [("M001", "FERT", "50"), ("M023", "FERT", "50"), ("M024", "ROH", "50"),
     ("M025", "FERT", "50")]
    + [(m, "VERP", x) for m, x in sorted(_D_XPLANT.items())]
    + [(m, "ROH", "50") for m in
       ["M005", "M006", "M007", "M008", "M009", "M010", "M011", "M012", "M013",
        "M014", "M015", "M016", "M017", "M018", "M019", "M020", "M021", "M022",
        "M026"]]
)

# --- MB52: (Material, Plant, Unrestricted, In Quality Insp., Blocked) --------
MB52_ROWS = [
    ("M032", "1000", 10.0, 1.0, 0.0),
    ("M032", "1000", 5.0, 0.0, 2.0),   # multi-row per key → tests A1 group-sum
    ("M033", "1000", 3.0, 0.0, 0.0),
    ("M037", "1000", 7.0, 2.0, 1.0),
    ("M032", "1100", 99.0, 0.0, 0.0),  # out-of-scope plant → filtered
    ("M099", "1000", 4.0, 0.0, 0.0),   # material absent from MARC → ignored
]

# --- EORD: (Material, Plant, Number, Vendor, Valid to, Blocked) --------------
EORD_ROWS = [
    ("M001", "1000", "1", "2000002", EXPIRED, None),   # invalid-expired
    ("M002", "1000", "1", "2000002", VALID, "X"),      # invalid-blocked
    ("M002", "1000", "2", "2000002", EXPIRED, "X"),    # both → dedup (D1)
    ("M003", "2000", "1", "2000002", VALID, None),     # oos-plant
    ("M004", "1000", "1", "9000341", VALID, None),     # A0b Swissco
    ("M005", "1000", "1", "2000002", VALID, None),     # A1 dual
    ("M005", "1000", "2", "2000005", VALID, None),     # A1 dual
    ("M006", "1000", "1", "2000002", VALID, None),     # A2
    ("M026", "1000", "1", "2000002", VALID, None),     # A2 beats dual
    ("M026", "1000", "2", "2000005", VALID, None),
    ("M007", "1000", "1", "9000340", VALID, None),     # → B1
    ("M007", "3090", "1", "1000010", VALID, None),
    ("M008", "1000", "1", "9000340", VALID, None),     # → B2
    ("M008", "3090", "1", "9000033", VALID, None),
    ("M009", "1000", "1", "9000340", VALID, None),     # → B2 via null Plant SPK
    ("M009", "3090", "1", "1000010", VALID, None),
    ("M010", "1000", "1", "9000340", VALID, None),     # → B3
    ("M011", "1000", "1", "9000340", VALID, None),     # → B4
    ("M012", "1000", "1", "9000340", VALID, None),     # → B5
    ("M012", "3090", "1", "2000002", VALID, None),
    ("M013", "1000", "1", "9000340", VALID, None),     # → B6
    ("M013", "3090", "1", "2000002", VALID, None),
    ("M014", "1000", "1", "9000340", VALID, None),     # → B7
    ("M014", "3090", "1", "2000002", VALID, None),
    ("M015", "1000", "1", "9000340", VALID, None),     # → B8
    ("M015", "3090", "1", "2000002", VALID, None),     # dual @3090 →
    ("M015", "3090", "2", "2000002", VALID, None),     #   J5 row multiplication
    ("M016", "3401", "1", "3003402", VALID, None),     # → C1
    ("M017", "3401", "1", "3003402", VALID, None),     # → C2
    ("M018", "3901", "1", "3003902", VALID, None),     # → C3
    ("M019", "1000", "1", "2000005", VALID, None),     # A5
    ("M020", "1000", "1", "2000006", VALID, None),     # A6
    ("M021", "1000", "1", "2000007", VALID, None),     # A7
    ("M022", "1000", "1", "1000022", VALID, None),     # A0a → A5
]


def build_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """Materialize the fixture tables as Spark DataFrames with the
    declared reference schemas."""
    eord = [(m, p, n, v, vt, b) for (m, p, n, v, vt, b) in EORD_ROWS]
    marc = [(m, p, s, k, TS0) for (m, p, s, k) in MARC_ROWS]
    mara = [(m, t, x, "50", TS0) for (m, t, x) in MARA_ROWS]
    return {
        "EORD": spark.createDataFrame(eord, schemas.EORD),
        "MARC": spark.createDataFrame(marc, schemas.MARC),
        "MARA": spark.createDataFrame(mara, schemas.MARA),
        "MVKE_3090": spark.createDataFrame(MVKE_3090_ROWS, schemas.MVKE_3090),
        "MG5_Xref": spark.createDataFrame(MG5_XREF_ROWS, schemas.MG5_XREF),
        "SPK_Xref": spark.createDataFrame(SPK_XREF_ROWS, schemas.SPK_XREF),
        "GAR_Plants": spark.createDataFrame(GAR_PLANTS_ROWS, schemas.GAR_PLANTS),
        "MB52": spark.createDataFrame(MB52_ROWS, schemas.MB52),
    }


# ---------------------------------------------------------------------------
# Expected outcomes (golden). Keys are Material/Plant/Number.
# ---------------------------------------------------------------------------

from spk_sl_validation_spark.plans import rule_strings as RS  # noqa: E402

EXPECTED_MAIN_COMMENT = {
    "M004/1000/1": RS.A0B_SWISSCO,
    "M005/1000/1": RS.A1_DUAL,
    "M005/1000/2": RS.A1_DUAL,
    "M006/1000/1": RS.A2_CANCELLED,
    "M026/1000/1": RS.A2_CANCELLED,
    "M026/1000/2": RS.A2_CANCELLED,
    "M007/1000/1": RS.A3_APEX_SENTINEL,
    "M007/3090/1": RS.A5_MATCH,
    "M008/1000/1": RS.A3_APEX_SENTINEL,
    "M008/3090/1": RS.A7_MISMATCH,
    "M009/1000/1": RS.A3_APEX_SENTINEL,
    "M009/3090/1": RS.A5_MATCH,
    "M010/1000/1": RS.A3_APEX_SENTINEL,
    "M011/1000/1": RS.A3_APEX_SENTINEL,
    "M012/1000/1": RS.A3_APEX_SENTINEL,
    "M012/3090/1": RS.A5_MATCH,
    "M013/1000/1": RS.A3_APEX_SENTINEL,
    "M013/3090/1": RS.A5_MATCH,
    "M014/1000/1": RS.A3_APEX_SENTINEL,
    "M014/3090/1": RS.A5_MATCH,
    "M015/1000/1": RS.A3_APEX_SENTINEL,
    "M015/3090/1": RS.A1_DUAL,
    "M015/3090/2": RS.A1_DUAL,
    "M016/3401/1": RS.A4_INTRA_SENTINEL,
    "M017/3401/1": RS.A4_INTRA_SENTINEL,
    "M018/3901/1": RS.A4_INTRA_SENTINEL,
    "M019/1000/1": RS.A5_MATCH,
    "M020/1000/1": RS.A6_TW,
    "M021/1000/1": RS.A7_MISMATCH,
    "M022/1000/1": RS.A5_MATCH,
}

EXPECTED_ANALYSIS_OVERRIDES = {
    "M007/1000/1": RS.B1,
    "M008/1000/1": RS.B2,
    "M009/1000/1": RS.B2,  # null Plant SPK: pandas `!=` semantics (§4.4.1)
    "M010/1000/1": RS.B3,
    "M011/1000/1": RS.B4,
    "M012/1000/1": RS.B5,
    "M013/1000/1": RS.B6,
    "M014/1000/1": RS.B7,
    "M015/1000/1": RS.B8,
    "M016/3401/1": RS.C1,
    "M017/3401/1": RS.C2,
    "M018/3901/1": RS.C3,
}

EXPECTED_APEX_COMMENT = {
    "M007/1000/1": RS.B1,
    "M008/1000/1": RS.B2,
    "M009/1000/1": RS.B2,
    "M010/1000/1": RS.B3,
    "M011/1000/1": RS.B4,
    "M012/1000/1": RS.B5,
    "M013/1000/1": RS.B6,
    "M014/1000/1": RS.B7,
    "M015/1000/1": RS.B8,  # appears twice (J5 multiplication)
}

EXPECTED_INTRA_COMMENT = {
    "M016/3401/1": RS.C1,
    "M017/3401/1": RS.C2,
    "M018/3901/1": RS.C3,
}

EXPECTED_MISSING_SL = {"M001/1000", "M023/1000"}

EXPECTED_SC_COMMENT = {
    "M030/1000": RS.D1,
    "M031/1000": RS.D2,
    "M032/1000": RS.D3,
    "M033/1000": RS.D4,
    "M034/1000": RS.D5,
    "M035/1000": RS.D6,
    "M036/1000": RS.D7,
    "M037/1000": RS.D8,
    "M038/1000": RS.D9,
    "M039/1000": RS.D10,
}

EXPECTED_SC_INVENTORY = {"M032/1000": 18, "M033/1000": 3, "M037/1000": 10}

# V1 deltas (SURVEY.md §3.2): A2 condition is `isna | =='70.0'`; short
# sentinels; B3/B6 absent; no backfill → main Comment stays sentinel.
EXPECTED_MAIN_COMMENT_V1 = dict(EXPECTED_MAIN_COMMENT)
EXPECTED_MAIN_COMMENT_V1.update(
    {
        "M004/1000/1": RS.A2_CANCELLED,     # no MARC row → V1 isna arm beats A0b
        "M006/1000/1": RS.A2_CANCELLED,     # 70.0 → '70.0' matches V1 literal
        "M026/1000/1": RS.A1_DUAL,          # V1 A2 doesn't test '80'
        "M026/1000/2": RS.A1_DUAL,
        "M009/1000/1": RS.A2_CANCELLED,     # null Plant Status → V1 isna arm
        **{k: RS.A3_APEX_SENTINEL_V1 for k, v in EXPECTED_MAIN_COMMENT.items()
           if v == RS.A3_APEX_SENTINEL and k != "M009/1000/1"},
        **{k: RS.A4_INTRA_SENTINEL_V1 for k, v in EXPECTED_MAIN_COMMENT.items()
           if v == RS.A4_INTRA_SENTINEL},
    }
)

EXPECTED_APEX_COMMENT_V1 = {
    "M007/1000/1": RS.B1,
    "M008/1000/1": RS.B2,
    # M009 blocked by V1-A2 before the Apex sentinel → not in Apex sheet
    "M010/1000/1": RS.B4,      # B3 absent in V1 → falls to B4
    "M011/1000/1": RS.B4,
    "M012/1000/1": RS.B5,
    "M013/1000/1": RS.B7,      # B6 absent in V1 → falls to B7
    "M014/1000/1": RS.B7,
    "M015/1000/1": RS.B8_V1,
}
