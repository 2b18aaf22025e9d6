"""Reference-domain tables derived from the driver's parquet testdata,
plus full-pipeline DuckDB oracles for the SPK/SL and status-cleansing
pipelines.

Round-1 verdict: the three full reference pipelines were the repo's
only rows-only checks, because their fixture inputs (createDataFrame)
were invisible to the DuckDB side. This module closes that gap:

- Each reference table (EORD/MARC/GAR/...) is derived from the parquet
  tables (orders/part/lineitem) by ONE SQL text in the ANSI dialect
  both engines parse. The Spark builder runs it with ``spark.sql`` over
  temp views; the oracle embeds the same text as DuckDB CTEs — the two
  sides read identical inputs by construction.
- The oracles then replay the complete dataflow of
  ``plans/spk_sl_cleansing.run`` / ``plans/status_cleansing.run``
  (validity split, broadcast joins, dual-source window, Apex/IntraCo
  branches, backfill) in DuckDB SQL, with every cascade flattened by
  ``operators.rules.compile_to_sql`` — including the SENTINEL-guarded
  Apex cascade B, which the round-1 compiler refused.

The derivations use modular arithmetic on the TPC-H keys so that every
cascade rule (A0a..B8, C1..C3, D1..D10) fires on real rows at sf0.001
and above; fixture golden tests (tests/test_pipelines.py) continue to
pin the per-rule row-level semantics against the reference
(SL_SPK_Cleansing.py:63-346, Status_Cleansing.py:23-179).
"""

from __future__ import annotations

from spk_sl_validation_spark.operators.rules import Guard, Rule, compile_to_sql
from spk_sl_validation_spark.plans import rule_strings as RS

# The injected "now" for the validity split (run_ts — SURVEY.md §4.4.7).
RUN_TS_SQL = "TIMESTAMP '1997-06-01 00:00:00'"

_PLANT_VALUES = "(1000),(1001),(1002),(1003),(1004),(3090),(3401),(3402),(3403),(3404)"

# ---------------------------------------------------------------------------
# Table derivations — ONE SQL text per table, run verbatim on both engines.
# Columns are snake_case here (identifier quoting differs between the two
# dialects); the Spark builder renames to the SAP extract headers.
# ---------------------------------------------------------------------------

# The 3090 (Apex-hub) rows are gated to a FIXED material class
# (mat % 3 = 0) with a vendor that is a deterministic function of the
# material — so at ANY scale factor a stable share of Apex-routed
# materials has no 3090 source (B3/B4 paths), an ECC one (B1/B2), the
# Apex vendor itself, or a non-ECC one, instead of every material
# accumulating 3090 rows of every class as orders grow.
EORD_SQL = """
SELECT
  'M' || CAST(o_custkey % 400 AS STRING) AS material,
  CAST(CASE WHEN o_orderkey % 11 = 0 AND (o_custkey % 400) % 3 = 0 THEN 3090
            WHEN o_orderkey % 7 < 2 THEN 3401 + (o_orderkey % 4)
            ELSE 1000 + (o_orderkey % 5) END AS STRING) AS plant,
  CAST(1 + (o_orderkey % 3) AS STRING) AS number,
  CASE WHEN o_orderkey % 11 = 0 AND (o_custkey % 400) % 3 = 0 THEN
         CASE (o_custkey % 400) % 5
              WHEN 0 THEN '1' || CAST(100000 + (o_custkey % 400) AS STRING)
              WHEN 1 THEN '9000033'
              WHEN 2 THEN '9000340'
              ELSE '200000' || CAST(o_custkey % 4 AS STRING) END
       WHEN o_orderkey % 13 IN (0, 6) THEN '9000340'
       WHEN o_orderkey % 13 = 1 THEN '9000341'
       WHEN o_orderkey % 13 = 2 THEN '1' || CAST(100000 + (o_custkey % 50) AS STRING)
       WHEN o_orderkey % 13 = 3 THEN '9000033'
       WHEN o_orderkey % 13 IN (4, 5) THEN '300' || CAST(3401 + (o_custkey % 4) AS STRING)
       ELSE '200000' || CAST(o_orderkey % 4 AS STRING) END AS vendor,
  CASE WHEN o_orderkey % 19 = 0 THEN TIMESTAMP '1993-01-01 00:00:00'
       ELSE TIMESTAMP '9999-12-31 00:00:00' END AS valid_to,
  CASE WHEN o_orderkey % 23 = 0 THEN 'X' ELSE NULL END AS blocked
FROM orders
"""

MARC_SQL = f"""
WITH mats AS (SELECT DISTINCT p_partkey % 400 AS mat FROM part),
plants AS (SELECT CAST(pl AS STRING) AS plant, pl FROM (VALUES {_PLANT_VALUES}) AS t(pl))
SELECT 'M' || CAST(m.mat AS STRING) AS material,
       p.plant AS plant,
       CAST(CASE (m.mat * 7 + p.pl) % 11
            WHEN 0 THEN 70 WHEN 1 THEN 80 WHEN 2 THEN 41 WHEN 3 THEN 40
            WHEN 4 THEN NULL ELSE 50 END AS DOUBLE) AS status,
       CASE (m.mat * 5 + p.pl) % 7
            WHEN 0 THEN '5S' WHEN 1 THEN 'TW' WHEN 2 THEN '20' WHEN 3 THEN '5S'
            WHEN 4 THEN '40' WHEN 5 THEN '99' ELSE '20' END AS spk,
       TIMESTAMP '2015-06-01 00:00:00' AS valid_from
FROM mats m CROSS JOIN plants p
WHERE (m.mat + p.pl) % 5 <> 4
"""

MARA_SQL = """
WITH mats AS (SELECT DISTINCT p_partkey % 400 AS mat FROM part)
SELECT 'M' || CAST(mat AS STRING) AS material,
       CASE mat % 5 WHEN 0 THEN 'FERT' WHEN 1 THEN 'HAWA' WHEN 2 THEN 'ZICP'
            WHEN 3 THEN 'ROH' ELSE 'VERP' END AS material_type,
       CAST(CASE mat % 6 WHEN 0 THEN 80 WHEN 1 THEN 70 WHEN 2 THEN 50
            WHEN 3 THEN 41 WHEN 4 THEN 40 ELSE 50 END AS STRING) AS xplant_status,
       '50' AS xdistr_status,
       TIMESTAMP '2015-06-01 00:00:00' AS valid_from
FROM mats WHERE mat % 17 <> 0
"""

GAR_SQL = f"""
SELECT CAST(pl AS STRING) AS plant,
       CASE WHEN pl IN (3401, 3402) THEN '3405'
            WHEN pl IN (3403, 3404) THEN '3900' ELSE '3100' END AS sales_org,
       '300' || CAST(pl AS STRING) AS vendor,
       'C' || CAST(pl % 3 AS STRING) AS country,
       CASE WHEN pl = 1004 THEN 'No' ELSE 'Yes' END AS spk_sl_project,
       CASE WHEN pl IN (1000, 1001, 3401, 3402, 3403, 3404) THEN 'Yes' ELSE 'No' END
         AS status_cleansing_project
FROM (VALUES {_PLANT_VALUES}) AS t(pl)
"""

# Vendor xref derives from the EORD vendor universe (some vendors left
# unmapped so null "Vendor to SPK" paths are exercised).
SPK_XREF_SQL = f"""
WITH eord AS ({EORD_SQL})
SELECT vendor,
       CASE CAST(right(vendor, 1) AS INT) % 4
            WHEN 0 THEN '5S' WHEN 1 THEN '20' WHEN 2 THEN '40' ELSE 'TW' END AS vendor_to_spk
FROM (SELECT DISTINCT vendor FROM eord)
WHERE CAST(right(vendor, 1) AS INT) % 5 <> 4
"""

MVKE_SQL = """
WITH mats AS (SELECT DISTINCT p_partkey % 400 AS mat FROM part)
SELECT 'M' || CAST(mat AS STRING) AS material,
       CASE mat % 4 WHEN 0 THEN '300' WHEN 1 THEN '301' WHEN 2 THEN '302'
            ELSE '301' END AS default_plant
FROM mats WHERE mat % 6 <> 5
"""

MG5_SQL = """
SELECT default_plant, apex_spk AS apex_mg5_to_vendor_spk
FROM (VALUES ('300', '20'), ('301', '20')) AS t(default_plant, apex_spk)
"""

MB52_SQL = """
SELECT 'M' || CAST(l_partkey % 400 AS STRING) AS material,
       CAST(1000 + (l_orderkey % 5) AS STRING) AS plant,
       CAST(l_quantity AS DOUBLE) AS unrestricted,
       CAST(l_linenumber AS DOUBLE) AS in_quality_insp,
       CAST(l_suppkey % 3 AS DOUBLE) AS blocked
FROM lineitem
WHERE l_orderkey % 4 = 0
"""

TABLE_SQL: dict[str, str] = {
    "EORD": EORD_SQL,
    "MARC": MARC_SQL,
    "MARA": MARA_SQL,
    "GAR_Plants": GAR_SQL,
    "SPK_Xref": SPK_XREF_SQL,
    "MVKE_3090": MVKE_SQL,
    "MG5_Xref": MG5_SQL,
    "MB52": MB52_SQL,
}

# snake_case → SAP extract header (schemas.py REFERENCE_SCHEMAS)
REF_COLUMNS: dict[str, dict[str, str]] = {
    "EORD": {
        "material": "Material", "plant": "Plant", "number": "Number",
        "vendor": "Vendor", "valid_to": "Valid to", "blocked": "Blocked",
    },
    "MARC": {
        "material": "Material", "plant": "Plant", "status": "Plant-sp.matl status",
        "spk": "SpecProcurem Costing", "valid_from": "Valid from",
    },
    "MARA": {
        "material": "Material", "material_type": "Material Type",
        "xplant_status": "X-plant matl status", "xdistr_status": "X-distr.chain status",
        "valid_from": "Valid from",
    },
    "GAR_Plants": {
        "plant": "Plant", "sales_org": "Sales Org", "vendor": "Vendor",
        "country": "Country", "spk_sl_project": "SPK SL Project",
        "status_cleansing_project": "Status Cleansing Project",
    },
    "SPK_Xref": {"vendor": "Vendor", "vendor_to_spk": "Vendor to SPK"},
    "MVKE_3090": {"material": "Material", "default_plant": "Default Plant"},
    "MG5_Xref": {"default_plant": "Default Plant", "apex_mg5_to_vendor_spk": "Apex MG5 to Vendor SPK"},
    "MB52": {
        "material": "Material", "plant": "Plant", "unrestricted": "Unrestricted",
        "in_quality_insp": "In Quality Insp.", "blocked": "Blocked",
    },
}


def build_ref_tables(spark, sf_dir: str) -> dict:
    """Spark side: materialize the derived reference tables (lazily) by
    running the shared SQL over temp views of the parquet tables, then
    renaming to the SAP headers the pipeline code expects."""
    from spk_sl_validation_spark.sources.readers import load_table

    for t in ("orders", "part", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    tables = {}
    for name, sql in TABLE_SQL.items():
        df = spark.sql(sql)
        for snake, ref in REF_COLUMNS[name].items():
            df = df.withColumnRenamed(snake, ref)
        tables[name] = df
    return tables


# ---------------------------------------------------------------------------
# Full-pipeline oracles
# ---------------------------------------------------------------------------


def _r(rule_id: str, sql: str, message: str, guard: Guard, sentinel: str | None = None) -> Rule:
    """Oracle-side rule: condition only as SQL (the Spark Columns live in
    plans/spk_sl_cleansing.py; equivalence is pinned by the driver's
    value-hash compare plus the fixture golden tests)."""
    return Rule(rule_id, None, message, guard, sentinel=sentinel, condition_sql=sql)


def spk_sl_oracle(variant: str = "CL") -> str:
    """DuckDB replay of plans/spk_sl_cleansing.run()'s main sheet
    ('Valid SL with SPK'), CL or V1 variant."""
    v1 = variant == "V1"
    apex_sent = RS.A3_APEX_SENTINEL_V1 if v1 else RS.A3_APEX_SENTINEL
    intra_sent = RS.A4_INTRA_SENTINEL_V1 if v1 else RS.A4_INTRA_SENTINEL

    # status normalization: CL drops null statuses and runs the
    # double→long→string chain ('70.0'→'70'); V1 stringifies the raw
    # double and keeps nulls (SURVEY.md §4.4.2/.3)
    if v1:
        marc_norm = "SELECT material, plant, CAST(status AS STRING) AS status, spk FROM marc_raw"
        a2_sql = "(plant_status IS NULL OR plant_status = '70.0')"
    else:
        marc_norm = (
            "SELECT material, plant, CAST(CAST(status AS BIGINT) AS STRING) AS status, spk "
            "FROM marc_raw WHERE status IS NOT NULL"
        )
        a2_sql = "plant_status IN ('70', '80')"

    a13_sql = compile_to_sql(
        [
            _r("A1", "is_dual", RS.A1_DUAL, Guard.ALWAYS),
            _r("A2", a2_sql, RS.A2_CANCELLED, Guard.ALWAYS),
            _r("A3", "vendor = '9000340'", apex_sent, Guard.IF_NULL),
        ],
        initial_sql="comment0",
    )

    ecc = "(vendor_3090 LIKE '1%' OR vendor_3090 = '9000033')"
    b_rules = [
        _r("B1", f"({ecc} AND plant_spk = '5S')", RS.B1, Guard.SENTINEL, apex_sent),
        # pandas `!= '5S'` fires on null Plant SPK → null-safe (§4.4.1)
        _r("B2", f"({ecc} AND plant_spk IS DISTINCT FROM '5S')", RS.B2, Guard.SENTINEL, apex_sent),
    ]
    if not v1:
        b_rules.append(
            _r(
                "B3",
                "(vendor_3090 IS NULL AND status_3090 IN ('80', '70') AND default_plant = '300')",
                RS.B3, Guard.SENTINEL, apex_sent,
            )
        )
    b_rules.append(
        _r("B4", "(vendor_3090 IS NULL AND default_plant = '300')", RS.B4, Guard.SENTINEL, apex_sent)
    )
    b_rules.append(_r("B5", "plant_spk = apex_spk", RS.B5, Guard.SENTINEL, apex_sent))
    if not v1:
        b_rules.append(_r("B6", "default_plant IS NULL", RS.B6, Guard.SENTINEL, apex_sent))
    b_rules.append(_r("B7", "apex_spk IS NULL", RS.B7, Guard.SENTINEL, apex_sent))
    b_rules.append(_r("B8", "TRUE", RS.B8_V1 if v1 else RS.B8, Guard.SENTINEL, apex_sent))
    b_sql = compile_to_sql(b_rules, initial_sql="comment")

    c_sql = compile_to_sql(
        [
            _r("C1", "plant_spk = ic_spk", RS.C1, Guard.ALWAYS),
            _r("C2", "ic_status IS NULL", RS.C2, Guard.IF_NULL),
            _r("C3", "TRUE", RS.C3, Guard.IF_NULL),
        ],
        initial_sql="comment",
    )

    a47_sql = compile_to_sql(
        [
            _r("A4", "is_intra", intra_sent, Guard.ALWAYS),
            _r("A5", "plant_spk = vendor_to_spk", RS.A5_MATCH, Guard.IF_NULL),
            _r("A6", "plant_spk = 'TW'", RS.A6_TW, Guard.IF_NULL),
            _r("A7", "TRUE", RS.A7_MISMATCH, Guard.IF_NULL),
        ],
        initial_sql="comment",
    )

    backfill_select = (
        """
SELECT m.*, a.comment_b AS apex_comment, i.comment_c AS intra_comment
FROM main1 m
LEFT JOIN (SELECT key3, comment_b FROM apex_final) a ON m.key3 = a.key3
LEFT JOIN (SELECT key3, comment_c FROM intra_final) i ON m.key3 = i.key3
"""
        if not v1
        else "SELECT m.*, NULL AS apex_comment, NULL AS intra_comment FROM main1 m"
    )

    analysis_col = (
        f""",
       CASE WHEN comment_final = {_q(apex_sent)} THEN apex_comment
            WHEN comment_final = {_q(intra_sent)} THEN intra_comment
            ELSE comment_final END AS "Analysis" """
        if not v1
        else ""
    )

    return f"""
WITH eord AS ({EORD_SQL}),
marc_raw AS ({MARC_SQL}),
marc AS ({marc_norm}),
gar AS ({GAR_SQL}),
spk_xref AS ({SPK_XREF_SQL}),
mvke AS ({MVKE_SQL}),
mg5 AS ({MG5_SQL}),
eord_k AS (
  SELECT *, material || '/' || plant AS key2,
         material || '/' || plant || '/' || number AS key3
  FROM eord
),
invalid_keys AS (
  SELECT DISTINCT key3 FROM eord_k
  WHERE valid_to < {RUN_TS_SQL} OR blocked = 'X'
     OR plant IN (SELECT plant FROM gar WHERE spk_sl_project = 'No')
),
valid AS (SELECT * FROM eord_k WHERE key3 NOT IN (SELECT key3 FROM invalid_keys)),
marc_k AS (SELECT material || '/' || plant AS key2, status, spk FROM marc),
enr AS (
  SELECT v.*, m.status AS plant_status, m.spk AS plant_spk,
         x.vendor_to_spk AS vendor_to_spk0, g.country
  FROM valid v
  LEFT JOIN marc_k m ON v.key2 = m.key2
  LEFT JOIN spk_xref x ON v.vendor = x.vendor
  LEFT JOIN gar g ON v.plant = g.plant
),
a0 AS (
  SELECT *,
         CASE WHEN vendor = '9000341' THEN {_q(RS.A0B_SWISSCO)}
              WHEN vendor LIKE '1%' THEN '20'
              ELSE vendor_to_spk0 END AS vendor_to_spk,
         CASE WHEN vendor = '9000341' THEN {_q(RS.A0B_SWISSCO)} END AS comment0
  FROM enr
),
dual AS (SELECT *, count(*) OVER (PARTITION BY key2) > 1 AS is_dual FROM a0),
a3 AS (SELECT *, {a13_sql} AS comment FROM dual),
apex0 AS (SELECT *, material || '/3090' AS mat3090 FROM a3 WHERE comment = {_q(apex_sent)}),
marc3090 AS (
  SELECT material || '/' || plant AS mat3090, status AS status_3090, spk AS spk_3090
  FROM marc WHERE plant = '3090'
),
eord3090 AS (SELECT key2 AS mat3090, vendor AS vendor_3090 FROM a3 WHERE plant = '3090'),
mvke_mg5 AS (
  SELECT v.material, v.default_plant, g.apex_mg5_to_vendor_spk AS apex_spk
  FROM mvke v LEFT JOIN mg5 g ON v.default_plant = g.default_plant
),
apex3 AS (
  SELECT a.*, m.status_3090, m.spk_3090, e.vendor_3090, t.default_plant, t.apex_spk
  FROM apex0 a
  LEFT JOIN marc3090 m ON a.mat3090 = m.mat3090
  LEFT JOIN eord3090 e ON a.mat3090 = e.mat3090
  LEFT JOIN mvke_mg5 t ON a.material = t.material
),
apex_final AS (SELECT *, {b_sql} AS comment_b FROM apex3),
intra_plants AS (SELECT plant, vendor, sales_org FROM gar WHERE spk_sl_project = 'Yes'),
intra0 AS (
  SELECT a.* FROM a3 a
  WHERE a.comment IS NULL
    AND a.plant IN (SELECT plant FROM intra_plants WHERE sales_org = '3405')
    AND a.vendor IN (SELECT vendor FROM intra_plants WHERE sales_org = '3405')
  UNION ALL
  SELECT a.* FROM a3 a
  WHERE a.comment IS NULL
    AND a.plant IN (SELECT plant FROM intra_plants WHERE sales_org = '3900')
    AND a.vendor IN (SELECT vendor FROM intra_plants WHERE sales_org = '3900')
),
intra1 AS (SELECT *, material || '/' || substr(vendor, 4) AS intra_key FROM intra0),
marc_intra AS (
  SELECT material || '/' || plant AS intra_key, status AS ic_status, spk AS ic_spk FROM marc
),
intra2 AS (
  SELECT i.*, m.ic_status, m.ic_spk FROM intra1 i LEFT JOIN marc_intra m ON i.intra_key = m.intra_key
),
intra_final AS (SELECT *, {c_sql} AS comment_c FROM intra2),
intra_keys AS (SELECT DISTINCT key3 FROM intra1),
main0 AS (
  SELECT a.*, (k.key3 IS NOT NULL) AS is_intra
  FROM a3 a LEFT JOIN intra_keys k ON a.key3 = k.key3
),
main1 AS (SELECT *, {a47_sql} AS comment_final FROM main0),
main2 AS ({backfill_select})
SELECT material AS "Material", plant AS "Plant", number AS "Number", vendor AS "Vendor",
       CAST(valid_to AS STRING) AS "Valid to", blocked AS "Blocked",
       key2 AS "Material/Plant", key3 AS "Material/Plant/Number",
       plant_status AS "Plant Status", plant_spk AS "Plant SPK",
       vendor_to_spk AS "Vendor to SPK", country AS "Country",
       comment_final AS "Comment"{analysis_col}
FROM main2
"""


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def status_cleansing_oracle() -> str:
    """DuckDB replay of plans/status_cleansing.run()'s MARC sheet."""
    local, xplant, inv = "status", "xplant_status", "sum_inv"
    d_sql = compile_to_sql(
        [
            _r("D1", "material_type IS NULL", RS.D1, Guard.IF_NULL),
            _r("D2", f"{local} = {xplant}", RS.D2, Guard.IF_NULL),
            _r("D3", f"({xplant} = '80' AND {inv} IS NOT NULL)", RS.D3, Guard.IF_NULL),
            _r("D4", f"({local} = '80' AND {inv} IS NOT NULL)", RS.D4, Guard.IF_NULL),
            _r("D5", f"({local} = '80' AND {inv} IS NULL)", RS.D5, Guard.IF_NULL),
            _r("D6", f"({xplant} = '80' AND {local} <> '80')", RS.D6, Guard.IF_NULL),
            _r("D7", f"({local} = '70' AND {inv} IS NULL)", RS.D7, Guard.IF_NULL),
            _r("D8", f"({local} = '70' AND {inv} IS NOT NULL)", RS.D8, Guard.IF_NULL),
            _r("D9", f"{local} = '41'", RS.D9, Guard.IF_NULL),
            _r("D10", "TRUE", RS.D10, Guard.IF_NULL),
        ]
    )
    return f"""
WITH marc_raw AS ({MARC_SQL}),
mara AS ({MARA_SQL}),
mb52_raw AS ({MB52_SQL}),
gar AS ({GAR_SQL}),
scope AS (SELECT plant FROM gar WHERE status_cleansing_project = 'Yes'),
marc AS (
  SELECT material, plant, CAST(CAST(status AS BIGINT) AS STRING) AS status, spk, valid_from,
         material || '/' || plant AS key2
  FROM marc_raw WHERE status IS NOT NULL
),
mb52 AS (
  SELECT material, plant,
         CAST(unrestricted AS BIGINT) AS unrestricted,
         CAST(in_quality_insp AS BIGINT) AS in_quality_insp,
         CAST(blocked AS BIGINT) AS blocked,
         material || '/' || plant AS key2
  FROM mb52_raw
),
mb52_valid AS (
  SELECT *, unrestricted + in_quality_insp + blocked AS sum_inv
  FROM mb52 WHERE plant IN (SELECT plant FROM scope)
),
mb52_grouped AS (
  SELECT key2, CAST(SUM(sum_inv) AS BIGINT) AS sum_inv FROM mb52_valid GROUP BY key2
),
marc_valid AS (SELECT * FROM marc WHERE plant IN (SELECT plant FROM scope)),
enriched AS (
  SELECT m.material, m.plant, m.status, m.spk,
         m.valid_from AS valid_from_local, m.key2,
         a.material_type, a.xplant_status, a.valid_from AS valid_from_xplant,
         g.sum_inv
  FROM marc_valid m
  LEFT JOIN mara a ON m.material = a.material
  LEFT JOIN mb52_grouped g ON m.key2 = g.key2
)
SELECT material AS "Material", plant AS "Plant",
       status AS "Plant-sp.matl status", spk AS "SpecProcurem Costing",
       CAST(valid_from_local AS STRING) AS "Valid from local plant",
       key2 AS "Material/Plant",
       material_type AS "Material Type", xplant_status AS "X-plant matl status",
       CAST(valid_from_xplant AS STRING) AS "Valid from X-plant",
       sum_inv AS "Sum of Inventory",
       {d_sql} AS "Comment"
FROM enriched
"""
