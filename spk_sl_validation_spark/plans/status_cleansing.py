"""Material-status validation pipeline — Spark-first re-expression of
Status_Cleansing.py (SURVEY.md §3.3).

    MB52 ⋉ in-scope plants → Sum of Inventory (E7) → groupBy sum (A1)
    MARC ⋉ in-scope ⟕ MARA ⟕ inventory-agg → cascade D → 'MARC' sheet

The group-by aggregation is the reference workload's only wide
shuffle; it keys on Material/Plant (high cardinality, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spk_sl_validation_spark.functions.scalar import c
from spk_sl_validation_spark.operators import relational as R
from spk_sl_validation_spark.operators.rules import Guard, Rule, apply_cascade
from spk_sl_validation_spark.plans import rule_strings as RS

KEY2 = "Material/Plant"


def run(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    gar = tables["GAR_Plants"]
    plants_valid = gar.filter(gar["Status Cleansing Project"] == "Yes").select("Plant")

    # -- normalize (SC:55-76): statuses through the int chain, quantities → long
    marc = tables["MARC"]
    marc = marc.filter(c("Plant-sp.matl status").isNotNull()).withColumn(
        "Plant-sp.matl status", c("Plant-sp.matl status").cast("long").cast("string")
    )
    marc = marc.withColumn(KEY2, F.concat_ws("/", "Material", "Plant"))

    mara = tables["MARA"]  # X-plant status arrives string-typed (SC:57)

    mb52 = tables["MB52"]
    for qty_col in ["Unrestricted", "In Quality Insp.", "Blocked"]:
        mb52 = mb52.withColumn(qty_col, c(qty_col).cast("long"))
    mb52 = mb52.withColumn(KEY2, F.concat_ws("/", "Material", "Plant"))

    # -- inventory: scope filter, 3-way add (SC:103), group-sum (SC:104)
    mb52_valid = R.semi_join(mb52, plants_valid, on="Plant")
    mb52_valid = mb52_valid.withColumn(
        "Sum of Inventory",
        F.col("Unrestricted") + F.col("`In Quality Insp.`") + F.col("Blocked"),
    )
    mb52_grouped = R.group_sum(
        mb52_valid,
        [KEY2],
        ["Unrestricted", "In Quality Insp.", "Blocked", "Sum of Inventory"],
    )

    # -- MARC enrichment (SC:107-110); 'Valid from' collides → pandas suffixes
    #    _x/_y then renames; we alias up front to the same final names
    marc_valid = R.semi_join(marc, plants_valid, on="Plant")
    marc_valid = marc_valid.withColumnRenamed("Valid from", "Valid from local plant")
    mara_proj = mara.select(
        "Material",
        "Material Type",
        "X-plant matl status",
        mara["Valid from"].alias("Valid from X-plant"),
    )
    marc_valid = R.left_join(marc_valid, mara_proj, on="Material")
    marc_valid = R.left_join(
        marc_valid, mb52_grouped.select(KEY2, "Sum of Inventory"), on=KEY2
    )

    # -- cascade D (SC:112-161): first-match-wins, all null-guarded
    local = F.col("`Plant-sp.matl status`")
    xplant = F.col("`X-plant matl status`")
    inv = F.col("`Sum of Inventory`")
    d_rules = [
        Rule("D1", F.col("`Material Type`").isNull(), RS.D1, Guard.IF_NULL),
        Rule("D2", local == xplant, RS.D2, Guard.IF_NULL),
        Rule("D3", (xplant == "80") & inv.isNotNull(), RS.D3, Guard.IF_NULL),
        Rule("D4", (local == "80") & inv.isNotNull(), RS.D4, Guard.IF_NULL),
        Rule("D5", (local == "80") & inv.isNull(), RS.D5, Guard.IF_NULL),
        Rule("D6", (xplant == "80") & (local != "80"), RS.D6, Guard.IF_NULL),
        Rule("D7", (local == "70") & inv.isNull(), RS.D7, Guard.IF_NULL),
        Rule("D8", (local == "70") & inv.isNotNull(), RS.D8, Guard.IF_NULL),
        Rule("D9", local == "41", RS.D9, Guard.IF_NULL),
        Rule("D10", F.lit(True), RS.D10, Guard.IF_NULL),
    ]
    marc_final = apply_cascade(marc_valid, d_rules, target="Comment", initial_from_target=False)

    return {
        "MARC": marc_final,
        "MB52": mb52_valid,
        "MB52_groupby": mb52_grouped,
    }
