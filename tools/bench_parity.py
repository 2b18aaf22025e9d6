"""Head-to-head: this engine's SPK/SL pipeline vs single-threaded pandas.

The reference is a single-threaded pandas script (SURVEY.md §3.1); the
claim to beat is "matches-or-beats the reference's single-node
throughput at the same data scale". This harness generates scaled
synthetic SAP extracts (same shapes as FIXTURES.md, sized by --rows),
stages them as parquet, then times

  (a) this engine: spark.read.parquet → plans.spk_sl_cleansing.run →
      materialize all four sheets (noop write), and
  (b) a pandas twin of the same dataflow — written idiomatically from
      SURVEY.md's behavioral spec (merges + sequential masked
      assignment), NOT copied from the reference,

and cross-checks that both produce identical sheet row counts and an
identical main-sheet Comment distribution (the cascade semantics).

    python tools/bench_parity.py --rows 100000 1000000

Prints one JSON line per size; paste results into BENCH_PARITY.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from datetime import datetime

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_TS = datetime(2026, 1, 1)
EXPIRED_TS = datetime(2020, 1, 1)
VALID_TS = datetime(2200, 1, 1)  # sentinel future date within pandas ns range

APEX_SENT = None  # filled from rule_strings at runtime
PLANTS = ["1000", "1100", "2000", "3090", "3401", "3402", "3901", "3902"]
GAR = pd.DataFrame(
    {
        "Plant": PLANTS,
        "Sales Org": ["3100", "3100", "3200", "3300", "3405", "3405", "3900", "3900"],
        "Vendor": ["3001000", "3001100", "3002000", "3003090", "3003401", "3003402", "3003901", "3003902"],
        "Country": ["DE", "FR", "IN", "BE", "CN", "CN", "JP", "JP"],
        "SPK SL Project": ["Yes", "Yes", "No", "Yes", "Yes", "Yes", "Yes", "Yes"],
        "Status Cleansing Project": ["Yes"] * 8,
    }
)
SPKS = ["20", "30", "40", "5S", "TW", "99"]


def gen_tables(n: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    n_mat = max(1000, n // 4)
    n_vend = 1000
    vendors = np.array(
        [f"1{i:06d}" for i in range(n_vend // 5)]
        + [f"2{i:06d}" for i in range(n_vend - n_vend // 5)]
    )
    mats = np.array([f"M{i:07d}" for i in range(n_mat)])

    m = rng.choice(mats, size=n)
    p = rng.choice(PLANTS, size=n, p=[0.35, 0.2, 0.05, 0.1, 0.08, 0.07, 0.08, 0.07])
    v = rng.choice(vendors, size=n)
    special = rng.random(n)
    v = np.where(special < 0.06, "9000340", v)
    v = np.where((special >= 0.06) & (special < 0.08), "9000341", v)
    # intra-company vendors: other plants' codes, for CN/JP membership
    v = np.where((special >= 0.08) & (special < 0.12), rng.choice(GAR["Vendor"].to_numpy(), size=n), v)
    eord = pd.DataFrame(
        {
            "Material": m,
            "Plant": p,
            "Number": rng.integers(1, 4, size=n).astype(str),
            "Vendor": v,
            "Valid to": np.where(rng.random(n) < 0.15, EXPIRED_TS, VALID_TS),
            "Blocked": np.where(rng.random(n) < 0.05, "X", None),
        }
    )
    eord["Valid to"] = pd.to_datetime(eord["Valid to"])

    pairs = eord[["Material", "Plant"]].drop_duplicates()
    st = rng.choice([np.nan, 50.0, 60.0, 70.0, 80.0], size=len(pairs), p=[0.05, 0.6, 0.15, 0.1, 0.1])
    marc = pd.DataFrame(
        {
            "Material": pairs["Material"].to_numpy(),
            "Plant": pairs["Plant"].to_numpy(),
            "Plant-sp.matl status": st,
            "SpecProcurem Costing": rng.choice(SPKS, size=len(pairs)),
            "Valid from": datetime(2015, 6, 1),
        }
    )
    mara = pd.DataFrame(
        {
            "Material": mats,
            "Material Type": rng.choice(["FERT", "HAWA", "ZICP", "ROH", "VERP"], size=n_mat),
            "X-plant matl status": rng.choice(["50", "70", "80"], size=n_mat),
            "X-distr.chain status": "50",
            "Valid from": datetime(2015, 6, 1),
        }
    )
    mvke_mats = mats[rng.random(n_mat) < 0.5]
    mvke = pd.DataFrame(
        {
            "Material": mvke_mats,
            "Default Plant": rng.choice(["300", "301", "302", None], size=len(mvke_mats), p=[0.5, 0.3, 0.1, 0.1]),
        }
    )
    mg5 = pd.DataFrame({"Default Plant": ["300", "301"], "Apex MG5 to Vendor SPK": ["20", "40"]})
    spk_xref = pd.DataFrame(
        {"Vendor": np.append(vendors, ["9000340", "9000341"]),
         "Vendor to SPK": rng.choice(SPKS, size=n_vend + 2)}
    )
    return {
        "EORD": eord, "MARC": marc, "MARA": mara, "MVKE_3090": mvke,
        "MG5_Xref": mg5, "SPK_Xref": spk_xref, "GAR_Plants": GAR,
    }


# ---------------------------------------------------------------------------
# pandas twin of plans/spk_sl_cleansing.run(variant=CL)
# ---------------------------------------------------------------------------

def pandas_pipeline(t: dict[str, pd.DataFrame]) -> dict[str, pd.DataFrame]:
    from spk_sl_validation_spark.plans import rule_strings as RS

    K2, K3 = "Material/Plant", "Material/Plant/Number"
    marc = t["MARC"][t["MARC"]["Plant-sp.matl status"].notna()].copy()
    marc["Plant-sp.matl status"] = marc["Plant-sp.matl status"].astype(np.int64).astype(str)
    marc[K2] = marc["Material"] + "/" + marc["Plant"]
    eord = t["EORD"].copy()
    eord[K2] = eord["Material"] + "/" + eord["Plant"]
    eord[K3] = eord[K2] + "/" + eord["Number"]
    gar, spk_xref, mvke, mg5, mara = (
        t["GAR_Plants"], t["SPK_Xref"], t["MVKE_3090"], t["MG5_Xref"], t["MARA"]
    )

    invalid = pd.concat([eord[eord["Valid to"] < RUN_TS], eord[eord["Blocked"] == "X"]])
    invalid = invalid.drop_duplicates(subset=K3)
    oos = eord[eord["Plant"].isin(gar.loc[gar["SPK SL Project"] == "No", "Plant"])]
    bad_keys = pd.concat([invalid, oos]).drop_duplicates(subset=K3)[K3]
    valid = eord[~eord[K3].isin(set(bad_keys))]

    marc_proj = marc[[K2, "Plant-sp.matl status", "SpecProcurem Costing"]].rename(
        columns={"Plant-sp.matl status": "Plant Status", "SpecProcurem Costing": "Plant SPK"}
    )
    en = valid.merge(marc_proj, on=K2, how="left")
    en = en.merge(spk_xref[["Vendor", "Vendor to SPK"]], on="Vendor", how="left")
    en = en.merge(gar[["Plant", "Country"]], on="Plant", how="left")

    en["Comment"] = None
    en.loc[en["Vendor"].str.startswith("1"), "Vendor to SPK"] = "20"
    sw = en["Vendor"] == "9000341"
    en.loc[sw, "Vendor to SPK"] = RS.A0B_SWISSCO
    en.loc[sw, "Comment"] = RS.A0B_SWISSCO
    en.loc[en.duplicated(K2, keep=False), "Comment"] = RS.A1_DUAL
    en.loc[en["Plant Status"].isin(["70", "80"]), "Comment"] = RS.A2_CANCELLED
    en.loc[(en["Vendor"] == "9000340") & en["Comment"].isna(), "Comment"] = RS.A3_APEX_SENTINEL

    # Apex branch
    apex = en[en["Comment"] == RS.A3_APEX_SENTINEL].copy()
    apex["Material/3090"] = apex["Material"] + "/3090"
    marc_3090 = marc.loc[marc["Plant"] == "3090", [K2, "Plant-sp.matl status", "SpecProcurem Costing"]]
    marc_3090.columns = ["Material/3090", "Plant Status in 3090", "SPK in 3090"]
    eord_3090 = en.loc[en["Plant"] == "3090", [K2, "Vendor"]]
    eord_3090.columns = ["Material/3090", "Vendor in 3090"]
    apex = apex.merge(marc_3090, on="Material/3090", how="left")
    apex = apex.merge(eord_3090, on="Material/3090", how="left")
    mm = mvke.merge(mg5, on="Default Plant", how="left")
    apex = apex.merge(mm[["Material", "Default Plant", "Apex MG5 to Vendor SPK"]], on="Material", how="left")

    sent = apex["Comment"] == RS.A3_APEX_SENTINEL  # recomputed per step below
    ecc = apex["Vendor in 3090"].str.startswith("1", na=False) | (apex["Vendor in 3090"] == "9000033")
    steps = [
        (ecc & (apex["Plant SPK"] == "5S"), RS.B1),
        (ecc & (apex["Plant SPK"] != "5S"), RS.B2),
        (apex["Vendor in 3090"].isna() & apex["Plant Status in 3090"].isin(["80", "70"]) & (apex["Default Plant"] == "300"), RS.B3),
        (apex["Vendor in 3090"].isna() & (apex["Default Plant"] == "300"), RS.B4),
        (apex["Plant SPK"] == apex["Apex MG5 to Vendor SPK"], RS.B5),
        (apex["Default Plant"].isna(), RS.B6),
        (apex["Apex MG5 to Vendor SPK"].isna(), RS.B7),
        (pd.Series(True, index=apex.index), RS.B8),
    ]
    for cond, msg in steps:
        apex.loc[(apex["Comment"] == RS.A3_APEX_SENTINEL) & cond, "Comment"] = msg

    # IntraCo branch
    def intra_slice(so: str) -> pd.DataFrame:
        pl = gar[(gar["SPK SL Project"] == "Yes") & (gar["Sales Org"] == so)]
        base = en[en["Comment"].isna()]
        return base[base["Plant"].isin(set(pl["Plant"])) & base["Vendor"].isin(set(pl["Vendor"]))]

    intra = pd.concat([intra_slice("3405"), intra_slice("3900")]).copy()
    intra["Material/IntraCo Procurement Plant"] = intra["Material"] + "/" + intra["Vendor"].str[3:]
    marc_ic = marc[[K2, "Plant-sp.matl status", "SpecProcurem Costing"]]
    marc_ic.columns = [
        "Material/IntraCo Procurement Plant", "InterCo Procurement Plant Status", "InterCo Procurement Plant SPK",
    ]
    intra = intra.merge(marc_ic, on="Material/IntraCo Procurement Plant", how="left")
    intra_keys = set(intra[K3])
    intra.loc[intra["Plant SPK"] == intra["InterCo Procurement Plant SPK"], "Comment"] = RS.C1
    intra.loc[intra["Comment"].isna() & intra["InterCo Procurement Plant Status"].isna(), "Comment"] = RS.C2
    intra.loc[intra["Comment"].isna(), "Comment"] = RS.C3

    # main sheet A4–A7 + backfill
    main = en.copy()
    main.loc[main[K3].isin(intra_keys), "Comment"] = RS.A4_INTRA_SENTINEL
    main.loc[main["Comment"].isna() & (main["Plant SPK"] == main["Vendor to SPK"]), "Comment"] = RS.A5_MATCH
    main.loc[main["Comment"].isna() & (main["Plant SPK"] == "TW"), "Comment"] = RS.A6_TW
    main.loc[main["Comment"].isna(), "Comment"] = RS.A7_MISMATCH

    main = main.merge(apex[[K3, "Comment"]].rename(columns={"Comment": "__ac"}), on=K3, how="left")
    main = main.merge(intra[[K3, "Comment"]].rename(columns={"Comment": "__ic"}), on=K3, how="left")
    main["Analysis"] = np.where(
        main["Comment"] == RS.A3_APEX_SENTINEL, main["__ac"],
        np.where(main["Comment"] == RS.A4_INTRA_SENTINEL, main["__ic"], main["Comment"]),
    )
    main = main.drop(columns=["__ac", "__ic"])

    # missing-SL sheet
    pl_is = set(gar.loc[gar["SPK SL Project"] == "Yes", "Plant"])
    marc_is = marc[marc["Plant"].isin(pl_is)].merge(
        mara[["Material", "Material Type"]], on="Material", how="left"
    )
    marc_is = marc_is[marc_is["Material Type"].isin(["FERT", "HAWA", "ZICP"])]
    active = marc_is[marc_is["Plant-sp.matl status"] == "50"]
    missing = active[~active[K2].isin(set(en[K2]))]

    return {
        "Valid SL with SPK": main,
        "CN_JP_Intra": intra,
        "SKU via APEX SPK": apex,
        "SKU missing SL": missing,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[100_000, 1_000_000])
    args = ap.parse_args()

    from spk_sl_validation_spark.plans import spk_sl_cleansing as P
    from spk_sl_validation_spark.session import build_session

    spark = build_session(app_name="bench-parity")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    for n in args.rows:
        tables_pd = gen_tables(n)
        with tempfile.TemporaryDirectory() as tmp:
            for name, df in tables_pd.items():
                # micros, not pandas' default nanos — Spark rejects NANOS parquet
                df.to_parquet(
                    f"{tmp}/{name}.parquet",
                    index=False,
                    coerce_timestamps="us",
                    allow_truncated_timestamps=True,
                )
            del tables_pd

            t0 = time.time()
            tabs = {name: spark.read.parquet(f"{tmp}/{name}.parquet")
                    for name in ("EORD", "MARC", "MARA", "MVKE_3090", "MG5_Xref", "SPK_Xref", "GAR_Plants")}
            sheets_s = P.run(tabs, run_ts=RUN_TS, variant=P.CL)
            spark_counts = {name: df.count() for name, df in sheets_s.items()}
            spark_sec = time.time() - t0

            t1 = time.time()
            tables2 = {name: pd.read_parquet(f"{tmp}/{name}.parquet")
                       for name in ("EORD", "MARC", "MARA", "MVKE_3090", "MG5_Xref", "SPK_Xref", "GAR_Plants")}
            sheets_p = pandas_pipeline(tables2)
            pandas_counts = {name: len(df) for name, df in sheets_p.items()}
            pandas_sec = time.time() - t1

            # semantic cross-check: identical sheet sizes + identical main-sheet
            # Comment distribution (cascade semantics)
            match = spark_counts == pandas_counts
            sc = {
                r["Comment"]: r["count"]
                for r in sheets_s["Valid SL with SPK"].groupBy("Comment").count().collect()
            }
            pc = sheets_p["Valid SL with SPK"]["Comment"].value_counts().to_dict()
            comments_match = sc == pc
            print(json.dumps({
                "eord_rows": n,
                "spark_sec": round(spark_sec, 2),
                "pandas_sec": round(pandas_sec, 2),
                "speedup": round(pandas_sec / spark_sec, 2),
                "sheets": spark_counts,
                "counts_match": match,
                "comment_distribution_match": comments_match,
            }))
            assert match and comments_match, "SEMANTIC MISMATCH between engines"
    spark.stop()


if __name__ == "__main__":
    main()
