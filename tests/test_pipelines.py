"""Golden rule-coverage tests (SURVEY.md §5.2.2): run the full
reference-domain pipelines on hand-crafted fixtures and assert the
exact Comment/Analysis per rule id."""

from __future__ import annotations

import pytest

from spk_sl_validation_spark.plans import rule_strings as RS
from spk_sl_validation_spark.plans import spk_sl_cleansing, status_cleansing
from spk_sl_validation_spark.sources import fixtures as FX


@pytest.fixture(scope="module")
def tables(spark):
    return FX.build_tables(spark)


@pytest.fixture(scope="module")
def cl_sheets(spark, tables):
    return spk_sl_cleansing.run(tables, run_ts=FX.RUN_TS, variant=spk_sl_cleansing.CL)


@pytest.fixture(scope="module")
def v1_sheets(spark, tables):
    return spk_sl_cleansing.run(tables, run_ts=FX.RUN_TS, variant=spk_sl_cleansing.V1)


def _by_key(df, key="Material/Plant/Number", cols=("Comment",)):
    rows = df.select(key, *cols).collect()
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r[key], []).append(tuple(r[c] for c in cols))
    return out


class TestCLMainSheet:
    def test_expected_comments(self, cl_sheets):
        got = _by_key(cl_sheets["Valid SL with SPK"])
        for key, want in FX.EXPECTED_MAIN_COMMENT.items():
            assert key in got, f"{key} missing from main sheet"
            for (comment,) in got[key]:
                assert comment == want, f"{key}: got {comment!r}, want {want!r}"

    def test_no_unexpected_rows(self, cl_sheets):
        got = _by_key(cl_sheets["Valid SL with SPK"])
        # invalid/blocked/OOS rows must not appear
        for bad in ["M001/1000/1", "M002/1000/1", "M002/1000/2", "M003/2000/1"]:
            assert bad not in got
        assert set(got) == set(FX.EXPECTED_MAIN_COMMENT)

    def test_analysis_coalesce(self, cl_sheets):
        got = _by_key(cl_sheets["Valid SL with SPK"], cols=("Comment", "Analysis"))
        for key, rows in got.items():
            want = FX.EXPECTED_ANALYSIS_OVERRIDES.get(
                key, FX.EXPECTED_MAIN_COMMENT[key]
            )
            for _, analysis in rows:
                assert analysis == want, f"{key}: Analysis={analysis!r}, want {want!r}"

    def test_j5_row_multiplication(self, cl_sheets):
        # M015's apex row joins two EORD@3090 records → backfill doubles it
        got = _by_key(cl_sheets["Valid SL with SPK"])
        assert len(got["M015/1000/1"]) == 2

    def test_swissco_vendor_to_spk_overwrite(self, cl_sheets):
        rows = (
            cl_sheets["Valid SL with SPK"]
            .filter("`Material/Plant/Number` = 'M004/1000/1'")
            .select("Vendor to SPK")
            .collect()
        )
        assert rows[0][0] == RS.A0B_SWISSCO

    def test_a0a_prefix_vendor_spk(self, cl_sheets):
        rows = (
            cl_sheets["Valid SL with SPK"]
            .filter("`Material/Plant/Number` = 'M022/1000/1'")
            .select("Vendor to SPK")
            .collect()
        )
        assert rows[0][0] == "20"


class TestCLBranchSheets:
    def test_apex_sheet(self, cl_sheets):
        got = _by_key(cl_sheets["SKU via APEX SPK"])
        assert set(got) == set(FX.EXPECTED_APEX_COMMENT)
        for key, want in FX.EXPECTED_APEX_COMMENT.items():
            for (comment,) in got[key]:
                assert comment == want, f"{key}: got {comment!r}, want {want!r}"
        assert len(got["M015/1000/1"]) == 2  # J5 multiplication inside the sheet

    def test_intra_sheet(self, cl_sheets):
        got = _by_key(cl_sheets["CN_JP_Intra"])
        assert set(got) == set(FX.EXPECTED_INTRA_COMMENT)
        for key, want in FX.EXPECTED_INTRA_COMMENT.items():
            assert got[key] == [(want,)]

    def test_missing_sl_sheet(self, cl_sheets):
        rows = cl_sheets["SKU missing SL"].select("Material/Plant").collect()
        assert {r[0] for r in rows} == FX.EXPECTED_MISSING_SL


class TestV1Variant:
    def test_main_comments(self, v1_sheets):
        got = _by_key(v1_sheets["Valid SL with SPK"])
        assert set(got) == set(FX.EXPECTED_MAIN_COMMENT_V1)
        for key, want in FX.EXPECTED_MAIN_COMMENT_V1.items():
            for (comment,) in got[key]:
                assert comment == want, f"{key}: got {comment!r}, want {want!r}"

    def test_apex_sheet(self, v1_sheets):
        got = _by_key(v1_sheets["SKU via APEX SPK"])
        assert set(got) == set(FX.EXPECTED_APEX_COMMENT_V1)
        for key, want in FX.EXPECTED_APEX_COMMENT_V1.items():
            for (comment,) in got[key]:
                assert comment == want, f"{key}: got {comment!r}, want {want!r}"

    def test_no_missing_sl_and_no_analysis(self, v1_sheets):
        assert "SKU missing SL" not in v1_sheets
        assert "Analysis" not in v1_sheets["Valid SL with SPK"].columns


class TestStatusCleansing:
    @pytest.fixture(scope="class")
    def sc_sheets(self, spark, tables):
        return status_cleansing.run(tables)

    def test_cascade_d(self, sc_sheets):
        got = _by_key(sc_sheets["MARC"], key="Material/Plant")
        for key, want in FX.EXPECTED_SC_COMMENT.items():
            assert got[key] == [(want,)], f"{key}: got {got.get(key)}, want {want!r}"

    def test_inventory_sums(self, sc_sheets):
        got = _by_key(sc_sheets["MARC"], key="Material/Plant", cols=("Sum of Inventory",))
        for key, want in FX.EXPECTED_SC_INVENTORY.items():
            assert got[key] == [(want,)]

    def test_out_of_scope_plant_filtered(self, sc_sheets):
        rows = sc_sheets["MB52"].select("Plant").distinct().collect()
        assert {r[0] for r in rows} <= {"1000", "2000", "3401", "3402"}

    def test_groupby_sums_all_numeric(self, sc_sheets):
        row = (
            sc_sheets["MB52_groupby"]
            .filter("`Material/Plant` = 'M032/1000'")
            .collect()[0]
        )
        assert row["Unrestricted"] == 15
        assert row["In Quality Insp."] == 1
        assert row["Blocked"] == 2
        assert row["Sum of Inventory"] == 18


class TestDerivedRefdataCoverage:
    """The parquet-derived reference tables (plans/refdata.py) must
    exercise EVERY cascade rule at sf0.001 — otherwise the driver's
    hash-checked pipeline rows would vacuously agree on rules that
    never fire."""

    @pytest.fixture(scope="class")
    def derived_main(self, spark, sf_dir):
        from spk_sl_validation_spark.plans import refdata
        from spk_sl_validation_spark.plans.pipeline_queries import RUN_TS

        tables = refdata.build_ref_tables(spark, sf_dir)
        sheets = spk_sl_cleansing.run(tables, run_ts=RUN_TS, variant=spk_sl_cleansing.CL)
        return sheets["Valid SL with SPK"].select("Comment", "Analysis").toPandas()

    def test_every_a_rule_fires(self, derived_main):
        for msg in (RS.A0B_SWISSCO, RS.A1_DUAL, RS.A2_CANCELLED, RS.A3_APEX_SENTINEL,
                    RS.A4_INTRA_SENTINEL, RS.A5_MATCH, RS.A6_TW, RS.A7_MISMATCH):
            assert (derived_main.Comment == msg).any(), f"rule never fires: {msg!r}"

    def test_every_b_and_c_rule_fires(self, derived_main):
        for msg in (RS.B1, RS.B2, RS.B3, RS.B4, RS.B5, RS.B6, RS.B7, RS.B8,
                    RS.C1, RS.C2, RS.C3):
            assert (derived_main.Analysis == msg).any(), f"rule never fires: {msg!r}"

    def test_every_d_rule_fires(self, spark, sf_dir):
        from spk_sl_validation_spark.plans import refdata

        tables = refdata.build_ref_tables(spark, sf_dir)
        marc = status_cleansing.run(tables)["MARC"].select("Comment").toPandas()
        for i in range(1, 11):
            msg = getattr(RS, f"D{i}")
            assert (marc.Comment == msg).any(), f"rule never fires: D{i}"


def test_refdata_tables_identical_across_engines(spark, sf_dir):
    """The shared-SQL contract of plans/refdata.py: every derived
    reference table must come out IDENTICAL from Spark and DuckDB —
    a dialect divergence here would otherwise surface only as an
    opaque whole-pipeline hash mismatch."""
    import duckdb

    from spk_sl_validation_spark.plans import refdata
    from tools.check_contract import frame_fingerprint

    con = duckdb.connect()
    for t in ("orders", "part", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    from spk_sl_validation_spark.plans.pipeline_queries import _stringify_timestamps

    tables = refdata.build_ref_tables(spark, sf_dir)
    for name, sql in refdata.TABLE_SQL.items():
        # timestamps → strings BEFORE collection (9999-12-31 overflows
        # pandas ns on the Arrow path), and on the DuckDB side likewise
        sdf = _stringify_timestamps(tables[name]).toPandas()
        # Spark side has been renamed to SAP headers; rename DuckDB side the same
        ddf = con.execute(sql).df().rename(columns=refdata.REF_COLUMNS[name])
        # DuckDB hands back-of-range timestamps (9999-12-31) as object
        # columns of datetime.datetime — render them like Spark's string
        # cast ('YYYY-MM-DD HH:MM:SS', space separator, no isoformat 'T')
        import datetime as _dt

        def _render(v):
            if isinstance(v, _dt.datetime):
                return str(v)
            if isinstance(v, _dt.date):  # DuckDB yields date objects for 00:00:00 times
                return f"{v} 00:00:00"
            return v

        for c in ddf.columns:
            # NOT astype(str): pandas renders all-midnight datetime64
            # columns date-only ('1993-01-01'), unlike Spark's cast
            if ddf[c].map(lambda v: isinstance(v, _dt.date)).any():
                ddf[c] = ddf[c].map(_render)
        assert frame_fingerprint(sdf) == frame_fingerprint(ddf), f"derived table diverges: {name}"
