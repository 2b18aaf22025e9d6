"""CLI entry (python -m spk_sl_validation_spark): both reference
pipelines run end-to-end to a manifest-verified parquet report."""

from __future__ import annotations

import json


def test_cli_spk_sl_writes_manifest_report(spark, tmp_path):
    from spk_sl_validation_spark.__main__ import main

    out = str(tmp_path / "r1")
    assert main(["spk-sl", "--out", out]) == 0
    manifest = json.load(open(out + "/manifest.json"))
    assert set(manifest) == {
        "Valid_SL_with_SPK", "SKU_via_APEX_SPK", "CN_JP_Intra", "SKU_missing_SL",
    }
    for sheet, info in manifest.items():
        assert spark.read.parquet(f"{out}/{sheet}").count() == info["n_rows"]


def test_cli_status_writes_manifest_report(spark, tmp_path):
    from spk_sl_validation_spark.__main__ import main

    out = str(tmp_path / "r2")
    assert main(["status", "--out", out]) == 0
    manifest = json.load(open(out + "/manifest.json"))
    assert "MB52_groupby" in manifest
