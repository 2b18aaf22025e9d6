"""Guards for the committed self-check artifacts.

Round-4 verdict found that CONTRACT_SELFCHECK_SF0_1.json had been
regenerated with the default (sf0.01) data directory since registry
215, making it byte-identical to CONTRACT_SELFCHECK.json — the
"green at both scales" claim was unbacked.  These tests pin each
artifact to the scale factor its name claims.
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name: str) -> dict:
    return json.loads((REPO / name).read_text())


def test_default_selfcheck_is_sf001():
    data = _load("CONTRACT_SELFCHECK.json")
    assert data["sf_dir"].rstrip("/").endswith("sf0.01"), data["sf_dir"]
    assert data["n_failed"] == 0


def test_sf01_selfcheck_is_actually_sf01():
    data = _load("CONTRACT_SELFCHECK_SF0_1.json")
    assert data["sf_dir"].rstrip("/").endswith("sf0.1"), (
        f"CONTRACT_SELFCHECK_SF0_1.json records sf_dir={data['sf_dir']!r}; "
        "regenerate with SPARK_GRAFT_CHECK_SF_DIR=/root/testdata/sf0.1 "
        "python tools/check_contract.py --json CONTRACT_SELFCHECK_SF0_1.json"
    )
    assert data["n_failed"] == 0


def test_both_selfchecks_cover_full_registry():
    from spk_sl_validation_spark.plans import registry

    names = set(registry.all_queries())
    for artifact in ("CONTRACT_SELFCHECK.json", "CONTRACT_SELFCHECK_SF0_1.json"):
        data = _load(artifact)
        checked = set(data["queries"])
        missing = sorted(names - checked)
        assert not missing, f"{artifact} missing queries: {missing}"
