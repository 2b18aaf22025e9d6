"""Guards for the driver-green ledger (tools/driver_green.json).

Round-3 verdict found a silent process bug: a CORRECTNESS_r*.json landed
on disk but was never ingested into the ledger, so the next round's
driver sample re-tested already-green queries instead of rotating onto
the never-sampled frontier.  These tests make that failure mode loud.
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent
LEDGER = REPO / "tools" / "driver_green.json"


def _ledger():
    return json.loads(LEDGER.read_text())


def test_every_correctness_file_is_ingested():
    on_disk = sorted(p.name for p in REPO.glob("CORRECTNESS_r*.json"))
    ingested = set(_ledger()["rounds_ingested"])
    missing = [n for n in on_disk if n not in ingested]
    assert not missing, (
        f"CORRECTNESS files on disk but not ingested into tools/driver_green.json: "
        f"{missing}. Run: python tools/update_driver_green.py {' '.join(missing)}"
    )


def test_ledger_green_names_exist_in_registry():
    from spk_sl_validation_spark.plans import registry

    names = set(registry.all_queries())
    unknown = sorted(set(_ledger()["green"]) - names)
    assert not unknown, f"ledger lists green names not in the registry: {unknown}"


def test_sample_prefix_front_loads_never_green():
    """The first-50 sample prefix must contain every never-green query
    (as long as there are <= 50 of them)."""
    from spk_sl_validation_spark.plans import registry

    names = list(registry.all_queries())
    green = set(_ledger()["green"])
    never = [n for n in names if n not in green]
    if len(never) > 50:
        never_in_prefix = [n for n in names[:50] if n not in green]
        assert len(never_in_prefix) == 50
    else:
        missing = [n for n in never if n not in names[:50]]
        assert not missing, f"never-green queries demoted out of the sample prefix: {missing}"


def test_updater_revokes_on_regression(tmp_path):
    """A name that was green and later records a red row must be
    revoked (rotated back into the sample frontier) — ADVICE round-3
    item 4, mechanized in tools/update_driver_green.py."""
    import json
    import shutil
    import subprocess
    import sys

    tools = tmp_path / "tools"
    tools.mkdir()
    shutil.copy(REPO / "tools" / "update_driver_green.py", tools / "update_driver_green.py")
    (tools / "driver_green.json").write_text(
        json.dumps({"rounds_ingested": [], "green": []})
    )
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_rA.json").write_text(json.dumps({"q1": ok, "q2": ok}))
    (tmp_path / "CORRECTNESS_rB.json").write_text(json.dumps({"q1": red, "q3": ok}))
    subprocess.run(
        [sys.executable, str(tools / "update_driver_green.py"),
         str(tmp_path / "CORRECTNESS_rA.json")],
        check=True, capture_output=True,
    )
    subprocess.run(
        [sys.executable, str(tools / "update_driver_green.py"),
         str(tmp_path / "CORRECTNESS_rB.json")],
        check=True, capture_output=True,
    )
    ledger = json.loads((tools / "driver_green.json").read_text())
    assert ledger["green"] == ["q2", "q3"], ledger  # q1 revoked by the rB red row
    assert ledger["rounds_ingested"] == ["CORRECTNESS_rA.json", "CORRECTNESS_rB.json"]


def test_sample_prefix_rotates_onto_stalest_evidence():
    """Round-8 (verdict task 7): once the registry is (near-)fully
    green, the sample prefix must re-validate the STALEST evidence.
    Pins the whole green ordering as non-decreasing in
    last_green_round, and the first-50 prefix as exactly the
    never-green frontier followed by the stalest greens."""
    from spk_sl_validation_spark.plans import registry

    ledger = _ledger()
    green = set(ledger["green"])
    last = ledger.get("last_green_round", {})
    names = list(registry.all_queries())

    green_tail = [n for n in names if n in green]
    rounds = [last.get(n, 0) for n in green_tail]
    assert rounds == sorted(rounds), (
        "driver-green names are not ordered oldest-evidence-first: "
        + str([(n, r) for n, r in zip(green_tail, rounds)][:10])
    )

    prefix = names[:50]
    n_never = len([n for n in names if n not in green])
    greens_in_prefix = [n for n in prefix if n in green]
    if greens_in_prefix:
        cutoff = max(last.get(n, 0) for n in greens_in_prefix)
        older_outside = [
            n for n in names[50:] if n in green and last.get(n, 0) < cutoff
        ]
        assert not older_outside, (
            f"stale greens (older than the prefix cutoff r{cutoff}) left outside "
            f"the first-50 sample: {older_outside[:5]}"
        )
        expected_greens = 50 - min(n_never, 50)
        assert len(greens_in_prefix) == expected_greens


def test_r8_sample_reverifies_round1_evidence():
    """With the post-r7 ledger fully green (245/245) and one r8 query
    new, the r8 driver sample must consist of the new query plus the
    stalest (round-1) greens — the rotation end of the lifecycle
    actually exercised, not just possible."""
    from spk_sl_validation_spark.plans import registry

    ledger = _ledger()
    last = ledger.get("last_green_round", {})
    if not last or min(last.values()) >= max(last.values()):
        return  # degenerate ledger (single round) — nothing to rotate onto
    names = list(registry.all_queries())
    green = set(ledger["green"])
    stalest_round = min(last.values())
    greens_in_prefix = [n for n in names[:50] if n in green]
    stale_share = [n for n in greens_in_prefix if last.get(n, 0) == stalest_round]
    n_stalest_total = sum(1 for r in last.values() if r == stalest_round)
    want = min(n_stalest_total, len(greens_in_prefix))
    assert len(stale_share) == want, (
        f"expected the green part of the prefix to hold {want} round-"
        f"{stalest_round} names, got {len(stale_share)}"
    )
