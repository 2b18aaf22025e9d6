"""Ingest a driver CORRECTNESS_r*.json into tools/driver_green.json.

Usage:  python tools/update_driver_green.py CORRECTNESS_r03.json [...]

A query becomes driver-green when rows/schema/hash all matched with no
error in that round; the registry then demotes it behind the never-green
names in the driver's sample order (plans/registry.py).  Green status is
NOT sticky across a later failure: if a subsequently-ingested round
records a red row for a name, that name is revoked so the registry
rotates it back into the sample frontier (ADVICE round-3 item 4).
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

HERE = pathlib.Path(__file__).resolve().parent
LEDGER = HERE / "driver_green.json"


def _round_of(filename: str) -> int:
    """CORRECTNESS_r05.json → 5 (0 if unparseable — sorts stalest)."""
    m = re.search(r"_r(\d+)", filename)
    return int(m.group(1)) if m else 0


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    ledger = json.loads(LEDGER.read_text())
    green = set(ledger["green"])
    # last_green_round: name → newest round whose driver sample verified
    # it. The registry orders fully-green registries stalest-first so
    # each round's sample re-validates the oldest evidence.
    last_round: dict[str, int] = dict(ledger.get("last_green_round", {}))
    for arg in sys.argv[1:]:
        rows = json.loads(pathlib.Path(arg).read_text())
        rnd = _round_of(pathlib.Path(arg).name)
        newly = {
            name
            for name, v in rows.items()
            if v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            and not v.get("err")
        }
        failed = {
            name
            for name, v in rows.items()
            if name not in newly
        }
        added = sorted(newly - green)
        revoked = sorted(green & failed)
        green |= newly
        green -= failed
        for n in newly:
            last_round[n] = max(last_round.get(n, 0), rnd)
        for n in failed:
            last_round.pop(n, None)
        name = pathlib.Path(arg).name
        if name not in ledger["rounds_ingested"]:
            ledger["rounds_ingested"].append(name)
        print(f"{name}: +{len(added)} newly green {added[:10]}{'…' if len(added) > 10 else ''}")
        if revoked:
            print(f"{name}: -{len(revoked)} revoked (regressed) {revoked}")
    ledger["green"] = sorted(green)
    ledger["last_green_round"] = {n: last_round[n] for n in sorted(last_round)}
    LEDGER.write_text(json.dumps(ledger, indent=1))
    print(f"total driver-green: {len(green)}")


if __name__ == "__main__":
    main()
