"""Driver-window rotation guard (VERDICT r12 next-round #9).

The correctness driver evaluates the FIRST 50 registry entries each round;
DRIVER_PRIORITY is the rotation.  The r11 round shipped a freshness
misstatement ("nothing older than r8") that was only caught by the judge
re-deriving the histogram by hand — this test recomputes the latest-green
round per query from the CORRECTNESS_r*.json ledger and asserts the window
actually leads with the evidence that needs refreshing:

- every registered query with ZERO driver history (new surface) is inside
  the evaluated window, and
- every query in the OLDEST latest-green cohort is inside the window
  (impl-changed queries may take additional slots; they are not
  constrained here),

so the rotation comment and the ledger can never silently disagree again.
"""

from __future__ import annotations

import glob
import json
import os
import re

WINDOW = 50
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            data = json.load(open(path))
        except ValueError:
            continue  # a truncated ledger file must not kill the guard
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_driver_window_leads_with_stalest_evidence():
    from retailfeaturestore_spark.queries import REGISTRY

    ledger = _latest_green()
    if not ledger:
        return  # fresh clone without driver history: nothing to guard
    names = list(REGISTRY)
    window = set(names[:WINDOW])
    latest = {n: ledger.get(n) for n in names}
    never = {n for n, r in latest.items() if r is None}
    checked = {n: r for n, r in latest.items() if r is not None}
    oldest_round = min(checked.values())
    oldest = {n for n, r in checked.items() if r == oldest_round}
    must_lead = never | oldest
    if len(must_lead) >= WINDOW:
        # more stale evidence than slots: the whole window must come
        # from the stale set
        missing = window - must_lead
        assert not missing, (
            f"window slots wasted on fresh evidence while stale backlog "
            f"overflows: {sorted(missing)}"
        )
    else:
        left_out = must_lead - window
        assert not left_out, (
            f"stale/never-checked queries outside the {WINDOW}-slot driver "
            f"window (oldest cohort r{oldest_round}, never-checked "
            f"{sorted(never)}): {sorted(left_out)}"
        )


def test_ledger_has_no_unknown_green_entries():
    """Every hash-green ledger name still resolves in the registry — a
    rename would silently orphan its evidence history."""
    from retailfeaturestore_spark.queries import REGISTRY

    ledger = _latest_green()
    # names green in the LATEST round must exist (older rounds may
    # legitimately reference since-renamed queries)
    if not ledger:
        return
    newest = max(ledger.values())
    orphans = {
        n for n, r in ledger.items() if r == newest and n not in REGISTRY
    }
    assert not orphans, f"latest-round green entries missing from REGISTRY: {sorted(orphans)}"
