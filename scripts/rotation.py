"""Compute the next round's attestation front-50 from the committed
driver verdicts — the generator behind ``registry._SWEEP_PRIORITY``.

The driver checks exactly the FIRST 50 registered queries per round, so
at 233 keys the only thing standing between "green" and "unverifiable"
is rotating the stalest verdicts to the front every round (VERDICT r8
item 1). The composition contract, unchanged since r7:

1. keys with NO driver verdict yet (new this round) go first;
2. then ALL keys whose latest verdict is the oldest round present;
3. then alphabetical fillers from the next-oldest group up to 50.

This script reads ``CORRECTNESS_r*.json``, derives each key's latest
verdict round, and prints (a) the verdict-age histogram, (b) the
recommended front-50 as a paste-ready tuple body for
``plans/registry.py``, and (c) the next-in-line overflow comment block.
``tests/test_guards.py::test_sweep_rotation_arithmetic`` then pins the
pasted result against the same files, so generator and checker are
independent paths over the same inputs.

Usage: python scripts/rotation.py [--through N]
``--through N`` caps which CORRECTNESS rounds count (default: all
present) — use it to preview the NEXT round's rotation before this
round's CORRECTNESS file lands.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUDGET = 50  # the driver's per-round correctness cap


def _verdict_passed(v: dict) -> bool:
    """A key counts as ATTESTED in a round only if that round's verdict
    actually passed (ADVICE r9: r01/r02 contain failed entries — err
    set or rows/hash mismatch; counting those as attested pushes a
    FAILING key to the back of the rotation, inverting the intent)."""
    return (
        v.get("err") is None
        and v.get("rows_match") is True
        and v.get("schema_match") is True
        # hash_match is None for rows-only (no-oracle) checks — accept
        and v.get("hash_match") is not False
    )


def latest_verdicts(through: int | None) -> dict[str, int]:
    """Each key's latest PASSING verdict round — except that for keys
    in ``registry._REVERIFY`` (mapping key -> round its oracle was
    edited in), verdicts from rounds AT OR BEFORE the edit round are
    ignored: they attest the OLD oracle form, not the current one. A
    verdict from a later round re-attests the current form and makes
    the entry inert (ADVICE r11: the previous unconditional mask kept
    ignoring fresh post-edit verdicts until someone remembered to
    empty the tuple, pinning those keys in the front-50 forever)."""
    from net7_etl_bus_spark.plans.registry import _REVERIFY

    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", p)
        if m is None:  # ADVICE r9: don't crash on nonconforming names
            print(f"# warn: skipping unparseable verdict file name: {p}")
            continue
        rnd = int(m.group(1))
        if through is not None and rnd > through:
            continue
        for k, v in json.load(open(p)).items():
            if _verdict_passed(v) and rnd > _REVERIFY.get(k, 0):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def front50(keys: list[str], latest: dict[str, int], budget: int = BUDGET) -> list[str]:
    """The recommended front-``budget`` keys: never-attested first, then
    whole stale groups oldest-round-first, then alphabetical fillers
    from the first group that doesn't fit whole."""
    by_round: dict[int, list[str]] = {}
    for k in keys:
        by_round.setdefault(latest.get(k, 0), []).append(k)
    front: list[str] = []
    for rnd in sorted(by_round):
        room = budget - len(front)
        if room <= 0:
            break
        front.extend(sorted(by_round[rnd])[:room])
    return front


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--through", type=int, default=None)
    args = ap.parse_args()

    from net7_etl_bus_spark.plans import registry

    keys = list(registry.queries())
    latest = latest_verdicts(args.through)
    stray = sorted(k for k in latest if k not in keys)
    if stray:
        print(f"# note: {len(stray)} attested keys no longer registered: {stray}")

    hist: dict[int, int] = {}
    for k in keys:
        hist[latest.get(k, 0)] = hist.get(latest.get(k, 0), 0) + 1
    print(
        "verdict-age histogram (0 = never attested): "
        + ", ".join(f"r{r}:{n}" for r, n in sorted(hist.items()))
    )

    by_round: dict[int, list[str]] = {}
    for k in keys:
        by_round.setdefault(latest.get(k, 0), []).append(k)

    front: list[str] = []
    for rnd in sorted(by_round):
        group = sorted(by_round[rnd])
        tag = "never driver-attested (NEW)" if rnd == 0 else f"last verdict: r{rnd}"
        room = BUDGET - len(front)
        if room <= 0:
            break
        if len(group) <= room:
            print(f"# --- {tag} ({len(group)} keys) ---")
            taken = group
        else:
            print(f"# --- oldest {room} of the {len(group)} {tag} keys (alphabetical) ---")
            taken = group[:room]
        front.extend(taken)
        print(textwrap.indent(textwrap.fill(" ".join(f'"{k}",' for k in taken), 68), "    "))
        if len(group) > room:
            print(
                f"# next in line after the budget line (remaining "
                f"{len(group) - room} r{rnd}-stale keys, first 6 shown):"
            )
            print(textwrap.fill(" ".join(f'"{k}",' for k in group[room : room + 6]), 72))

    assert front == front50(keys, latest)
    print(f"\n# total front keys: {len(front)} (driver budget {BUDGET})")


if __name__ == "__main__":
    main()
