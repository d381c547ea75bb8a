"""Rebuild the NOTES.md rotation ledger from the CORRECTNESS_r*.json
driver records: one line per query with its per-round evidence mark
(G = full green rows+schema+hash, r = ran rows-only / no_oracle,
X = error).

Usage: python tools/ledger.py [--markdown]
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rounds: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(f)[len("CORRECTNESS_r") :].split(".")[0]
        rounds[rnd.lstrip("0") or "0"] = json.load(open(f))
    names = sorted({n for d in rounds.values() for n in d})
    md = "--markdown" in sys.argv
    if md:
        print("| Query | Evidence |\n|---|---|")
    for n in names:
        marks = []
        for r, d in rounds.items():
            if n not in d:
                continue
            row = d[n]
            if row.get("hash_match"):
                marks.append(f"{r}G")
            elif row.get("err") == "no_oracle":
                marks.append(f"{r}r")
            else:
                marks.append(f"{r}X")
        line = " ".join(marks)
        print(f"| {n} | {line} |" if md else f"{n}: {line}")

    # staleness summary: queries grouped by the round of their LAST
    # driver row — the rotation decision input (stalest cohort first)
    latest = max(int(r) for r in rounds)
    last: dict[str, int] = {}
    for r, d in sorted(rounds.items(), key=lambda kv: int(kv[0])):
        for n in d:
            last[n] = int(r)
    by_round: dict[int, list[str]] = {}
    for n, r in last.items():
        by_round.setdefault(r, []).append(n)
    print()
    print("staleness (latest driver round = %d):" % latest)
    for r in sorted(by_round):
        qs = sorted(by_round[r])
        print(
            f"  round {r} ({latest - r} behind, {len(qs)} queries): "
            + ", ".join(qs)
        )


if __name__ == "__main__":
    main()
