"""Registry consolidation audit (VERDICT r14 "Next round" #10): map
every registered query to the sparkswift operator symbols its
callable exercises (static scan of the registered function's source
for operator-module attribute references and imports), then report:

* operator symbols reachable from >= 1 registered name (the coverage
  invariant a fold must preserve);
* names whose symbol set is a strict subset of another single name's
  (mechanical fold CANDIDATES — a human still has to check the LAWS
  are implied, not just the code surface: a subset name whose oracle
  pins a property the superset's oracle doesn't is NOT foldable);
* symbols exercised by only one name (fold blockers: removing that
  name orphans the operator).

Usage: python tools/registry_audit.py [--markdown]
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, "/root/repo")

# module aliases used across the suite files
_ALIASES = {
    "mm": "multimodal", "dd": "dedup", "sim": "similarity",
    "tx": "text", "sp": "sampling",
}
_OPERATOR_MODULES = (
    "multimodal", "dedup", "similarity", "text", "sampling", "rolling",
    "joins", "groupby", "apply", "resample", "graph", "packing",
    "profile", "events", "layout", "pca", "udtf_fns", "pandas_api",
)


def symbols_of(fn) -> set[str]:
    src = inspect.getsource(fn)
    out: set[str] = set()
    for alias, mod in _ALIASES.items():
        for m in re.finditer(rf"\b{alias}\.(\w+)", src):
            out.add(f"{mod}.{m.group(1)}")
    # direct imports: from sparkswift.operators.X import a, b
    for m in re.finditer(
        r"from sparkswift\.operators\.(\w+) import ([\w,\s()]+)", src
    ):
        mod, names = m.group(1), m.group(2)
        for n in re.split(r"[\s,()]+", names):
            if n and n != "import":
                out.add(f"{mod}.{n}")
    for m in re.finditer(
        r"from sparkswift\.(streaming\.\w+|sources(?:\.\w+)?) import"
        r" ([\w,\s()]+)",
        src,
    ):
        mod, names = m.group(1), m.group(2)
        for n in re.split(r"[\s,()]+", names):
            if n:
                out.add(f"{mod}.{n}")
    return out


def main() -> None:
    from sparkswift import suite

    qs = suite.queries()
    cov = {name: symbols_of(fn) for name, fn in qs.items()}
    sym_to_names: dict[str, list[str]] = {}
    for name, syms in cov.items():
        for s in syms:
            sym_to_names.setdefault(s, []).append(name)

    singles = {s for s, ns in sym_to_names.items() if len(ns) == 1}
    candidates = []
    names = list(cov)
    for a in names:
        if not cov[a]:
            continue
        if cov[a] & singles:
            continue  # folding a would orphan an operator
        for b in names:
            if a != b and cov[a] and cov[a] < cov[b]:
                candidates.append((a, b))
                break

    print(f"registered names: {len(qs)}")
    print(f"operator symbols reachable: {len(sym_to_names)}")
    print(f"symbols with exactly one covering name: {len(singles)}")
    print()
    print("fold CANDIDATES (code-surface subset; verify LAWS before"
          " folding):")
    if not candidates:
        print("  none — every name either exercises an operator no other"
              " name reaches, or has a non-subset code surface")
    for a, b in candidates:
        print(f"  {a} ⊆ {b}  (syms: {sorted(cov[a])})")
    if "--markdown" in sys.argv:
        print("\n| Name | Operator symbols |")
        print("|---|---|")
        for n in sorted(cov):
            print(f"| {n} | {', '.join(sorted(cov[n])) or '(suite-local)'} |")


if __name__ == "__main__":
    main()
