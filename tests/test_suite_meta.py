"""Suite-registry invariants — structural guards that the driver
contract stays whole as queries are added."""

import re

from sparkswift import suite


def _registry():
    suite.queries()  # force sub-suite imports + window validation
    return suite._REGISTRY


def test_every_rows_only_query_has_a_gate_twin():
    """Every no-oracle (sketch/ANN/hash) query must have a
    `<prefix>_gate` self-verifying twin registered WITH an oracle, so
    the driver always holds hash-matchable evidence for the family
    (VERDICT r5 #4). New rows-only queries fail here until their gate
    ships."""
    reg = _registry()
    rows_only = {n for n, (_f, o) in reg.items() if o is None}
    missing = []
    for n in sorted(rows_only):
        if n.endswith("_gate"):
            continue
        prefix = re.match(r"([a-z]+\d+)", n)
        gate = f"{prefix.group(1)}_gate" if prefix else None
        if gate not in reg or reg[gate][1] is None:
            missing.append((n, gate))
    assert not missing, f"rows-only queries without an oracled gate: {missing}"


def test_gate_oracle_placeholders_all_resolved():
    """suite_gates wraps other queries' oracles at import time — an
    unresolved __X__ placeholder would reach DuckDB as a syntax
    error."""
    reg = _registry()
    bad = {
        n: o[:120]
        for n, (_f, o) in reg.items()
        if o is not None and "__" in o and "_ORACLE__" in o
    }
    assert not bad, bad


def test_window_is_exactly_fifty_registered_names():
    names = list(suite.queries())
    assert len(names) >= 50
    assert len(set(names[:50])) == 50
    assert set(suite._WINDOW) == set(names[:50])
