"""Physical data-layout operators: Z-order (Morton) keys and the
z-ordered writer — the data-skipping lever for MULTI-column range
predicates that a single sort column can't serve (the reference has no
storage layer at all; its surface ends at pandas applies,
swifter/swifter.py:287-521).

Why this matters at 100 TB: parquet row-group min/max stats prune
scans only when rows with similar values are physically adjacent.
Sorting by (a, b) serves predicates on ``a`` but leaves ``b`` scattered;
interleaving the BITS of both columns (the Morton/Z curve) makes every
row group cover a small rectangle of the (a, b) domain, so a 2-D range
predicate skips most row groups on either column — the same layout
Delta/Iceberg ``OPTIMIZE ZORDER BY`` produces, built here from plain
Spark primitives: an exact integer key + repartitionByRange + in-task
sort (no global sort task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[str | Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each of the
    given NON-NEGATIVE integer columns (column i owns output bit
    positions ``j·n + i``). Pure integer arithmetic — the disjoint
    destination bits are summed, which equals OR — so any engine
    reproduces the key exactly; values are clamped into
    ``[0, 2^bits)`` first so out-of-grid rows interleave their low
    bits instead of corrupting neighbors' lanes.

    Callers map real domains onto the grid first (e.g.
    ``floor(price)`` or a width-quantized timestamp); ranks work too
    but need their own pass. bits·n_cols must stay ≤ 63.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds a signed int64")
    out: Column | None = None
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        cc = F.pmod(cc, F.lit(1 << bits))
        for j in range(bits):
            term = F.shiftleft(
                F.shiftright(cc, j).bitwiseAND(F.lit(1)), j * n + i
            )
            out = term if out is None else out + term
    assert out is not None
    return out.cast("bigint")


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical Morton key as ANSI-ish SQL (DuckDB oracle twin):
    same clamp, same bit lanes, same summation."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        base = f"(CAST({c} AS BIGINT) % {1 << bits} + {1 << bits}) % {1 << bits}"
        for j in range(bits):
            # full parens: SQL gives + higher precedence than <<, so a
            # bare `x << 0 + y << 2` parses as `x << (0 + y) << 2`
            terms.append(f"(((({base}) >> {j}) & 1) << {j * n + i})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered along the Z curve of ``cols``:
    ``repartitionByRange`` on the Morton key (range exchange — sampled
    bounds, no single-task sort) then ``sortWithinPartitions`` so
    every file covers one contiguous Z range ⇒ every row group covers
    a small (a, b) rectangle and min/max stats prune BOTH columns.
    The helper key column is dropped before writing; layout, not
    schema, carries the information.
    """
    work = df.withColumn("__z", zorder_key(list(cols), bits))
    parts = (
        work.repartitionByRange(num_files, "__z")
        if num_files
        else work.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
