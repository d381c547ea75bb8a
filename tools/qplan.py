"""Capture .explain("formatted") for queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/qplan.py --tag r15 --suffix before [--sf DIR] q [q ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from sparkswift.session import get_spark
    from sparkswift import suite

    spark = get_spark("qplan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(suite.queries())
    qs.update(suite.raw_queries())

    outdir = os.path.join("/root/repo/plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
