"""Generate a DISJOINT-COPY x10 scale-up of an sf fixture dir into a
scratch dir (VERDICT r15 #3: the sf0.1 suite is overhead-saturated at
32 cores — a larger-SF run is needed before 8-vs-32-core ratios say
anything about §2 shuffle/skew work).

Methodology = tools/family_scale.py's disjoint copies, applied to the
WHOLE table set: every fact-table key column maps id -> id*16 + r for
copy r (stride 16 > 10 copies, so copies never collide), text columns
get a per-copy suffix token (so dedup/minhash families don't see
cross-copy duplicates), and dimension tables (region/nation) stay
as-is (each nation simply owns 10x the customers — the same shape a
real x10 corpus would have). Self-checking the way family_scale is:
every copy is internally identical to the original, so counted
totals must scale exactly x10.

NOT part of the engine or the bench contract — a measurement fixture
generator for SCALE.md only. /root/testdata is never touched.

Usage: python tools/sfx10.py [src_sf_dir] [dst_dir] [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

# per-table integer key columns to remap (id*16 + r); everything else
# is carried unchanged
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TEXT_SUFFIX = {"documents": "text"}  # suffix per-copy marker token
DIMS = ["region", "nation"]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/scratch/sf1x"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    assert k <= 16, "stride 16 caps disjoint copies at 16"

    from sparkswift.session import get_spark

    spark = get_spark("sfx10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    import shutil

    for t in DIMS:
        p = os.path.join(src, f"{t}.parquet")
        final = os.path.join(dst, f"{t}.parquet")
        if os.path.isdir(final):
            shutil.rmtree(final)
        shutil.copyfile(p, final)  # fixtures are single files
        print(f"{t}: copied")

    for t, keys in KEYS.items():
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            print(f"{t}: absent, skipped")
            continue
        df = spark.read.parquet(p)
        out = df.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
        )
        for c in keys:
            if c in df.columns:
                out = out.withColumn(c, F.col(c) * 16 + F.col("__r"))
        tc = TEXT_SUFFIX.get(t)
        if tc and tc in df.columns:
            out = out.withColumn(
                tc, F.concat(F.col(tc), F.lit(" zq"), F.col("__r"))
            )
        # SINGLE-FILE layout, exactly like the driver's fixtures: the
        # streaming sources glob "<t>.parquet" as a file, and the
        # one-partition scan shape is part of what the suite's
        # adaptive spreads are built for — the x10 dir must not
        # change the layout contract, only the volume
        tmp = os.path.join(dst, f"__{t}_tmp")
        out.drop("__r").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        assert len(part) == 1, part
        final = os.path.join(dst, f"{t}.parquet")
        if os.path.isdir(final):
            import shutil

            shutil.rmtree(final)
        os.replace(os.path.join(tmp, part[0]), final)
        import shutil

        shutil.rmtree(tmp)
        n0, n1 = df.count(), spark.read.parquet(final).count()
        assert n1 == k * n0, (t, n0, n1)
        print(f"{t}: {n0} -> {n1} rows")


if __name__ == "__main__":
    main()
