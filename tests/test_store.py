"""sources/store.py — the shared persisted-store lifecycle contract
(one implementation of what d10/d14/d16/e4/e7 hand-rolled)."""

import uuid

import pytest
from pyspark.sql import functions as F

from sparkswift.sources.store import Member, Store, staged_publish


def _two_member(spark, base, catalog=True):
    return Store(
        spark,
        base,
        [
            Member("centers", tiny=True),
            Member("vecs", bucket_cols=("k",), sort_cols=("k",)),
        ],
        catalog=catalog,
        num_buckets=4,
        label="test store",
    )


def test_store_exists_all_or_nothing_catalog(spark):
    base = f"st_ct_{uuid.uuid4().hex[:8]}"
    st = _two_member(spark, base)
    try:
        assert st.exists() is False
        st.write_members(
            {
                "vecs": spark.createDataFrame([(1, 2.0)], "k int, x double"),
                "centers": spark.createDataFrame([(0, 1.0)], "c int, y double"),
            }
        )
        assert st.exists() is True
        assert st.read("vecs").count() == 1
        spark.sql(f"DROP TABLE {base}_vecs")  # tear the pair
        with pytest.raises(RuntimeError, match="half-written"):
            st.exists()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}_vecs")
        spark.sql(f"DROP TABLE IF EXISTS {base}_centers")


def test_store_write_members_orders_tiny_last(spark):
    """The marker (tiny) member must be written LAST regardless of
    dict order, so a crash mid-build is always detectable as torn."""
    base = f"st_ord_{uuid.uuid4().hex[:8]}"
    st = _two_member(spark, base)
    written = []
    orig = st.append

    def spy(key, df):
        written.append(key)
        orig(key, df)

    st.append = spy
    try:
        st.write_members(
            {
                "centers": spark.createDataFrame([(0,)], "c int"),
                "vecs": spark.createDataFrame([(1,)], "k int"),
            }
        )
        assert written == ["vecs", "centers"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}_vecs")
        spark.sql(f"DROP TABLE IF EXISTS {base}_centers")


def test_store_path_mode_and_single_member(spark, tmp_path):
    base = str(tmp_path / "fp_store")
    st = Store(spark, base, [Member("")], catalog=False, label="fp store")
    assert st.exists() is False
    st.append("", spark.createDataFrame([("a",)], "fp string"))
    assert st.exists() is True
    st.append("", spark.createDataFrame([("b",)], "fp string"))
    assert st.read("").count() == 2
    # path compact: rewrites to target-sized files, rows preserved
    summary = st.compact("", target_file_bytes=10**9)
    assert st.read("").count() == 2
    assert summary["files_after"] <= summary["files_before"]


def test_store_bucketed_append_preserves_bucketing(spark):
    """Catalog bucketed members: appends land pre-bucketed, so a join
    on the bucket key stays exchange-free on the store side."""
    base = f"st_bk_{uuid.uuid4().hex[:8]}"
    st = Store(
        spark,
        base,
        [Member("", bucket_cols=("fp",), sort_cols=("fp",))],
        catalog=True,
        num_buckets=4,
        label="fp store",
    )
    try:
        for batch in range(2):
            st.append(
                "",
                spark.createDataFrame(
                    [(f"h{batch}_{i}",) for i in range(20)], "fp string"
                ),
            )
        t = st.read("")
        assert t.count() == 40
        probe = spark.createDataFrame([("h0_3",), ("zz",)], "fp string")
        plan = (
            t.join(probe.hint("shuffle_hash"), "fp")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the store side scans bucketed — no Exchange directly above it
        assert "Bucketed: true" in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_staged_publish_atomic(spark, tmp_path):
    import os

    target = str(tmp_path / "idx")
    with staged_publish(spark, target) as tmp:
        spark.range(5).write.parquet(f"{tmp}/part")
        assert not os.path.exists(target)  # nothing visible mid-build
    assert spark.read.parquet(f"{target}/part").count() == 5
    assert not os.path.exists(target + ".__building__")

    # a failing build must leave NO partial target and NO staging
    with pytest.raises(ValueError, match="boom"):
        with staged_publish(spark, str(tmp_path / "idx2")) as tmp:
            spark.range(1).write.parquet(f"{tmp}/part")
            raise ValueError("boom")
    assert not os.path.exists(str(tmp_path / "idx2"))
    assert not os.path.exists(str(tmp_path / "idx2") + ".__building__")
