"""Persisted-store lifecycle — ONE implementation of the contract
every incremental operator previously hand-rolled (the r9 verdict's
factoring ask): d10's fingerprint store, d14's near-dup sig/bucket
pair, d16's SemDeDup centers/vecs pair, and the e4/e7 index builds'
staged atomic publish.

The contract:

* **Existence is ALL-OR-NOTHING across a store's members.** A torn
  state (some members present, some absent — a prior batch died
  between its member writes) RAISES instead of silently
  re-bootstrapping: probing only one member would classify a
  half-written store as "no store yet", recreate the missing member,
  and make every earlier winner permanently invisible to the
  cross-batch probe — duplicates re-enter with no error (the d14
  lesson, ADVICE r8). Mid-append torn writes on later batches are out
  of scope for an existence check; that needs a transactional table
  format.
* **Members are catalog tables or path datasets.** Catalog members
  may be BUCKETED — the store side of every probe join then reads
  shuffle-free forever; appends land pre-bucketed, preserving the
  property. Path existence is read-and-catch (ADVICE r5: an
  ``os.path.isdir`` probe only sees the driver-local filesystem, so
  on HDFS/S3 it would silently treat a real store as absent).
* **Builds write DATA members first, MARKER members last**
  (``write_members`` orders ``tiny`` members after the rest), so a
  crash between writes always leaves a state the paired check
  detects.
* **Path indexes publish atomically** (:func:`staged_publish`):
  build into ``<path>.__building__``, one filesystem rename — a
  crashed build can never leave a partial directory where callers
  probe for a complete index.
* **Compaction** routes to the right maintenance pass per member
  kind (bucketed catalog table vs path dataset).
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Member:
    """One named member of a persisted store.

    ``key`` — member suffix: catalog table ``<base>_<key>``, path
    dataset ``<base>/<key>``; the empty string names a single-member
    store living AT ``base``. ``bucket_cols``/``sort_cols`` make a
    catalog member bucketed. ``tiny`` marks a marker-sized member
    (coalesce(1), OVERWRITE on write — e.g. frozen k-means centers):
    ``write_members`` writes it last so its existence certifies a
    complete build.
    """

    key: str
    bucket_cols: tuple[str, ...] | None = None
    sort_cols: tuple[str, ...] | None = None
    tiny: bool = False


class Store:
    """A persisted multi-member store (catalog- or path-backed)."""

    def __init__(
        self,
        spark: SparkSession,
        base: str,
        members: list[Member],
        catalog: bool = True,
        num_buckets: int = 256,
        label: str = "store",
    ) -> None:
        self.spark = spark
        self.base = base
        self.members = {m.key: m for m in members}
        self.catalog = catalog
        self.num_buckets = num_buckets
        self.label = label

    # -- naming ---------------------------------------------------------
    def table_name(self, key: str = "") -> str:
        return f"{self.base}_{key}" if key else self.base

    def path(self, key: str = "") -> str:
        return f"{self.base}/{key}" if key else self.base

    # -- existence ------------------------------------------------------
    def _read_path(self, key: str) -> DataFrame | None:
        from pyspark.errors import AnalysisException

        try:
            return self.spark.read.parquet(self.path(key))
        except AnalysisException:
            return None

    def exists(self) -> bool:
        """True iff EVERY member exists; False iff NONE does; raises
        RuntimeError on a torn (mixed) state."""
        if self.catalog:
            have = {
                k: self.spark.catalog.tableExists(self.table_name(k))
                for k in self.members
            }
        else:
            have = {k: self._read_path(k) is not None for k in self.members}
        states = set(have.values())
        if len(states) > 1:
            detail = ", ".join(
                f"{k or 'root'}={'present' if v else 'absent'}"
                for k, v in sorted(have.items())
            )
            raise RuntimeError(
                f"{self.label} '{self.base}' is half-written ({detail}); "
                "a prior batch failed between its member writes. Repair "
                "or remove the surviving members before re-ingesting."
            )
        return states.pop()

    # -- IO ---------------------------------------------------------------
    def read(self, key: str = "") -> DataFrame:
        """Read one member (catalog table or path dataset). Always a
        FRESH read — a frame cached from the ``exists()`` probe would
        pin that moment's file listing and silently miss later
        appends."""
        if self.catalog:
            return self.spark.table(self.table_name(key))
        return self.spark.read.parquet(self.path(key))

    def append(self, key: str, df: DataFrame) -> None:
        """Append one member's rows. Bucketed members land pre-bucketed
        (the insert pays the one shuffle; every probe join skips it
        forever); ``tiny`` members OVERWRITE as a single file."""
        m = self.members[key]
        if not self.catalog:
            if m.tiny:  # marker members OVERWRITE on every write
                df.coalesce(1).write.mode("overwrite").parquet(self.path(key))
            else:
                df.write.mode("append").parquet(self.path(key))
            return
        if m.bucket_cols:
            from sparkswift.sources.writers import write_bucketed

            write_bucketed(
                df,
                self.table_name(key),
                list(m.bucket_cols),
                num_buckets=self.num_buckets,
                sort_cols=list(m.sort_cols) if m.sort_cols else None,
                mode="append",
            )
        elif m.tiny:
            df.coalesce(1).write.mode("overwrite").saveAsTable(
                self.table_name(key)
            )
        else:
            df.write.mode("append").saveAsTable(self.table_name(key))

    def write_members(self, writes: dict[str, DataFrame]) -> None:
        """Write several members in crash-detectable order: data
        members first, ``tiny`` marker members LAST — a failure
        between writes leaves a torn state ``exists()`` raises on,
        never a silently complete-looking store."""
        for key in sorted(writes, key=lambda k: self.members[k].tiny):
            self.append(key, writes[key])

    def compact(self, key: str = "", **kwargs) -> dict:
        """Small-file maintenance for one member: bucketed catalog
        members re-bucket per-bucket files (bucketing preserved);
        path members rewrite to target-sized files."""
        m = self.members[key]
        if self.catalog:
            if not m.bucket_cols:
                raise ValueError(
                    "compact() on a catalog store supports bucketed "
                    f"members only (member {key!r} is not bucketed)"
                )
            from sparkswift.sources.writers import compact_bucketed_table

            return compact_bucketed_table(self.spark, self.table_name(key))
        from sparkswift.sources.writers import compact_dataset

        return compact_dataset(self.spark, self.path(key), **kwargs)


@contextmanager
def staged_publish(spark: SparkSession, path: str):
    """Atomic index/dataset publish: build into ``<path>.__building__``,
    then a single rename to ``<path>`` — a crashed or interrupted
    build can never leave a PARTIAL directory where callers probe for
    a complete index (an ivfpq_build killed between the codes and
    codebooks writes used to do exactly that). Routed through the
    Hadoop FileSystem API so it works on whatever filesystem the
    target lives on; same object-store rename caveat as
    compact_dataset."""
    tmp = path.rstrip("/") + ".__building__"
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def hp(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = hp(tmp).getFileSystem(hconf)
    fs.delete(hp(tmp), True)  # clear stale staging from a prior crash
    try:
        yield tmp
    except Exception:
        fs.delete(hp(tmp), True)
        raise
    fs.delete(hp(path), True)  # clear any stale partial target
    if not fs.rename(hp(tmp), hp(path)):
        raise IOError(f"publishing {tmp} -> {path} failed")
