"""The sensor lake: persistent table layout + write path (operators
B4/B5, X-dedup, X-vac).

Layout mirrors the reference's proven ClickHouse shape
(src/storage/clickhouse/migrations/20240223133248_init.sql:34-41):

* ``sensors/`` — small dimension table (the upsert target; the
  reference's dimension get-or-create caches, sqlite_utilities.rs:9-270,
  become one MERGE-style rewrite of a tiny table);
* ``<type>_values/`` — 8 narrow tall fact tables ``(sensor_id, time,
  value)`` **partitioned by month(time)** — the analogue of ClickHouse
  ``PARTITION BY toYYYYMM(timestamp_us)``; time-range queries prune
  whole month directories before any IO;
* dictionary tables are NOT ported: Parquet dictionary encoding + the
  labels MAP column subsume them (docs/DATAMODEL.md:168-178).

This build targets plain Parquet (no Delta in the container). On a real
deployment the sensors upsert is a Delta ``MERGE INTO`` and
``optimize``/``dedup_rewrite`` are ``OPTIMIZE ZORDER BY (sensor_id,
time)`` / ``DELETE`` — the call sites are the same; only the atomic-swap
mechanics differ (documented per method).
"""

from __future__ import annotations

import contextlib
import datetime as dt
import os
import shutil
import time
import uuid as uuid_mod

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensapp_spark.datamodel.types import (
    SENSOR_SCHEMA,
    SensorType,
    value_schema,
    value_table_name,
)
from sensapp_spark.ingest.csv_importer import IngestBatch

MONTH_COL = "month"


class SensorLake:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths -------------------------------------------------------------

    def _sensors_path(self) -> str:
        return os.path.join(self.root, "sensors")

    def _values_path(self, stype: SensorType) -> str:
        return os.path.join(self.root, value_table_name(stype))

    # -- write path (B4/B5) --------------------------------------------------

    def publish(self, batch: IngestBatch) -> None:
        """One reference 'transaction': upsert the sensors dimension, then
        append the typed value frames (reference storage.rs:69-77 wraps
        both in one SQL txn; Parquet appends are atomic per-file, the
        dimension swap is atomic per-directory — Delta gives real ACID)."""
        self.upsert_sensors(batch.sensors)
        for stype, df in batch.values.items():
            self.append_values(stype, df)

    def upsert_sensors(self, sensors: DataFrame) -> None:
        """MERGE-by-rewrite: the dimension is small (≤ millions), so a
        dedup-union rewrite is cheap; the deterministic UUID is the merge
        key — re-publishing a sensor is a no-op (Delta: MERGE INTO).

        The read→union→swap is guarded by a directory lock so two
        concurrent publishers can't each read the old dimension and
        have one's sensors vanish in the other's rewrite (lost update).
        The lock is a local-filesystem ``mkdir`` — correct for this
        build's single-host lake; on object storage the real fix is the
        documented Delta ``MERGE INTO``, which serializes via the table
        log instead."""
        path = self._sensors_path()
        with self._dir_lock(path):
            # sensors() resolves the committed version (or an empty
            # frame before the first commit), so the merge is uniform.
            merged = (
                self.sensors()
                .unionByName(sensors)
                .dropDuplicates(["sensor_id"])
            )
            self._atomic_overwrite(merged, path)

    def append_values(self, stype: SensorType, df: DataFrame) -> None:
        # Replicate the reference's publisher policy: non-finite floats
        # (NaN/±Inf) are silently dropped at write time
        # (src/storage/sqlite/sqlite_publishers.rs:63-66 — SURVEY §7.4
        # risk 5, decided as replicate-for-parity so cross-engine row
        # counts diff clean). NULL samples passing through is an
        # intentional EXTENSION beyond the reference: its Sample<f64>
        # cannot represent NULL and float_values.value is NOT NULL, so
        # the reference can never contain NULL float rows — we choose
        # to keep them (a blank CSV cell casts to NULL) rather than
        # drop data. The explicit isNull arm is what keeps them: a
        # bare NaN predicate evaluates to NULL on NULL input and would
        # silently drop the row. Typed columns other than FLOAT cannot
        # carry non-finite values.
        if stype is SensorType.FLOAT:
            df = df.filter(
                F.col("value").isNull()
                | (~F.isnan("value") & (F.abs("value") != float("inf")))
            )
        (
            df.withColumn(MONTH_COL, F.date_format("time", "yyyy-MM"))
            .write.partitionBy(MONTH_COL)
            .mode("append")
            .parquet(self._append_dir(self._values_path(stype)))
        )

    def _append_dir(self, path: str) -> str:
        """The directory appends land in: the table's current committed
        version. Appends are new uniquely-named part files, so they are
        safe against OTHER APPENDS with no lock. Against a concurrent
        MAINTENANCE REWRITE (dedup_rewrite/optimize) the same caveat as
        the pre-pointer layout applies — and it is dedup_rewrite's
        documented contract: an append landing during the rewrite
        window was read neither by the rewrite nor retained past
        pruning, so run maintenance in a window without active
        publishers (a transaction-log table format is what closes this
        for real). Only the FIRST append on a brand new table takes the
        lock, to create version 1 + pointer exactly once (two unlocked
        creators would each flip the pointer and orphan the loser's
        files)."""
        data = resolve_table(path)
        if data is not None:
            return data
        with dir_lock(path):
            data = resolve_table(path)
            if data is not None:
                return data
            os.makedirs(path, exist_ok=True)
            version = _next_version(path)
            os.makedirs(os.path.join(path, version))
            tmp = os.path.join(path, f".ptr_{uuid_mod.uuid4().hex[:8]}")
            with open(tmp, "w") as f:
                f.write(version)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(path, CURRENT_PTR))
            return os.path.join(path, version)

    # -- read path -----------------------------------------------------------

    def sensors(self) -> DataFrame:
        data = resolve_table(self._sensors_path())
        if data is None:
            return self.spark.createDataFrame([], SENSOR_SCHEMA)
        # Explicit schema for the same reason as values(): no footer
        # inference, no race against a concurrent dimension rewrite.
        return self.spark.read.schema(SENSOR_SCHEMA).parquet(data)

    def values(
        self,
        stype: SensorType,
        start: dt.datetime | None = None,
        end: dt.datetime | None = None,
    ) -> DataFrame:
        """Typed scan with month-partition pruning derived from the time
        range: the ``month`` predicate prunes directories at planning
        time; the ``time`` predicate pushes into the row-group reader."""
        data = resolve_table(self._values_path(stype))
        schema = value_schema(stype).add(MONTH_COL, "string")
        if data is None:
            return self.spark.createDataFrame([], schema)
        # Explicit schema: the table's layout is known, so nothing is
        # inferred from footers — a scan planned while a concurrent
        # publish is materializing the directory (streaming ingest polls
        # do this) sees an empty-but-valid frame instead of an
        # UNABLE_TO_INFER_SCHEMA race, and the driver skips the footer
        # sampling entirely (one less metadata pass on wide tables).
        df = self.spark.read.schema(schema).parquet(data)
        if start is not None:
            df = df.filter(F.col(MONTH_COL) >= start.strftime("%Y-%m"))
            df = df.filter(F.col("time") >= F.lit(start))
        if end is not None:
            df = df.filter(F.col(MONTH_COL) <= end.strftime("%Y-%m"))
            df = df.filter(F.col("time") <= F.lit(end))
        return df

    # -- admin ops (X-dedup, X-vac) ------------------------------------------

    def dedup_rewrite(self, stype: SensorType) -> None:
        """Offline dedupe: drop duplicate (sensor_id, time, value) rows —
        the distributed rewrite of reference storage.rs:632-661 (DELETE
        keeping MIN(rowid) + VACUUM).

        Serialized against other maintenance rewrites of this table via
        the directory lock. An append landing DURING the rewrite window
        is still lost (read happened before the appended file existed) —
        that read-vs-append race is exactly what a transaction-log table
        format closes (Delta OPTIMIZE commits against the log); run
        vacuum in a maintenance window on the plain-parquet build."""
        path = self._values_path(stype)
        if resolve_table(path) is None:
            return
        with self._dir_lock(path):
            deduped = (
                self.spark.read.parquet(resolve_table(path))
                .dropDuplicates(["sensor_id", "time", "value"])
            )
            self._atomic_overwrite(deduped, path, partition_by=MONTH_COL)

    def optimize(self, stype: SensorType, files_per_month: int = 1) -> None:
        """Compaction: rewrite each month partition into ``files_per_month``
        files sorted by (sensor_id, time) — the analogue of ClickHouse
        OPTIMIZE / Delta ZORDER clustering (clickhouse init.sql:40)."""
        path = self._values_path(stype)
        if resolve_table(path) is None:
            return
        with self._dir_lock(path):
            compacted = (
                self.spark.read.parquet(resolve_table(path))
                .repartition(files_per_month, F.col(MONTH_COL))
                .sortWithinPartitions("sensor_id", "time")
            )
            self._atomic_overwrite(compacted, path, partition_by=MONTH_COL)

    # -- materialized catalog (C1/C2 snapshot) -------------------------------

    def materialize_catalog(self) -> None:
        """ClickHouse ``AggregatingMergeTree`` MV analogue (reference
        clickhouse init.sql:121-146, SURVEY §7.3): snapshot the C1
        metrics-summary and C2 sensor-catalog views as parquet tables,
        swapped atomically under the maintenance lock. The gateway's
        /metrics and /series recompute-on-read by default (the
        dimension is small and broadcast); a deployment whose dimension
        outgrows that points the catalog reads at these snapshots and
        refreshes on publish cadence — same freshness contract as the
        reference's MV, which also lags until the merge runs."""
        from sensapp_spark.operators.catalog import (
            metrics_summary,
            sensor_catalog,
        )

        metrics_path = os.path.join(self.root, "catalog_metrics")
        sensors_path = os.path.join(self.root, "catalog_sensors")
        with self._dir_lock(os.path.join(self.root, "catalog")):
            self._atomic_overwrite(metrics_summary(self.sensors()),
                                   metrics_path)
            self._atomic_overwrite(sensor_catalog(self.sensors()),
                                   sensors_path)

    def catalog_metrics(self) -> DataFrame | None:
        """The materialized C1 view, or None if never materialized."""
        data = resolve_table(os.path.join(self.root, "catalog_metrics"))
        if data is None:
            return None
        return self.spark.read.parquet(data)

    def catalog_sensors(self) -> DataFrame | None:
        """The materialized C2 view, or None if never materialized."""
        data = resolve_table(os.path.join(self.root, "catalog_sensors"))
        if data is None:
            return None
        return self.spark.read.parquet(data)

    # -- internals -----------------------------------------------------------

    def _dir_lock(self, path: str, timeout: float = 30.0):
        return dir_lock(path, timeout)

    def _atomic_overwrite(
        self, df: DataFrame, path: str, partition_by: str | None = None
    ) -> None:
        atomic_overwrite(df, path, partition_by)


@contextlib.contextmanager
def dir_lock(path: str, timeout: float = 30.0):
    """Exclusive advisory lock on a table directory via kernel
    ``flock`` on a sibling lock file. (Module-level: shared by the
    sensor lake and the ANN index store.)

    The kernel is the single source of truth: exactly one open file
    description holds LOCK_EX at a time (two fds conflict even
    within one process), a crashed or killed holder's lock is
    RELEASED BY THE KERNEL automatically, and there is consequently
    no staleness heuristic, no liveness probe, and no break
    protocol to race on — the failure modes of every
    mkdir/PID-file scheme (mtime-based breaks voiding a live
    holder's exclusion; rename/rmdir TOCTOU letting two breakers
    in) structurally cannot occur. A long-running rewrite keeps its
    lock for exactly as long as its process lives. Waiting past
    ``timeout`` on a live holder raises instead of silently
    proceeding unserialized. Single-host lake contract: flock is
    per-kernel, and plain-parquet swap-rewrites are only safe on
    one host anyway (object storage → Delta's transaction log)."""
    import fcntl

    lock_path = f"{path}.lock"
    fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"could not acquire lake lock {lock_path} "
                        f"within {timeout}s — held by a live process"
                    ) from None
                time.sleep(0.05)
        yield
    finally:
        # Closing the fd releases the lock (kernel-guaranteed); the
        # empty lock file itself is inert and left in place.
        os.close(fd)


CURRENT_PTR = "_CURRENT"


def resolve_table(path: str) -> str | None:
    """The directory holding the table's LIVE data files.

    Versioned layout (what :func:`atomic_overwrite` writes): ``path``
    contains immutable ``v_<seq>_<rand>/`` data directories plus a
    ``_CURRENT`` pointer file naming the committed one — read the
    pointer, return that version dir. Falls back to ``path`` itself for
    a legacy flat directory (pre-pointer lakes keep working), and
    ``None`` when the table has never been written."""
    ptr = os.path.join(path, CURRENT_PTR)
    if os.path.exists(ptr):
        with open(ptr) as f:
            return os.path.join(path, f.read().strip())
    if os.path.isdir(path):
        # Legacy only if actual data entries exist: a table dir holding
        # just uncommitted version dirs / pointer temps (a first commit
        # in flight) reads as "never written", not as an empty legacy
        # table.
        legacy = [
            d for d in os.listdir(path)
            if not (d.startswith(".") or d.startswith("v_")
                    or d == CURRENT_PTR)
        ]
        if legacy:
            return path
    return None


def _next_version(path: str) -> str:
    """Monotonic version-dir name: zero-padded sequence (so lexicographic
    sort is commit order) + random suffix (so a crashed writer's
    half-written dir can never collide with a retry's)."""
    seq = 0
    if os.path.isdir(path):
        for d in os.listdir(path):
            if d.startswith("v_"):
                try:
                    seq = max(seq, int(d.split("_")[1]))
                except (IndexError, ValueError):
                    pass
    return f"v_{seq + 1:08d}_{uuid_mod.uuid4().hex[:8]}"


def _prune_versions(path: str, current: str, prev: str | None) -> None:
    """Keep the just-committed ``current`` plus ``prev`` — the version
    the pointer named immediately before the flip, i.e. the exact
    COMMITTED predecessor in-flight readers may still hold (one
    generation of grace); drop every other ``v_`` dir.

    Anchoring on the recorded pointer value rather than "the newest
    two names" matters: a crashed writer's never-committed version dir
    can sort anywhere relative to the committed ones, and counting it
    toward a name-ordered keep set would evict the predecessor readers
    still hold while retaining the useless orphan. Orphans are safely
    deleted here because every committer holds the table flock, so at
    commit time no live writer owns any other version dir.

    Once a committed predecessor exists (``prev`` non-None — the same
    grace legacy readers get), a migrated table's pre-pointer flat
    data entries are removed too; otherwise they would linger as a
    permanent stale copy of the table."""
    keep = {current, prev}
    for d in os.listdir(path):
        if d.startswith("v_") and d not in keep:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    if prev is not None:
        for d in os.listdir(path):
            # Everything that is not a version dir, the pointer, or an
            # in-flight pointer temp is legacy data (including Spark's
            # hidden .crc shadows).
            if d.startswith(("v_", ".ptr_")) or d == CURRENT_PTR:
                continue
            full = os.path.join(path, d)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.unlink(full)


def atomic_overwrite(
    df: DataFrame,
    path: str,
    partition_by: str | None = None,
    extra_files: dict[str, bytes] | None = None,
) -> None:
    """Rename-based commit protocol: write a fresh IMMUTABLE version
    directory under the table path, then atomically repoint the
    ``_CURRENT`` pointer file at it (``os.replace`` of a fsynced temp
    file — readers observe the old committed version or the new one,
    never a partial state).

    This replaces the earlier double-rename directory swap, which had
    two single-host races the pointer protocol closes: (1) a moment
    with NO directory at ``path`` between the two renames, and (2) the
    old directory was rmtree'd immediately, so a reader mid-scan of the
    old files crashed. Here a committed version dir is never mutated,
    and the PREVIOUS version is retained through the next commit (one
    full generation of grace for in-flight readers) before pruning.

    Multi-host honesty: ``os.replace`` is atomic on POSIX filesystems
    (including NFSv4 renames within a directory), so cross-host READERS
    are safe; concurrent cross-host WRITERS still need the flock (per
    kernel) or a real transaction log (Delta/Iceberg — the documented
    deployment mapping) to avoid lost read-merge-write updates. Same
    contract the reference delegates to its database transaction
    (src/storage/sqlite/storage.rs:69-77).

    ``extra_files`` land INSIDE the version dir before the pointer
    flip, so table-level metadata (e.g. an ANN index's codebook)
    commits atomically WITH its data — a reader resolving the pointer
    once can never pair one version's data with another's metadata.
    Names must start with ``_`` or ``.`` so Spark's scan treats them
    as hidden (like ``_SUCCESS``)."""
    os.makedirs(path, exist_ok=True)
    # The pointer's CURRENT value is the committed predecessor that
    # pruning must retain for in-flight readers — recorded before the
    # flip (name ordering cannot distinguish it from crash orphans).
    prev = None
    ptr = os.path.join(path, CURRENT_PTR)
    if os.path.exists(ptr):
        with open(ptr) as f:
            prev = f.read().strip()
    version = _next_version(path)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(os.path.join(path, version))
    for name, blob in (extra_files or {}).items():
        if not name.startswith(("_", ".")):
            raise ValueError(
                f"extra file {name!r} must start with '_' or '.' so "
                "parquet scans skip it"
            )
        with open(os.path.join(path, version, name), "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
    tmp = os.path.join(path, f".ptr_{uuid_mod.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, CURRENT_PTR))
    _prune_versions(path, version, prev)
