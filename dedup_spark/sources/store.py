"""StageStore: idempotent stage tables + lineage + per-partition metrics
(SURVEY.md §2 B4/B5/B38, §7.2).

Two backends behind one interface:

- ``IcebergStore``: ``df.writeTo(catalog.ns.table).createOrReplace()`` with
  the committed snapshot-id recorded in lineage — used when the session has
  the Iceberg extension (session.iceberg_available). This is the north-rule
  deployment path (BASELINE.json:14 "checkpoints ... to Iceberg").
- ``ParquetStore``: directory-per-table with an atomically renamed
  ``manifest.json`` AFTER a successful parquet commit — the sandbox fallback
  (no Iceberg jar on disk, SURVEY.md §7.0). A stage is "done" iff its
  manifest exists and its config fingerprint matches.

Both record lineage rows (stage, run_id, fingerprint, status, rows) and
per-partition metrics (stage, partition_id, rows) — metrics are computed
from the MATERIALIZED output via spark_partition_id so they cost one cheap
scan of already-columnar data, never a recompute of the stage.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Stage commits may run on a small thread pool (plans.pipeline runs leaf
# diagnostic stages concurrently with the main chain); the only shared
# mutable file is the lineage log, so serialize appends to it.
_LINEAGE_LOCK = threading.Lock()


@dataclass
class StageResult:
    name: str
    rows: int
    skipped: bool
    seconds: float = 0.0


class ParquetStore:
    def __init__(self, root: str, run_id: str, fingerprint: str):
        self.root = root
        self.run_id = run_id
        self.fingerprint = fingerprint
        os.makedirs(root, exist_ok=True)

    # --- paths ---
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.manifest.json")

    # --- stage lifecycle ---
    def is_done(self, name: str) -> bool:
        mf = self._manifest(name)
        if not os.path.exists(mf):
            return False
        with open(mf) as f:
            m = json.load(f)
        return (
            m.get("fingerprint") == self.fingerprint
            and m.get("run_id") == self.run_id
            and m.get("status") == "done"
        )

    def write(self, name: str, df: DataFrame,
              census: tuple | None = None) -> StageResult:
        """Materialize a stage idempotently; returns rows written.

        ``census=(census_name, fn)`` records ``fn(committed_df, rows)`` into
        t_metrics BEFORE the manifest rename (ADVICE r4): "done" therefore
        implies census-present, so a driver crash between the data commit and
        the census can never leave a resumable stage whose approximation
        accounting is permanently missing."""
        path = self._table_dir(name)
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        out = spark.read.parquet(path)
        rows = self._write_metrics(name, out)
        if census is not None:
            cname, fn = census
            self.record_census(cname, fn(out, rows), spark)
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "fingerprint": self.fingerprint,
            "status": "done",
            "rows": rows,
        }
        # atomic rename so a crash mid-write can never look "done"
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest(name))
        self._append_lineage(manifest)
        return StageResult(name, rows, skipped=False)

    def manifest_rows(self, name: str) -> int:
        """Committed row count of a done stage (from its manifest)."""
        with open(self._manifest(name)) as f:
            return int(json.load(f).get("rows", -1))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._table_dir(name))

    # --- lineage + metrics ---
    def _append_lineage(self, manifest: dict) -> None:
        path = os.path.join(self.root, "t_lineage.jsonl")
        with _LINEAGE_LOCK, open(path, "a") as f:
            f.write(json.dumps(manifest) + "\n")

    def record_census(self, name: str, value: int, spark=None) -> None:
        """One approximation-census row per run into t_metrics (VERDICT r3
        #5): salting loss, verify slack-gate skips, containment skipped
        groups. Logged censuses vanish with the driver; a metrics row
        survives resume/remote runs, so the recall accounting is durable.
        Schema matches the per-partition metrics rows (partition_id -1 marks
        a run-level census)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        stage = f"census_{name}"
        mdir = os.path.join(self.root, "t_metrics")
        if os.path.isdir(self.root):
            os.makedirs(mdir, exist_ok=True)
            tbl = pa.table(
                {
                    "partition_id": pa.array([-1], pa.int32()),
                    "rows_out": pa.array([int(value)], pa.int64()),
                    "stage": pa.array([stage]),
                    "run_id": pa.array([self.run_id]),
                }
            )
            pq.write_table(tbl, os.path.join(mdir, f"{stage}-{self.run_id}.parquet"))
            return
        if spark is None:  # non-local root needs a session to append
            raise ValueError("record_census on a non-local root requires spark")
        spark.createDataFrame(
            [(-1, int(value), stage, self.run_id)],
            "partition_id int, rows_out long, stage string, run_id string",
        ).write.mode("append").parquet(mdir)

    def has_census(self, name: str, spark: SparkSession | None = None) -> bool:
        """Whether this run's census row for ``name`` is already durable.
        Used by the resume path to backfill censuses for stores committed
        by older code, where the manifest could predate the census row
        (ADVICE r4 crash window — closed going forward by write() ordering)."""
        stage = f"census_{name}"
        mdir = os.path.join(self.root, "t_metrics")
        if os.path.isdir(self.root):
            return os.path.exists(
                os.path.join(mdir, f"{stage}-{self.run_id}.parquet")
            )
        if spark is None:
            return False
        try:
            return bool(
                spark.read.parquet(mdir)
                .where(
                    (F.col("stage") == stage) & (F.col("run_id") == self.run_id)
                )
                .limit(1)
                .count()
            )
        except Exception:
            return False

    def lineage(self) -> list[dict]:
        path = os.path.join(self.root, "t_lineage.jsonl")
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _write_metrics(self, name: str, out: DataFrame) -> int:
        """Per-partition metrics + total rows from the committed parquet
        FOOTERS — driver-side file metadata reads, zero Spark jobs. A
        metrics job per stage (~1-2s each) was a large share of the
        pipeline's fixed overhead; the footers carry the same per-file
        (= per-partition) row counts the job would compute.

        The footer fast path only works when the store root is a LOCAL
        directory; for object-store roots (--store-root s3://…) the glob
        would silently return nothing and record rows=0, so fall back to
        the Spark-side aggregate used by IcebergStore."""
        import glob as _glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        tdir = self._table_dir(name)
        if not os.path.isdir(tdir):
            return self._spark_metrics(name, out)
        files = sorted(
            f
            for f in _glob.glob(os.path.join(tdir, "part-*"))
            if not f.endswith(".crc")
        )
        rows = [pq.read_metadata(f).num_rows for f in files]
        tbl = pa.table(
            {
                "partition_id": pa.array(range(len(rows)), pa.int32()),
                "rows_out": pa.array(rows, pa.int64()),
                "stage": pa.array([name] * len(rows)),
                "run_id": pa.array([self.run_id] * len(rows)),
            }
        )
        mdir = os.path.join(self.root, "t_metrics")
        os.makedirs(mdir, exist_ok=True)
        pq.write_table(tbl, os.path.join(mdir, f"{name}-{self.run_id}.parquet"))
        return int(sum(rows))

    def _spark_metrics(self, name: str, out: DataFrame) -> int:
        """One Spark aggregate over the committed table — works on any
        filesystem (the fallback for non-local roots and Iceberg)."""
        m = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows_out"))
            .withColumn("stage", F.lit(name))
            .withColumn("run_id", F.lit(self.run_id))
        ).cache()
        m.write.mode("append").parquet(os.path.join(self.root, "t_metrics"))
        total = m.agg(F.sum("rows_out")).collect()[0][0] or 0
        m.unpersist()
        return int(total)

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "t_metrics"))


class IcebergStore(ParquetStore):
    """Iceberg-backed variant: stage tables become real Iceberg tables.

    Inherits manifest/lineage bookkeeping; the data path switches to
    ``writeTo().createOrReplace()`` so every stage commit is an Iceberg
    snapshot (atomic, time-travelable). Only usable when the session has the
    Iceberg runtime (not this sandbox — SURVEY.md §7.0)."""

    def __init__(self, catalog_ns: str, root: str, run_id: str, fingerprint: str):
        super().__init__(root, run_id, fingerprint)
        self.catalog_ns = catalog_ns

    def write(self, name: str, df: DataFrame,
              census: tuple | None = None) -> StageResult:
        tbl = f"{self.catalog_ns}.{name}"
        df.writeTo(tbl).createOrReplace()
        spark = df.sparkSession
        out = spark.read.table(tbl)
        rows = self._write_metrics(name, out)
        if census is not None:  # same census-before-manifest contract
            cname, fn = census
            self.record_census(cname, fn(out, rows), spark)
        manifest = {
            "stage": name,
            "run_id": self.run_id,
            "fingerprint": self.fingerprint,
            "status": "done",
            "rows": rows,
            "table": tbl,
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest(name))
        self._append_lineage(manifest)
        return StageResult(name, rows, skipped=False)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.table(f"{self.catalog_ns}.{name}")

    def _write_metrics(self, name: str, out: DataFrame) -> int:
        """Iceberg tables have no local part-files; compute the partition
        metrics with one Spark aggregate over the committed snapshot."""
        return self._spark_metrics(name, out)


def make_store(
    spark: SparkSession, root: str, run_id: str | None, fingerprint: str
) -> ParquetStore:
    from dedup_spark.session import iceberg_available

    run_id = run_id or uuid.uuid4().hex[:12]
    if iceberg_available(spark):
        return IcebergStore("dedup", root, run_id, fingerprint)
    return ParquetStore(root, run_id, fingerprint)
