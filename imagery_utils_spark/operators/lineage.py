"""Resumability + lineage/metrics tables.

The reference's incremental semantics are file-existence memoization — skip a
tile/image if its output already exists (/root/reference/pgc_mosaic.py:448-449,
555, 582-583; pgc_ortho.py:351-357). The Spark-native equivalent (north rule):
every stage commits its outputs to a table along with a **lineage row per
completed work unit**; a restarted job anti-joins its work-unit list against
the lineage table and processes only the remainder. On Iceberg this is
snapshot-isolated; in this sandbox the lineage store is an append-only parquet
directory with the same semantics (each commit = one new file = one
"snapshot"; readers see only fully-written files, mirroring snapshot
isolation at the file granularity).

Also provides the per-partition metrics table (A6/A7 analog: counts +
runtime stats rollup, /root/reference/get_runtime_stats.sh:150-188).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "unit_id string, stage string, run_id string, committed_at double, n_rows long"


class LineageStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.lineage_path = os.path.join(path, "lineage")
        self.metrics_path = os.path.join(path, "metrics")

    # ------------------------------------------------------------ lineage
    def completed_units(self, stage: str) -> DataFrame:
        try:
            df = self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_path)
        except Exception:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return df.filter(F.col("stage") == stage)

    def remaining_units(self, units: DataFrame, stage: str, unit_col: str) -> DataFrame:
        """Anti-join restart: drop units already committed for this stage.
        The completed set is tiny relative to the fact table -> broadcast."""
        done = self.completed_units(stage).select(F.col("unit_id"))
        return units.join(
            F.broadcast(done), units[unit_col] == done.unit_id, "left_anti"
        )

    def commit_units(self, stage: str, unit_rows: list[tuple[str, int]],
                     run_id: str | None = None) -> str:
        """Append one lineage row per completed unit (atomic at file level).

        The commit is a DRIVER-side metadata write (pyarrow, one new file per
        commit, os.replace for atomicity) — the same shape as an Iceberg
        snapshot commit, where the manifest write is a driver/catalog
        operation, not a Spark job. Payload is O(units), never data rows.
        A Spark write job for a few hundred bookkeeping rows would pay task
        scheduling + Hadoop ChecksumFS overhead for nothing (measured 3-5 s
        per commit on this host).

        Non-local stores (hdfs://, s3a://, ...) go through the Hadoop FS via
        a Spark write instead — pyarrow/os speak only the driver's local
        filesystem, and a silently-local commit against a remote lineage
        path would defeat resume entirely (every restart would reprocess
        everything)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        run_id = run_id or uuid.uuid4().hex[:12]
        now = time.time()
        scheme = self.lineage_path.split("://", 1)[0] if "://" in self.lineage_path else ""
        if scheme not in ("", "file"):
            df = self.spark.createDataFrame(
                [(u, stage, run_id, now, int(n)) for u, n in unit_rows],
                LINEAGE_SCHEMA)
            df.coalesce(1).write.mode("append").parquet(self.lineage_path)
            return run_id
        table = pa.table({
            "unit_id": pa.array([u for u, _n in unit_rows], pa.string()),
            "stage": pa.array([stage] * len(unit_rows), pa.string()),
            "run_id": pa.array([run_id] * len(unit_rows), pa.string()),
            "committed_at": pa.array([now] * len(unit_rows), pa.float64()),
            "n_rows": pa.array([int(n) for _u, n in unit_rows], pa.int64()),
        })
        local = (self.lineage_path.split("://", 1)[1]
                 if scheme == "file" else self.lineage_path)
        os.makedirs(local, exist_ok=True)
        final = os.path.join(local,
                             f"commit-{int(now * 1000)}-{run_id}.parquet")
        # dot-prefix: Spark's file index skips hidden files, so a crashed
        # half-written temp can never be read as a commit
        tmp = os.path.join(local,
                           f".commit-{int(now * 1000)}-{run_id}.inprogress")
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # readers never see a partial commit
        return run_id

    # ------------------------------------------------------------ metrics
    def record_metrics(self, stage: str, metrics: DataFrame) -> None:
        (
            metrics.withColumn("stage", F.lit(stage))
            .withColumn("recorded_at", F.lit(time.time()))
            .write.mode("append").parquet(self.metrics_path)
        )

    def runtime_stats(self) -> DataFrame:
        """cnt/sum/min/max/median/avg/std rollup of committed runtimes —
        A7 analog (get_runtime_stats.sh)."""
        lin = self.spark.read.schema(LINEAGE_SCHEMA).parquet(self.lineage_path)
        return lin.groupBy("stage", "run_id").agg(
            F.count("*").alias("cnt"),
            F.sum("n_rows").alias("rows_total"),
            F.min("n_rows").alias("rows_min"),
            F.max("n_rows").alias("rows_max"),
            F.expr("percentile(n_rows, 0.5)").alias("rows_median"),
            F.avg("n_rows").alias("rows_avg"),
            F.stddev("n_rows").alias("rows_std"),
        )


def resumable_stage(
    store: LineageStore,
    stage: str,
    units: DataFrame,
    unit_col: str,
    process,
) -> DataFrame:
    """Run ``process(remaining_units_df) -> result_df`` over only the not-yet-
    committed units, then commit per-unit lineage derived from the result.

    ``process`` must produce one or more rows per unit keyed by ``unit_col``.
    """
    todo = store.remaining_units(units, stage, unit_col)
    result = process(todo)
    counts = result.groupBy(unit_col).agg(F.count("*").alias("n")).collect()
    store.commit_units(stage, [(r[unit_col], r["n"]) for r in counts])
    return result


def snapshot_diff(old: DataFrame, new: DataFrame, key_col: str,
                  content_cols: list[str]) -> DataFrame:
    """Incremental snapshot diff: (key, status, old_sha, new_sha) with
    status in {added, removed, changed} — unchanged rows are dropped.

    This is the scan side of checkpoint-resumable incremental
    processing (the north rule's Iceberg-snapshot story): downstream
    stages re-run only for keys this diff emits. Content identity is
    the sha256 of the '|'-joined content columns; comparison is ONE
    full outer join on the key — both sides shuffle once on the same
    key, and at 10^12 rows the join co-partitions (bucketed/zordered
    layouts keep it exchange-free). Pure column algebra, no Python.
    """
    def _sig(df: DataFrame, out: str) -> DataFrame:
        sig = F.sha2(F.concat_ws("|", *[F.col(c) for c in content_cols]),
                     256)
        return df.select(F.col(key_col).alias("key"), sig.alias(out))

    o = _sig(old, "old_sha")
    n = _sig(new, "new_sha")
    j = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("old_sha").isNull(), F.lit("added"))
        .when(F.col("new_sha").isNull(), F.lit("removed"))
        .when(F.col("old_sha") != F.col("new_sha"), F.lit("changed"))
    )
    return (j.select("key", status.alias("status"), "old_sha", "new_sha")
            .filter(F.col("status").isNotNull()))
