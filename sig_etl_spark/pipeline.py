"""E→T→M pipeline runner with materialized stage checkpoints.

Re-expresses the reference's driver contract (SURVEY §3):

- every stage writes a checkpoint the next stage (or a later re-entry)
  reads back — parquet canonical, CSV export optional for the
  eyeball-review workflow the reference's staged CSVs serve
  (/root/reference/templates/template_script.py:28-46,115-147);
- any stage can run standalone from the previous stage's checkpoint
  (stage re-entry, /root/reference/templates/template_script.py:149-199);
- output naming follows the reference's contract
  ``{base}{Stage}-{timestamp}`` (/root/reference/national/_1034/
  __main__.py:94-121 — 'Ratings-Extract', 'Ratings-Matched', ...).

Stage functions are plain ``(spark, DataFrame | None) -> DataFrame``
callables; within a stage the plan stays lazy and Catalyst-optimized —
the checkpoint is the only materialization boundary.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

STAGES = ("extract", "transform", "match")
_STAGE_DIRS = {
    "extract": "EXTRACT_FILES",
    "transform": "TRANSFORMED_FILES",
    "match": "MATCHED_FILES",
}
_STAGE_LABELS = {
    "extract": "Extract",
    "transform": "Transformed",
    "match": "Matched",
}

StageFn = Callable[[SparkSession, DataFrame | None], DataFrame]


@dataclass
class Pipeline:
    spark: SparkSession
    workdir: str
    base_name: str  # e.g. "2024_NA_NRAPVF_Ratings-"
    stages: dict[str, StageFn] = field(default_factory=dict)
    csv_export: bool = False

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, _STAGE_DIRS[stage])

    def checkpoint_path(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "latest.parquet")

    def _export_name(self, stage: str) -> str:
        ts = datetime.now(timezone.utc).strftime("%Y-%m-%d-%H%M%S")
        return f"{self.base_name}{_STAGE_LABELS[stage]}-{ts}.csv"

    def run(
        self, from_stage: str = "extract", to_stage: str = "match"
    ) -> DataFrame:
        """Run [from_stage .. to_stage]; a mid-pipeline start reads the
        previous stage's checkpoint (stage re-entry)."""
        if from_stage not in STAGES or to_stage not in STAGES:
            raise ValueError(f"stages must be in {STAGES}")
        i0, i1 = STAGES.index(from_stage), STAGES.index(to_stage)
        if i0 > i1:
            raise ValueError("from_stage is after to_stage")

        df: DataFrame | None = None
        if i0 > 0:
            df = self.spark.read.parquet(self.checkpoint_path(STAGES[i0 - 1]))
        for stage in STAGES[i0 : i1 + 1]:
            fn = self.stages.get(stage)
            if fn is None:
                continue
            df = fn(self.spark, df)
            df.write.mode("overwrite").parquet(self.checkpoint_path(stage))
            if self.csv_export:
                out = os.path.join(self.stage_dir(stage), self._export_name(stage))
                df.write.mode("overwrite").option("header", True).csv(out)
            df = self.spark.read.parquet(self.checkpoint_path(stage))
        assert df is not None, "no stage ran"
        return df
