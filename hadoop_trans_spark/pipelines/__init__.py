"""Pipelines: the reference's three entry points, re-expressed Spark-first.

  migrate — TransTablePartition / TransWholeTablePartition
            (`/root/reference/src/main/java/cn/dianhun/hadoop/
            TransTablePartition.java:43`): partition-range copy between
            warehouse roots, with conflict policy and post-copy verify.
  compact — HDFSMerge (`HDFSMerge.java:33`): small-file compaction with
            atomic swap and delete-on-success-only.
  verify  — CommonUtils.checkFile (`CommonUtils.java:99-124`) generalized
            from (file name, size) compare to row-level content compare.

Unlike the reference, no byte ever traverses the driver: copies are
distributed scan→sink jobs, verification is a distributed aggregate.
"""

from .compact import CompactReport, compact_table
from .migrate import MigrateJob, MigrateReport, migrate
from .runner import PipelineReport, run_pipeline, run_pipeline_file
from .verify import VerifyReport, fingerprint, verify

__all__ = [
    "MigrateJob",
    "MigrateReport",
    "migrate",
    "CompactReport",
    "compact_table",
    "VerifyReport",
    "fingerprint",
    "verify",
]
