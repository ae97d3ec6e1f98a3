"""Lineage-flattening for iterative operators (CC, PageRank, LPA).

Every iterative DataFrame loop must cut lineage per round or the plan
grows linearly and re-optimizes/re-executes the whole history. Two
ways to cut it, with very different failure semantics at cluster
scale:

- ``localCheckpoint`` (default): materializes blocks on the executors
  WITHOUT replication and truncates lineage. Fast — no external
  storage round-trip — but a lost executor loses its blocks and,
  because lineage was truncated, they cannot be recomputed: a long
  connected-components or PageRank job dies with the executor. Fine
  on ``local[n]`` and for short loops on healthy clusters.
- ``checkpoint`` (``reliable=True``): writes each round's frame to the
  session's configured checkpoint directory
  (``spark.sparkContext.setCheckpointDir`` — HDFS/object store on a
  real cluster). One extra write+read per round buys survival of any
  executor loss; this is the 100 TB-safe default for long iterative
  jobs. See ``docs/scale_design.md`` ("Iterative lineage & fault
  tolerance").

Disk lifecycle of reliable checkpoints: Spark never deletes a
``checkpoint()`` file on its own unless
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` is set, so a
long loop otherwise accumulates one fully-materialized frame per round
in the checkpoint dir. Set that conf (it deletes a round's files once
the frame is garbage-collected on the driver, i.e. once the loop's
next round drops its reference) for long CC/PageRank runs, or point
``setCheckpointDir`` at a path with a storage-lifecycle/TTL rule and
reap it after the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame, reliable: bool = False, eager: bool = True) -> DataFrame:
    """Cut lineage between iterative rounds.

    ``reliable=False`` → ``localCheckpoint`` (executor-local,
    unreplicated — see module docstring for the failure mode).
    ``reliable=True`` → ``checkpoint`` against the configured
    checkpoint dir; raises a clear error if none is set rather than
    letting Spark fail mid-loop with a less actionable message.
    """
    if not reliable:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        raise RuntimeError(
            "reliable=True needs a checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) "
            "first (HDFS/object store on a cluster; any local dir on "
            "local[n])"
        )
    return df.checkpoint(eager=eager)
