"""Checkpoint policy for corpus-sized iterative/reused intermediates.

``DataFrame.localCheckpoint`` writes blocks to EXECUTOR-LOCAL storage
with no replication: it truncates lineage (the point — iterative plans
like prefix doubling re-execute earlier rounds exponentially without
it), but after the checkpoint the blocks are the only copy of the data.
On a single-JVM ``local[*]`` run that is free and safe. On a real
cluster, losing one executor after the checkpoint KILLS the job —
lineage is severed, so the lost blocks cannot be recomputed.

``stable_checkpoint`` makes that trade explicit and reversible:

- default: ``localCheckpoint(eager=...)`` — right for local runs and
  for clusters that accept recompute-from-scratch on executor loss;
- with a reliable directory configured, it switches to
  ``df.checkpoint(eager=...)``, which persists to the fault-tolerant
  store backing the directory (HDFS/S3/...) and survives executor loss.

The directory comes from (first match wins):

1. the ``checkpoint_dir=`` argument (per-call override);
2. the session conf ``spark.pylluminator.checkpointDir`` — set once
   (``spark.conf.set(...)`` or ``--conf``) to flip EVERY corpus-sized
   checkpoint in the package to the reliable path, no API changes;
3. neither -> localCheckpoint.

All corpus-sized checkpoint sites in the package (suffix doubling
rounds, graph iteration, CCNet scored paragraphs, DoReMi tokenized
bigrams, PPJoin rarity-ranked sets, langid model tables) route through
this helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHECKPOINT_DIR_CONF = "spark.pylluminator.checkpointDir"

# last directory THIS helper configured, per SparkContext identity —
# SparkContext.setCheckpointDir is NOT idempotent: every call mkdirs and
# switches to a fresh `<dir>/<UUID>` subdirectory, so calling it per
# round of an iterative operator would scatter each round's blocks into
# its own directory (one mkdir RPC per round, N live copies on the
# durable store). Set once per (context, path) instead. Keyed by
# applicationId, NOT id(sc): a stopped context's id can be recycled by
# the allocator for a fresh context, which would skip setCheckpointDir
# and fail df.checkpoint() with "checkpoint directory has not been set"
# (and the dict would pin dead contexts alive-looking forever).
# applicationId is unique per context lifetime; stale entries for dead
# applications are harmless strings and are dropped opportunistically.
_CONFIGURED: dict[str, str] = {}


def stable_checkpoint(
    df: DataFrame,
    *,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Lineage-truncating checkpoint honoring the reliable-dir policy.

    ``checkpoint_dir`` (or the ``spark.pylluminator.checkpointDir``
    session conf) selects a reliable ``df.checkpoint`` into that
    directory; otherwise ``df.localCheckpoint``. Eager by default —
    every call site here checkpoints precisely to materialize NOW and
    cut the plan.
    """
    spark = df.sparkSession
    if checkpoint_dir is None:
        checkpoint_dir = spark.conf.get(CHECKPOINT_DIR_CONF, None)
    if not checkpoint_dir:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    # guard against per-call setCheckpointDir (see _CONFIGURED note):
    # one UUID subdirectory per (context, configured path), not per
    # checkpoint. Reliable-checkpoint files are not auto-deleted by
    # default — set spark.cleaner.referenceTracking.cleanCheckpoints=true
    # for ContextCleaner-driven cleanup of no-longer-referenced ones.
    app_id = sc.applicationId
    if _CONFIGURED.get(app_id) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        # evict other applications' entries — a dead context's row is
        # inert but there is no reason to accumulate one per session
        _CONFIGURED.clear()
        _CONFIGURED[app_id] = checkpoint_dir
    return df.checkpoint(eager=eager)
