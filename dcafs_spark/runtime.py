"""Deployment-dispatched lineage-cut seam.

Every single-scan plan in the engine ("compute this frame once, feed it
to two downstream joins") needs a lineage cut so Catalyst does not
re-execute the upstream twice. HOW that cut is materialized is a
deployment decision, not a query decision:

* ``local`` (default) — ``DataFrame.localCheckpoint``: blocks live in
  executor storage memory/disk with NO lineage fallback. Fastest, and
  fine on a single-node sandbox (local[32]) where "executor loss"
  means the whole JVM died anyway. On a real multi-executor cluster a
  single lost executor mid-job fails the query instead of recomputing.
* ``reliable`` — ``DataFrame.checkpoint`` against the SparkContext
  checkpoint directory (HDFS/S3/NFS): survives executor loss, the right
  choice for multi-hour 100 TB jobs on spot instances. Requires
  ``spark.dcafs.checkpoint.dir`` (or ``DCAFS_CHECKPOINT_DIR``, or a
  checkpoint dir already set on the context).
* ``persist`` — ``DataFrame.persist(DISK_ONLY)``: keeps lineage, so a
  lost block is recomputed from source (slower recovery than
  ``reliable``, no shared-FS requirement). Note that unlike the two
  checkpoint modes this does NOT cut lineage — plans stay deep, which
  matters only for iterative algorithms (connected components); those
  sites pass ``require_cut=True`` and are escalated to a real
  checkpoint even in persist mode.

Mode is resolved per SparkSession from ``spark.dcafs.checkpoint.mode``
(conf) falling back to ``DCAFS_CHECKPOINT_MODE`` (env), default
``local``. All engine call sites go through :func:`checkpoint` —
usually as ``df.transform(checkpoint)`` to stay chain-friendly.

The reference engine's durability posture is retry-on-failure at the
sink layer (dcafs ``SqlTable.java:484-521`` buffers and retries failed
inserts); this seam gives the batch layer the equivalent knob.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_VALID_MODES = ("local", "reliable", "persist")


def checkpoint_mode(spark: SparkSession) -> str:
    """Resolve the active lineage-cut mode for this session."""
    mode = spark.conf.get(
        "spark.dcafs.checkpoint.mode",
        os.environ.get("DCAFS_CHECKPOINT_MODE", "local"),
    )
    mode = (mode or "local").strip().lower()
    if mode not in _VALID_MODES:
        raise ValueError(
            f"spark.dcafs.checkpoint.mode={mode!r}: expected one of {_VALID_MODES}"
        )
    return mode


def _ensure_checkpoint_dir(spark: SparkSession) -> None:
    """Make sure the context has a checkpoint dir for ``reliable`` mode.

    Resolution order: dir already set on the context > conf
    ``spark.dcafs.checkpoint.dir`` > env ``DCAFS_CHECKPOINT_DIR`` > a
    local tmp dir (sandbox convenience — a real cluster MUST configure
    a shared filesystem path or reliable mode is local-disk-reliable
    only, which defeats the point; the tmp fallback keeps single-node
    runs working without ceremony).
    """
    sc = spark.sparkContext
    try:
        current = sc.getCheckpointDir()
    except Exception:  # noqa: BLE001 — older API surface
        current = None
    if current:
        return
    configured = spark.conf.get(
        "spark.dcafs.checkpoint.dir", os.environ.get("DCAFS_CHECKPOINT_DIR", "")
    )
    if not configured:
        configured = os.path.join(tempfile.gettempdir(), "dcafs_checkpoints")
    sc.setCheckpointDir(configured)


def checkpoint(
    df: DataFrame, eager: bool = False, require_cut: bool = False, ephemeral: bool = False
) -> DataFrame:
    """Cut (or pin) ``df``'s lineage per the deployment's checkpoint mode.

    Call as ``df.transform(checkpoint)`` (lazy) or
    ``df.transform(checkpoint, eager=True)`` (materialize now — used
    where the frame is both returned and consumed by a side effect in
    the same call, so the compute must not race).

    ``require_cut=True`` marks iterative-algorithm sites (pointer
    jumping) where an actual lineage CUT is semantically required to
    keep round-N plans O(1) deep; in ``persist`` mode those escalate to
    a reliable checkpoint rather than silently growing the plan.

    ``ephemeral=True`` marks frames whose lifetime is bounded by the
    enclosing unit of work AND whose failure recovery already exists at
    an outer layer — e.g. the streaming runner's per-micro-batch
    fan-out materialization, where a failed batch is re-run from the
    source via the streaming checkpoint. Those always use
    localCheckpoint: a ``reliable`` checkpoint per micro-batch would
    write permanent files the cleaner never deletes (cleanCheckpoints
    is tied to driver GC timing) — an unbounded disk leak on a
    long-running stream, for durability the streaming layer already
    provides.

    All three modes produce identical rows — asserted by
    ``tests/test_runtime_checkpoint.py`` on a gated dedup query.
    """
    spark = df.sparkSession
    if ephemeral:
        return df.localCheckpoint(eager=eager)
    mode = checkpoint_mode(spark)
    if mode == "persist" and require_cut:
        mode = "reliable"
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        _ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=eager)
    # persist: lazy by design; an eager site forces materialization so
    # its "compute exactly once, now" contract holds.
    out = df.persist(StorageLevel.DISK_ONLY)
    if eager:
        out.count()
    return out
