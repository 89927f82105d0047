"""Lineage-truncation helper for iterative and shared-frame plans.

Iterative operators (connected-components label propagation) and frames feeding
multiple downstream consumers (LSH shingle tables) must materialize, or lineage
grows per round / the corpus is re-scanned per consumer. Two mechanisms:

- ``df.localCheckpoint()`` — blocks cached on executors. Fast (no distributed
  write), but NOT fault-tolerant: losing one executor loses blocks and kills
  the job mid-loop. Right for local mode and the test/bench boxes.
- ``df.checkpoint()`` to a RELIABLE directory (HDFS/S3) — survives executor
  loss; the only safe choice for a multi-hour 100 TB run on a real cluster.

:func:`materialize` routes between them on the ``engine.checkpoint-dir``
config key (env: ``CDC_RELIABLE_CHECKPOINT`` / ``CDC_CONF_ENGINE_CHECKPOINT_DIR``,
see :mod:`pyspark_cdc_engine.config`): set it to a durable directory on a real
cluster and every iterative path in the engine switches to reliable
checkpointing with no code change; unset, behavior is the fast local default.
Results are identical either way — only failure-recovery semantics differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark_cdc_engine.config import get_config


def materialize_async(df: DataFrame):
    """Start :func:`materialize` of ``df`` on a driver thread and return a
    zero-arg callable that joins and yields the materialized frame.

    Guide §2.6 — overlap independent jobs: Spark happily runs several jobs
    at once inside one application; actions are only sequential because
    driver code calls them sequentially. A recall eval's ground-truth side
    is independent of its training loop, so materializing it concurrently
    hides its wall entirely behind the (inherently serial) Lloyd's rounds
    instead of appending it to them (r13, the r12 verdict's #1: the trained
    family is a chain of small serial jobs). ``InheritableThread`` keeps
    job-group/description props and py4j thread cleanup correct. Errors
    re-raise at join time; results are identical to a synchronous
    materialize (same lineage cut, same values)."""
    from pyspark import InheritableThread

    box: dict = {}

    def _run() -> None:
        try:
            box["df"] = materialize(df)
        except BaseException as e:  # noqa: BLE001 — re-raised at join
            box["err"] = e

    t = InheritableThread(target=_run, daemon=True)
    t.start()

    def result() -> DataFrame:
        t.join()
        if "err" in box:
            raise box["err"]
        return box["df"]

    return result


def materialize_lazy(df: DataFrame) -> DataFrame:
    """Lineage cut that materializes inside the NEXT action instead of
    paying a dedicated job now (``eager=False``) — the per-step cut of the
    BPE training loop (k lazy cuts = k+1 jobs instead of 2k+1, r12). Routes
    between local and reliable checkpointing on ``engine.checkpoint-dir``
    exactly like :func:`materialize`, so configuring a durable directory
    upgrades the k-step loop to executor-loss-safe checkpoints with no code
    change (r13 ADVICE #3 — the loop previously called ``localCheckpoint``
    directly and never saw the config)."""
    return materialize(df, eager=False)


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint()`` when
    ``engine.checkpoint-dir`` is configured, ``localCheckpoint()`` otherwise."""
    ckpt_dir = get_config().get_str("engine.checkpoint-dir")
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    from pathlib import PurePath

    sc = df.sparkSession.sparkContext
    current = sc.getCheckpointDir()
    # setCheckpointDir stores <root>/<uuid>; re-set unless the ACTIVE root
    # (parent of that uuid dir, scheme stripped) equals the configured root —
    # a substring test would wrongly accept e.g. /data/ckpt-old for
    # /data/ckpt and keep "reliable" checkpoints on the wrong filesystem
    active_root = None
    if current is not None:
        path_part = current.split("://", 1)[-1]
        if path_part.startswith("file:"):
            path_part = path_part[len("file:"):]
        active_root = str(PurePath(path_part).parent)
    if active_root != str(PurePath(ckpt_dir.rstrip("/"))):
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)
