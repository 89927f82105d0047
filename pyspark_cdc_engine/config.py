"""Layered configuration (reference: AppConfig.scala:22-26, reference.conf:3-36).

The reference loads Typesafe/HOCON config with the resolution order

    system properties  >  job config file  >  reference.conf defaults

This is the Python analog over public stdlib pieces only:

    1. **Environment variables** (the system-properties layer).  Every key has
       a canonical env name — ``CDC_CONF_`` + key with ``.``/``-`` replaced by
       ``_``, uppercased (``spark.dev.app-name`` → ``CDC_CONF_SPARK_DEV_APP_NAME``)
       — plus, for knobs that predate this module, a documented legacy alias
       (``CDC_MH_REJOIN_DOCS``, ``IVF_BUCKET_CAP``, …).  Env is consulted LIVE
       on every ``get`` so test monkeypatching and operator-level overrides
       keep working.
    2. **Programmatic overrides** passed to :func:`load` (a job's inline conf).
    3. **Job config file** — HOCON ``.conf`` (the reference's own format,
       including ``include "reference"`` chains — parsed by
       :mod:`pyspark_cdc_engine.hocon`) or JSON (flat or nested).  Located
       explicitly via ``config_file=`` or by job name under
       ``$CDC_CONFIG_DIR`` / ``./conf`` (``.conf`` probed before ``.json``).
    4. **DEFAULTS** below — the packaged ``reference.conf`` analog.

Keys mirror the reference's HOCON paths where a counterpart exists
(``spark.dev.master``, ``spark.state-store.provider-class``,
``kafka.starting-offsets``, ``job.kafka.topics.orders`` …); engine-specific
scale knobs live under ``engine.*``.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any

# ------------------------------------------------------------------ defaults
# reference.conf:3-36 counterparts first, then engine scale knobs.
DEFAULTS: dict[str, Any] = {
    "spark.dev.master": "",  # "" -> session.get_spark picks local[$SPARK_GRAFT_CPUS]
    "spark.dev.app-name": "pyspark-cdc-engine",
    "spark.state-store.provider-class": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.warehouse-dir": "",
    "spark.log-level": "WARN",
    "spark.ui-port": "",
    # Hive metastore toggle (reference.conf:6 `enable-hive-support`, :25-28
    # `spark.hive.*`; SparkSessionCreator.scala:32-33,39). Off by default:
    # the engine targets plain OSS Spark, but flipping this on gives the
    # reference's persistent-metastore catalog (in-session Derby unless a
    # JDBC connection-url points at a shared metastore).
    "spark.dev.enable-hive-support": False,
    "spark.hive.connection-url": "",
    "spark.hive.connection-driver": "",
    # kafka defaults (reference.conf:34-36)
    "kafka.starting-offsets": "earliest",
    "kafka.fail-on-data-loss": False,
    # job surface (transactional-cdc-processing.conf analog; empty = unset)
    "job.kafka.bootstrap-servers": "",
    "job.kafka.topics.orders": "",
    "job.kafka.topics.order-details": "",
    "job.kafka.topics.order-line-items": "",
    "job.kafka.topics.transaction-metadata": "",
    "job.output.checkpoint-location": "",
    "job.output.delta-table-name": "",
    # engine scale knobs (previously scattered env vars)
    "engine.minhash-rejoin-docs": 50_000,
    "engine.materialize-docs": 50_000,
    "engine.ivf-bucket-cap": 2_000,
    "engine.jaccard-exact-max-docs": 20_000,
    # bigram_pmi_top broadcasts its (min-count-filtered) unigram table only
    # when the corpus is below this many documents; above it the joins go to
    # the shuffle planner (AQE may still broadcast on runtime stats) — a
    # forced 100M-term driver broadcast is the failure this gates out.
    "engine.pmi-broadcast-max-docs": 1_000_000,
    # Edge source for graph/curation consumers of near-dup pairs
    # (pagerank3_near_dup, dedup_keep_best, dedup_clusters,
    # containment_near_dup): "exact" = all-pairs shingle join (raises above
    # jaccard-exact-max-docs), "lsh" = banded MinHash-LSH candidates, "auto"
    # (default) = exact below the guard, LSH above it — degrade, don't fail.
    "engine.pair-source": "auto",
    # Reliable checkpointing for iterative/shared-frame paths: when set to a
    # directory, connected-components rounds and shared-frame materialization
    # use spark.sparkContext.setCheckpointDir + df.checkpoint() (survives
    # executor loss); empty = localCheckpoint (fast, single-job local mode).
    "engine.checkpoint-dir": "",
    # deltalite log: commits between parquet state checkpoints (Delta's
    # checkpointInterval analog; 0 disables — full replay from version 0).
    "engine.log-checkpoint-interval": 20,
    # fan_out floor: inputs estimated below this many bytes never fan — a
    # repartition exchange's fixed cost (extra AQE stage-jobs per consumer)
    # cannot amortize on tiny frames even at x(dim*K) work multipliers
    # (measured r13: fanning the <=193 KB sf0.001/sf0.01 test corpora only
    # slowed the oracle lanes, while the >=595 KB one-row-group sf0.1
    # corpora gained 2-3x). 0 fans everything the split gate lets through.
    "engine.fan-out-min-bytes": 262_144,
}

# Pre-module env names kept as first-class aliases (highest layer, probed
# after the canonical CDC_CONF_* name).
LEGACY_ENV: dict[str, str] = {
    "engine.minhash-rejoin-docs": "CDC_MH_REJOIN_DOCS",
    "engine.materialize-docs": "CDC_MATERIALIZE_DOCS",
    "engine.ivf-bucket-cap": "IVF_BUCKET_CAP",
    "engine.jaccard-exact-max-docs": "JACCARD_EXACT_MAX_DOCS",
    "engine.pair-source": "CDC_PAIR_SOURCE",
    "engine.pmi-broadcast-max-docs": "CDC_PMI_BROADCAST_MAX_DOCS",
    "engine.checkpoint-dir": "CDC_RELIABLE_CHECKPOINT",
    "engine.log-checkpoint-interval": "CDC_LOG_CHECKPOINT_INTERVAL",
}

_MISSING = object()


def env_name(key: str) -> str:
    """Canonical environment-variable name for a config key."""
    return "CDC_CONF_" + re.sub(r"[.\-]", "_", key).upper()


def _flatten(obj: Any, prefix: str = "") -> dict[str, Any]:
    """Flatten nested JSON into dotted keys ({"spark":{"dev":{"master":x}}}
    -> {"spark.dev.master": x}); scalars and lists are leaves."""
    out: dict[str, Any] = {}
    if isinstance(obj, dict):
        for k, v in obj.items():
            path = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten(v, path))
    else:
        out[prefix] = obj
    return out


class AppConfig:
    """One resolved configuration. ``get`` applies the layer order documented
    in the module docstring; typed getters coerce strings (env/file values)
    the way Typesafe Config's getInt/getBoolean do."""

    def __init__(
        self,
        file_layer: dict[str, Any] | None = None,
        overrides: dict[str, Any] | None = None,
        source: str | None = None,
    ) -> None:
        self._file = dict(file_layer or {})
        self._overrides = dict(overrides or {})
        self.source = source  # config file path, for diagnostics

    # ------------------------------------------------------------- resolution
    def get(self, key: str, default: Any = _MISSING) -> Any:
        for name in (env_name(key), LEGACY_ENV.get(key)):
            if name and name in os.environ:
                return os.environ[name]
        if key in self._overrides:
            return self._overrides[key]
        if key in self._file:
            return self._file[key]
        if key in DEFAULTS:
            return DEFAULTS[key]
        if default is _MISSING:
            raise KeyError(f"config key not found: {key}")
        return default

    def get_str(self, key: str, default: Any = _MISSING) -> str:
        return str(self.get(key, default))

    def get_int(self, key: str, default: Any = _MISSING) -> int:
        return int(self.get(key, default))

    def get_float(self, key: str, default: Any = _MISSING) -> float:
        return float(self.get(key, default))

    def get_bool(self, key: str, default: Any = _MISSING) -> bool:
        v = self.get(key, default)
        if isinstance(v, bool):
            return v
        return str(v).strip().lower() in ("1", "true", "yes", "on")

    # ------------------------------------------------------------ convenience
    def spark_confs(self) -> dict[str, str]:
        """Spark confs this config contributes to session building: the
        state-store provider, optional ui port / warehouse dir, plus every
        ``spark.conf.<name>`` key passed through verbatim (the escape hatch
        for arbitrary ``--conf``-style settings in a job file)."""
        confs: dict[str, str] = {
            "spark.sql.streaming.stateStore.providerClass": self.get_str(
                "spark.state-store.provider-class"
            ),
        }
        if self.get_str("spark.ui-port"):
            confs["spark.ui.port"] = self.get_str("spark.ui-port")
        if self.get_str("spark.warehouse-dir"):
            confs["spark.sql.warehouse.dir"] = self.get_str("spark.warehouse-dir")
        # Metastore JDBC wiring (SparkSessionCreator.scala:32-33): only
        # meaningful with enable-hive-support, but harmless without.
        if self.get_str("spark.hive.connection-url"):
            confs["spark.hadoop.javax.jdo.option.ConnectionURL"] = self.get_str(
                "spark.hive.connection-url"
            )
        if self.get_str("spark.hive.connection-driver"):
            confs["spark.hadoop.javax.jdo.option.ConnectionDriverName"] = (
                self.get_str("spark.hive.connection-driver")
            )
        prefix = "spark.conf."
        for layer in (self._file, self._overrides):
            for k, v in layer.items():
                if k.startswith(prefix):
                    confs[k[len(prefix):]] = str(v)
        return confs

    def keys(self) -> list[str]:
        """Every key with a value in any layer (env aliases not enumerable)."""
        return sorted({*DEFAULTS, *self._file, *self._overrides})


def load(
    job_name: str | None = None,
    config_file: str | Path | None = None,
    overrides: dict[str, Any] | None = None,
) -> AppConfig:
    """Build an :class:`AppConfig` (AppConfig.load analog).

    ``config_file`` names a job file directly — HOCON ``.conf`` (the
    reference's own format, parsed by :mod:`pyspark_cdc_engine.hocon`
    including its ``include "reference"`` chains) or JSON (anything else).
    Otherwise ``job_name`` is searched as ``<job_name>.conf`` then
    ``<job_name>.json`` under ``$CDC_CONFIG_DIR`` then ``./conf``. A
    missing job file is not an error — defaults still apply, matching the
    reference where every key has a reference.conf fallback."""
    path: Path | None = None
    if config_file is not None:
        path = Path(config_file)
        if not path.is_file():
            raise FileNotFoundError(f"config file not found: {path}")
    elif job_name:
        for d in (os.environ.get("CDC_CONFIG_DIR"), "conf"):
            if not d:
                continue
            for ext in (".conf", ".json"):
                if (Path(d) / f"{job_name}{ext}").is_file():
                    path = Path(d) / f"{job_name}{ext}"
                    break
            if path is not None:
                break
    file_layer: dict[str, Any] = {}
    if path is not None:
        if path.suffix == ".conf":
            from pyspark_cdc_engine.hocon import load_hocon_file

            file_layer = _flatten(load_hocon_file(path))
        else:
            file_layer = _flatten(json.loads(path.read_text()))
    return AppConfig(file_layer, overrides, source=str(path) if path else None)


_GLOBAL: AppConfig | None = None


def get_config() -> AppConfig:
    """Process-default config (no job file): DEFAULTS overlaid by live env.
    Operators use this for their scale knobs so one env/config story covers
    library use, tests, and the bench."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = AppConfig()
    return _GLOBAL


def set_config(config: AppConfig | None) -> None:
    """Install (or with ``None`` reset) the process-default config — the hook
    a job entry point uses so operator knobs see its job file."""
    global _GLOBAL
    _GLOBAL = config
