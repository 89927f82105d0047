"""A Kafka-wire-compatible Python data source backed by plain files (S1 e2e).

The environment ships no spark-sql-kafka jar, so the real ``format("kafka")``
path can never execute here. This module closes the gap with a PySpark 4
Python Data Source (`pyspark.sql.datasource`) that speaks the SAME wire
contract as the Kafka source — identical fixed schema (key/value binary,
topic, partition, offset, timestamp, timestampType), the same option surface
(``subscribe``, ``startingOffsets``, ``failOnDataLoss`` — reference
TransactionalCdcProcessingApp.scala:85-92), batch and streaming read, offset
tracking per topic-partition — with a directory of JSONL files standing in
for the broker log:

    <broker_dir>/<topic>/<partition>.jsonl    # one message per line:
    {"key": "k" | null, "value": "...", "ts": 1700000000.5}

Offsets are line numbers, so ``startingOffsets`` and incremental micro-batch
ranges behave exactly like Kafka's. The engine's ``read_kafka_stream`` runs
UNCHANGED against this source (format name swapped) — which is what upgrades
S1 from "option surface pinned by unit test" to "executable end to end".

This is a test/dev double, not a broker: single-writer append, no compaction,
no consumer groups.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

FORMAT_NAME = "fakekafka"

# The exact schema spark-sql-kafka exposes (KafkaRecordToRowConverter).
KAFKA_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

_CREATE_TIME = 0  # Kafka TimestampType.CREATE_TIME


def _topic_partitions(broker_dir: str, topics: list[str]) -> list[tuple[str, int, str]]:
    """(topic, partition, path) for every log file of the subscribed topics."""
    out = []
    for topic in topics:
        tdir = os.path.join(broker_dir, topic)
        if not os.path.isdir(tdir):
            continue
        for f in sorted(os.listdir(tdir)):
            if f.endswith(".jsonl"):
                out.append((topic, int(f[: -len(".jsonl")]), os.path.join(tdir, f)))
    return out


def _line_count(path: str) -> int:
    with open(path, "rb") as fh:
        return sum(1 for _ in fh)


def _parse_options(options) -> tuple[str, list[str], str, bool]:
    broker_dir = options.get("path") or options.get("broker.dir")
    if not broker_dir:
        raise ValueError("fakekafka: 'path' option (broker dir) is required")
    subscribe = options.get("subscribe")
    if not subscribe:
        raise ValueError("fakekafka: 'subscribe' option is required")
    topics = [t.strip() for t in subscribe.split(",") if t.strip()]
    starting = options.get("startingOffsets", "latest")
    if starting not in ("earliest", "latest"):
        raise ValueError(f"fakekafka: unsupported startingOffsets {starting!r}")
    fail_on_loss = str(options.get("failOnDataLoss", "true")).lower() == "true"
    return broker_dir, topics, starting, fail_on_loss


class _Slice(InputPartition):
    def __init__(self, topic: str, partition: int, path: str, start: int, end: int):
        self.topic = topic
        self.partition = partition
        self.path = path
        self.start = start
        self.end = end


def _read_slice(s: _Slice) -> Iterator[tuple]:
    with open(s.path, "r", encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            if i < s.start:
                continue
            if i >= s.end:
                break
            msg = json.loads(line)
            key = msg.get("key")
            ts = datetime.fromtimestamp(float(msg.get("ts", 0.0)), tz=timezone.utc)
            yield (
                key.encode() if key is not None else None,
                msg["value"].encode(),
                s.topic,
                s.partition,
                i,
                ts,
                _CREATE_TIME,
            )


class FakeKafkaBatchReader(DataSourceReader):
    def __init__(self, options):
        self._broker_dir, self._topics, _, _ = _parse_options(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _Slice(t, p, path, 0, _line_count(path))
            for t, p, path in _topic_partitions(self._broker_dir, self._topics)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        return _read_slice(partition)


class FakeKafkaStreamReader(DataSourceStreamReader):
    """Offsets are ``{"<topic>/<partition>": next_line}`` dicts — the same
    per-topic-partition watermarking Kafka's source checkpoints.

    ``maxOffsetsPerTrigger`` (same option as spark-sql-kafka): cap the TOTAL
    messages admitted per micro-batch, spread evenly across topic-partitions
    with backlog — ingest stays bounded however deep the log is."""

    def __init__(self, options):
        self._broker_dir, self._topics, self._starting, self._fail_on_loss = (
            _parse_options(options)
        )
        mx = options.get("maxOffsetsPerTrigger")
        self._max_per_trigger = int(mx) if mx else None
        self._last_end: dict | None = None
        # Highest offset per topic-partition KNOWN delivered/committed: raised
        # by every `start` Spark hands to partitions() (checkpoint truth) and
        # by commit(). latestOffset never returns an end below it, and read
        # slices never start below it — so a capped restart with UNEVEN
        # committed offsets across partitions can neither log a regressed end
        # nor replay already-delivered records (the single-partition-only
        # safety the old cursor fast-forward gave, generalized).
        self._floor: dict[str, int] = {}

    def _current_end(self) -> dict:
        return {
            f"{t}/{p}": _line_count(path)
            for t, p, path in _topic_partitions(self._broker_dir, self._topics)
        }

    def initialOffset(self) -> dict:
        init = (
            self._current_end()
            if self._starting == "latest"
            else {k: 0 for k in self._current_end()}
        )
        self._last_end = dict(init)
        return init

    def latestOffset(self) -> dict:
        avail = self._current_end()
        if self._max_per_trigger is None:
            self._last_end = dict(avail)
            return avail
        # NOTE on restart: a fresh reader has no cursor, so the first capped
        # end is computed from 0 and may be BELOW the checkpointed start for
        # some partitions; the floor clamp below keeps any such end from
        # regressing once a start/commit has been observed, and partitions()
        # clamps the actual read range for the window before that.
        start = self._last_end or {k: 0 for k in avail}
        end = {k: start.get(k, 0) for k in avail}
        budget = self._max_per_trigger
        # two passes: an even share first, then redistribute budget stranded
        # by short partitions onto the remaining backlog (so a deep queue
        # drains at the full cap, like Kafka's proportional limiter)
        for _ in range(2):
            backlogged = [k for k in sorted(avail) if end[k] < avail[k]]
            if not backlogged or budget <= 0:
                break
            share = max(1, budget // len(backlogged))
            for k in backlogged:
                take = min(avail[k] - end[k], share, budget)
                end[k] += take
                budget -= take
                if budget <= 0:
                    break
        for k in end:  # never emit an end below a known-delivered offset
            f = self._floor.get(k, 0)
            if end[k] < f:
                end[k] = min(f, avail.get(k, f))
        self._last_end = dict(end)
        return end

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # the checkpointed start is committed truth: it raises the delivery
        # floor for every partition it names
        for k, lo in start.items():
            if self._floor.get(k, 0) < int(lo):
                self._floor[k] = int(lo)
        # restart-with-cap: fast-forward the rate limiter's cursor so capped
        # admission resumes from the committed start instead of replaying
        # empty batches from zero
        if self._max_per_trigger is not None:
            cur = self._last_end or {}
            for k, lo in start.items():
                if cur.get(k, 0) < lo:
                    cur[k] = int(lo)
            self._last_end = cur
        by_key = {
            f"{t}/{p}": (t, p, path)
            for t, p, path in _topic_partitions(self._broker_dir, self._topics)
        }
        missing = [k for k in start if k not in by_key]
        if missing and self._fail_on_loss:
            raise RuntimeError(f"fakekafka: topic-partitions lost: {missing}")
        out = []
        for key, hi in end.items():
            if key not in by_key:
                if self._fail_on_loss:
                    raise RuntimeError(f"fakekafka: topic-partition lost: {key}")
                continue
            # never read below the delivery floor: if a regressed end entered
            # the offset log before the floor was known (capped restart, see
            # latestOffset), the next batch's start would point at
            # already-delivered records — skip them instead of re-emitting
            lo = max(int(start.get(key, 0)), self._floor.get(key, 0))
            if hi > lo:
                t, p, path = by_key[key]
                out.append(_Slice(t, p, path, lo, int(hi)))
        return out

    def read(self, partition: _Slice) -> Iterator[tuple]:
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        # nothing to release (file-log broker keeps everything), but a
        # committed batch end is delivery truth: raise the floor
        for k, v in (end or {}).items():
            if self._floor.get(k, 0) < int(v):
                self._floor[k] = int(v)


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return KAFKA_WIRE_SCHEMA

    def reader(self, schema) -> FakeKafkaBatchReader:
        return FakeKafkaBatchReader(self.options)

    def streamReader(self, schema) -> FakeKafkaStreamReader:
        return FakeKafkaStreamReader(self.options)


def register_fake_kafka(spark) -> None:
    spark.dataSource.register(FakeKafkaDataSource)


def produce(broker_dir: str, topic: str, messages, partition: int = 0) -> None:
    """Append messages to the fake broker log. ``messages``: iterable of
    ``value`` strings or ``(key, value)`` / ``(key, value, ts)`` tuples."""
    tdir = os.path.join(broker_dir, topic)
    os.makedirs(tdir, exist_ok=True)
    path = os.path.join(tdir, f"{partition}.jsonl")
    with open(path, "a", encoding="utf-8") as fh:
        for m in messages:
            if isinstance(m, str):
                rec = {"key": None, "value": m, "ts": 0.0}
            elif len(m) == 2:
                rec = {"key": m[0], "value": m[1], "ts": 0.0}
            else:
                rec = {"key": m[0], "value": m[1], "ts": float(m[2])}
            fh.write(json.dumps(rec) + "\n")
