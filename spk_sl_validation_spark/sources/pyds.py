"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

Demonstrates the modern extension point for reading formats Spark has
no built-in connector for: the source plans ``shards`` input
partitions (parallel read — each executor materializes only its id
range) and generates a deterministic record stream, so the DuckDB
oracle can replay the generator arithmetic exactly and the driver's
value-hash gate verifies the connector end to end.

Generation rule per ``event_id`` (all integer arithmetic until one
final double division — engine-identical):

    shard  = event_id % shards
    bucket = (event_id * 2654435761) % 1000003          (Knuth hash)
    value  = bucket / 1000.0

At 100 TB the same shape holds: ``partitions()`` is the split
planner (ranges, files, Kafka partitions, ...) and ``read`` runs
executor-side; nothing flows through the driver but the partition
list.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "synthetic_events"
KNUTH = 2654435761
MOD = 1000003


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.shards = int(options.get("shards", "8"))

    def partitions(self):
        per = max(1, self.n // self.shards)
        parts = []
        start = 0
        while start < self.n:
            parts.append(_RangePartition(start, min(start + per, self.n)))
            start += per
        return parts

    def read(self, partition):
        shards = self.shards
        for event_id in range(partition.start, partition.end):
            bucket = (event_id * KNUTH) % MOD
            yield (event_id, event_id % shards, bucket / 1000.0)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Streaming twin of the batch reader, on the PARTITIONED stream
    protocol (``DataSourceStreamReader``): the driver only plans
    offset spans and per-shard range partitions; every row is
    generated EXECUTOR-side, in parallel, exactly like the batch
    reader. (The previous ``SimpleDataSourceStreamReader`` prefetched
    the whole microbatch on the DRIVER and pickled it row-wise to the
    JVM — measured 10.7 s warm for 60k rows at sf0.01 vs ~1 s on this
    protocol, and a driver bottleneck by construction at scale —
    guide §5.) Spark's Python microbatch stream does not support
    Trigger.AvailableNow (it falls back to a single batch — the
    engine logs the fallback), so offsets advance {pos: 0} -> {pos: n}
    in one deterministic microbatch; recovery re-plans the committed
    span through ``partitions(start, end)`` with the same arithmetic."""

    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.shards = int(options.get("shards", "8"))

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        return {"pos": self.n}

    def partitions(self, start, end):
        s, e = start["pos"], end["pos"]
        per = max(1, (e - s) // self.shards) if e > s else 1
        parts = []
        pos = s
        while pos < e:
            parts.append(_RangePartition(pos, min(pos + per, e)))
            pos += per
        # an empty span still needs one (empty) partition for the plan
        return parts or [_RangePartition(s, s)]

    def read(self, partition):
        shards = self.shards
        for event_id in range(partition.start, partition.end):
            bucket = (event_id * KNUTH) % MOD
            yield (event_id, event_id % shards, bucket / 1000.0)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return "event_id bigint, shard int, value double"

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)

    def writer(self, schema, overwrite):
        return SyntheticEventsWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SyntheticEventsDataSource)


def oracle_sql(n: int, shards: int) -> str:
    """DuckDB replay of the generator (same integer arithmetic)."""
    return f"""
SELECT CAST(range AS BIGINT) AS event_id,
       CAST(range % {shards} AS INTEGER) AS shard,
       CAST((range * {KNUTH}) % {MOD} AS DOUBLE) / 1000.0 AS value
FROM range({n})
"""


class _CommitMessage(WriterCommitMessage):
    def __init__(self, path: str, count: int):
        self.path = path
        self.count = count


class SyntheticEventsWriter(DataSourceWriter):
    """Executor-side writer (Spark 4 DataSourceWriter protocol): each
    task streams its partition to a uniquely-named JSONL part file and
    returns a commit message; the driver's ``commit`` publishes a
    _SUCCESS manifest listing every part with its row count — the
    standard two-phase output-commit shape (no partial results visible
    on failure because ``abort`` leaves no manifest).

    Filesystem assumption: ``write`` runs on executors and
    ``commit``/``abort`` on the driver, all against the same plain
    ``path`` — correct only when driver and executors SHARE that
    filesystem (local mode, or a mounted NFS/FUSE path). On a real
    cluster with executor-local disks, point ``path`` at a shared
    mount or swap the ``open``/``os`` calls for a shared-store client
    (s3/hdfs); the two-phase commit protocol itself carries over
    unchanged."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthetic_events writer requires option 'path'")

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _CommitMessage(part, n)

    def commit(self, messages):
        import json as _json
        import os

        manifest = {
            "parts": sorted(
                [{"path": m.path, "count": m.count} for m in messages],
                key=lambda p: p["path"],
            ),
            "total": sum(m.count for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(_json.dumps(manifest))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
