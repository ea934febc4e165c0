"""Custom connector via the Python Data Source API (Spark 4).

``synth_events`` is a generator-as-connector: a deterministic synthetic
event feed exposed as a first-class ``spark.read.format(...)`` source.
This is the engine's connector extension point — the same four methods
(``schema`` / ``pushFilters`` / ``partitions`` / ``read``) wrap any
external system Spark lacks a native reader for, and everything that
matters at 100 TB is exercised for real:

- **Executor-side generation.** ``partitions()`` plans id-range splits on
  the driver (metadata only); each range materializes inside ``read()``
  on an executor as ONE numpy computation emitted as ONE Arrow record
  batch — the driver never holds a row, and scan parallelism is the
  connector's partition count, exactly like file splits.
- **Filter pushdown** (``pushFilters``, Spark 4.1): range/equality
  predicates on ``event_id`` narrow the planned id interval BEFORE
  partitioning, so pruned splits are never generated at all — the Python
  analogue of parquet row-group pruning. Pushed filters are still
  returned to Spark for re-evaluation (correctness never depends on the
  connector's pruning); everything else stays Spark-side.
- **Determinism.** Columns derive from the id via a fixed integer mix
  (Knuth multiplicative hash masked to 31 bits), so any slice of the
  feed is bit-reproducible across partitionings, retries, and engines —
  the DuckDB oracle replays the same arithmetic over generate_series.

Row schema: ``event_id bigint, user_id bigint, amount bigint`` with
``user_id = mix(id) % 97`` and ``amount = (mix(id) // 97) % 1000``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

if TYPE_CHECKING:
    import pyarrow as pa

MIX_MULT = 2654435761  # Knuth's 2^32 / phi multiplicative constant
MIX_MASK = 0x7FFFFFFF
N_USERS = 97
AMOUNT_MOD = 1000


class IdRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _generate_batch(start: int, end: int) -> "pa.RecordBatch":
    """One id-range split materialized executor-side: a single numpy pass
    emitted as a single Arrow batch. Shared by the batch reader and the
    stream reader so both serve the identical bit-reproducible feed."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(start, end, dtype="int64")
    z = (ids * MIX_MULT) & MIX_MASK
    return pa.record_batch(
        {
            "event_id": pa.array(ids),
            "user_id": pa.array(z % N_USERS),
            "amount": pa.array((z // N_USERS) % AMOUNT_MOD),
        }
    )


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.lo = 0
        self.hi = int(options.get("rows", 100_000))
        self.n_parts = max(1, int(options.get("partitions", 16)))

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        """Narrow [lo, hi) from event_id range/equality predicates. Every
        filter is ALSO yielded back for Spark-side re-evaluation, so a
        connector pruning bug can only cost performance, never rows."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("event_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
            yield f

    def partitions(self) -> List[IdRangePartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi == lo:
            return [IdRangePartition(lo, lo)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            IdRangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, part: IdRangePartition) -> Iterator["pa.RecordBatch"]:
        yield _generate_batch(part.start, part.end)


class SynthEventsStreamReader(DataSourceStreamReader):
    """The same feed as a STREAMING source (micro-batch offsets over the id
    space). This is the full ``streamReader`` API — not the driver-side
    ``SimpleDataSourceStreamReader`` — so each micro-batch's id range is
    split into :class:`IdRangePartition`\ s and materialized ON EXECUTORS,
    exactly like the batch reader; the driver handles offsets only.

    Admission control: ``latestOffset`` advances at most ``batch_rows``
    ids per trigger, so a bounded feed drains as a deterministic SEQUENCE
    of micro-batches (offset log entries 0 -> batch -> 2*batch -> ...)
    rather than one giant batch — the property that bounds per-trigger
    work on an unbounded production feed.

    Recovery contract: the generator is stateless, so any offset range is
    replayable — but the admission counter ``self.pos`` is in-memory and
    would restart at 0 on a new driver. Every offset Spark hands back
    (``partitions``/``commit``, both replayed from the checkpointed offset
    log during recovery) therefore FAST-FORWARDS ``self.pos``, so
    ``latestOffset`` never regresses below a committed offset and no id
    range is ever re-admitted as a new micro-batch. With that,
    replayability + the offset log give exactly-once under checkpoint
    recovery."""

    def __init__(self, options):
        self.total = int(options.get("rows", 100_000))
        self.batch_rows = int(options.get("batch_rows", 20_000))
        self.n_parts = max(1, int(options.get("partitions", 16)))
        self.pos = 0

    def initialOffset(self):
        return {"next": 0}

    def latestOffset(self):
        self.pos = min(self.pos + self.batch_rows, self.total)
        return {"next": self.pos}

    def partitions(self, start, end):
        lo, hi = start["next"], end["next"]
        # Recovery fast-forward: `end` comes from Spark's offset log, which
        # survives driver restarts while self.pos does not.
        self.pos = max(self.pos, hi)
        if hi <= lo:
            return [IdRangePartition(lo, lo)]
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [
            IdRangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, part: IdRangePartition) -> Iterator["pa.RecordBatch"]:
        yield _generate_batch(part.start, part.end)

    def commit(self, end):
        # No data-side work (stateless replayable generator), but keep the
        # admission counter monotone w.r.t. the committed offset as well.
        self.pos = max(self.pos, end["next"])


class SynthEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, amount bigint"

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)

    def streamReader(self, schema) -> SynthEventsStreamReader:
        return SynthEventsStreamReader(self.options)


def register_synth_events(spark) -> str:
    """Idempotently register the connector; returns its format name.

    Python-data-source filter pushdown is gated behind a runtime conf
    (off by default in 4.1); enable it here so the connector behaves the
    same under any session, including the driver's vanilla one."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthEventsSource)
    return SynthEventsSource.name()


# ---------------------------------------------------------------------------
# Python Data Source WRITE path: a manifest-committing JSONL sink
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class PyJsonlArrowWriter(DataSourceArrowWriter):
    """Executor side of the commit protocol. Each task streams its Arrow
    batches to ONE uniquely-named staging file (no two attempts collide,
    so speculative/retried tasks are safe) and returns a commit message;
    nothing a task writes is visible until the driver's ``commit()``
    publishes the manifest. This is the Iceberg-style
    write-new-files-then-swap-pointer protocol in miniature — the same
    shape ``sources/writers.py:write_snapshot`` uses for versioned
    tables, here at the connector extension point.

    Filesystem contract: ``path`` must be a filesystem SHARED between
    executors and driver (local mode, NFS, FUSE-mounted object store) —
    ``commit()`` runs driver-side and ``os.replace``\ s the staging files
    the tasks wrote, and ``abort()`` reaps them by path. On a multi-node
    cluster with executor-local disks, route ``path`` to a shared mount;
    the protocol itself (stage-unique names -> manifest swap) carries
    over unchanged, only the byte transport is out of scope here."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        rows = 0
        with open(fname, "w", encoding="utf-8") as fh:
            for batch in iterator:
                for rec in batch.to_pylist():
                    fh.write(_json.dumps(rec, ensure_ascii=False))
                    fh.write("\n")
                    rows += 1
        return _FileCommit(fname, rows)

    def commit(self, messages):
        """Driver-side publish: move committed parts out of staging and
        write the manifest ATOMICALLY (tmp + rename). A reader that races
        this commit sees either the previous manifest or the new one,
        never a partial file list."""
        import json as _json
        import os

        final = []
        total = 0
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, dest)
            final.append(os.path.basename(dest))
            total += m.rows
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as fh:
            _json.dump({"files": sorted(final), "rows": total}, fh)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class PyJsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> PyJsonlArrowWriter:
        import os
        import shutil

        path = self.options["path"]
        if overwrite and os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        return PyJsonlArrowWriter(path)


def register_pyjsonl(spark) -> str:
    spark.dataSource.register(PyJsonlSink)
    return PyJsonlSink.name()


def read_pyjsonl(spark, path: str, schema):
    """Manifest-scoped read of a :class:`PyJsonlSink` table: only files the
    last successful commit published are scanned — uncommitted staging
    files and orphans from failed attempts are invisible, which is the
    reader half of the atomicity contract."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = _json.load(fh)
    files = [os.path.join(path, f) for f in manifest["files"]]
    return spark.read.schema(schema).json(files)
