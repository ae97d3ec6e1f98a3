"""Custom Python data source (E2 extensibility, Spark 4 DataSource API).

Spark 4 lets a connector be written in pure Python — schema, partition
planning, and per-partition reads — and registered like any built-in
format. This module ships a small but real one: a deterministic
synthetic-table source ("graftgen") that fans generation out across N
partitions, the connector-side twin of the reference's "turn Python
sequences into distributed work" surface
(``/root/reference/aics_dask_utils/distributed_handler.py:93-144``).

Scale notes (how a real connector should behave, demonstrated here):

- **partition planning is metadata-only**: ``partitions()`` returns one
  descriptor per split; no data is produced on the driver;
- **reads are executor-side and independent**: each ``read(partition)``
  generates only its own row range — the shape of a JDBC range reader,
  a Kafka offset-range reader, or a REST paginator;
- **deterministic content**: rows derive from the global row id, so the
  result is independent of the partition count (asserted in tests and
  the registered plan's oracle).

Registration is per-session: ``spark.dataSource.register(GraftGenSource)``,
then ``spark.read.format("graftgen").option(...).load()``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _row(i: int):
    """Deterministic row for global id ``i`` — pure function of ``i`` so
    any partitioning yields the same table."""
    label = ("alpha", "beta", "gamma", "delta", "epsilon")[i % 5]
    return (i, label, float(i) * 0.5, i * i % 97)


class GraftGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = max(1, int(options.get("n_parts", 4)))

    def partitions(self) -> Sequence[InputPartition]:
        if self.n_rows <= 0:
            # empty table: one empty split (zero splits confuse the
            # engine less than a zero range-step crashes us)
            return [_RangePartition(0, 0)]
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class GraftGenSource(DataSource):
    """``spark.read.format("graftgen").option("n_rows", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "graftgen"

    def schema(self) -> str:
        return "id bigint, label string, score double, bucket bigint"

    def reader(self, schema) -> GraftGenReader:
        return GraftGenReader(self.options)


def register_graftgen(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(GraftGenSource)


# ---------------------------------------------------------------------------
# Writer half of the connector lifecycle: executor-side partition writes
# with a driver-side atomic commit (the two-phase protocol every real
# sink — object store, warehouse, per-row file sink (E6) — follows).
# ---------------------------------------------------------------------------

import dataclasses


@dataclasses.dataclass
class _PartCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    path: str = ""
    n_rows: int = 0


_STAGING_PREFIX = "_staging-"


def _locked_success(path: str):
    """Advisory exclusive lock serializing commit-time read-merge-write
    of the ``_SUCCESS`` manifest: two concurrent append jobs to the same
    path must not lose each other's manifest entries. The lock file is
    separate from the manifest so the atomic os.replace of ``_SUCCESS``
    itself is never racing the lock."""
    import fcntl
    import os
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        lock_path = os.path.join(path, ".graftsink.lock")
        with open(lock_path, "a+") as lf:
            fcntl.flock(lf.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf.fileno(), fcntl.LOCK_UN)

    return _ctx()


def _write_manifest_atomic(mpath: str, manifest: dict) -> None:
    """Manifests are the commit point of the protocol, so their write
    must itself be atomic: dump to a temp file in the same directory
    and rename over the target (POSIX rename atomicity). A crash
    mid-write leaves the OLD manifest intact instead of a truncated
    JSON that would fail every subsequent read."""
    import json
    import os

    # dot-prefixed temp name: a crash between open and replace must
    # not leave a file that prefix-scanning consumers (startswith
    # "_manifest-" / "_SUCCESS") or suffix globs could pick up
    d, base = os.path.split(mpath)
    tmp = os.path.join(d, f".{base}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mpath)


def read_graft_manifest(path: str) -> list[str]:
    """Resolve the committed file list of a graftsink output directory.

    Readers must trust the ``_SUCCESS`` manifest, never a glob: a task
    that died mid-write leaves a partial part file in its job's
    ``_staging-*/`` dir that no commit message names, and a glob
    re-scan would read partial/duplicate rows. Returns absolute paths
    of exactly the files commit() promoted — possibly an empty list
    for a committed zero-file write (callers feeding ``spark.read``
    should use :func:`read_graft_table`, which handles that case).
    """
    import json
    import os

    with open(os.path.join(path, "_SUCCESS"), "r", encoding="utf-8") as f:
        manifest = json.load(f)
    return [os.path.join(path, name) for name in manifest["files"]]


def read_graft_table(spark, path: str):
    """Load a committed graftsink directory as a one-column ``value``
    string DataFrame (the raw line form; callers split on the \\x1f
    separator). Unlike ``spark.read.text(read_graft_manifest(path))``
    this is total: a committed manifest naming ZERO files (a
    zero-partition write) yields a typed empty frame instead of the
    unhelpful error ``spark.read.text([])`` raises."""
    files = read_graft_manifest(path)
    if not files:
        return spark.createDataFrame([], "value string")
    return spark.read.text(files)


class GraftFileWriter(DataSourceWriter):
    """Writes each partition as one part file staged under the job's
    ``<path>/_staging-<jobid>/``; commit() promotes ONLY the files
    named in commit messages into ``<path>`` and then publishes the
    _SUCCESS manifest, abort() removes the staging directory. Task
    retries and speculative duplicates are safe: an attempt that dies
    mid-write leaves its partial file in staging where neither commit()
    nor a manifest-driven reader (``read_graft_manifest``) can see
    it — the same visibility contract as Spark's own file commit
    protocol. Overwrite is atomic at the manifest swap: the prior
    committed files are retracted only AFTER the new manifest is in
    place, so a failed or aborted overwrite leaves the previous
    committed table fully readable.

    Concurrent writers to the same path are safe: each write JOB stages
    under its own ``_staging-<jobid>/`` directory (chosen driver-side in
    ``__init__`` and carried to executors in the pickled writer), so one
    job's commit/abort sweep can never delete another in-flight job's
    staged parts, and the append-mode read-merge-write of ``_SUCCESS``
    is serialized under an advisory file lock. A job that crashes before
    commit/abort leaves its staging directory behind; it is inert —
    invisible to manifest-trusting readers and never swept by other
    jobs (no commit can tell a crashed job's staging from an in-flight
    one's) — so reclaim stale ``_staging-*`` dirs out-of-band once no
    write is running."""

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("graftsink requires .option('path', ...)")
        self.overwrite = overwrite
        # job-scoped staging: picked once on the driver, shared by all
        # tasks of THIS write job only
        self._staging = f"{_STAGING_PREFIX}{uuid.uuid4().hex[:12]}"

    def write(self, iterator) -> _PartCommit:
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        staging = os.path.join(self.path, self._staging)
        os.makedirs(staging, exist_ok=True)
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.graft"
        full = os.path.join(staging, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write("\x1f".join("" if v is None else str(v) for v in row))
                f.write("\n")
                n += 1
        return _PartCommit(path=full, n_rows=n)

    def commit(self, messages) -> None:
        import json
        import os
        import shutil

        # a zero-task write (empty zero-partition frame) never ran
        # write(), so nothing created the output dir yet — the commit
        # of an empty-but-valid manifest must still succeed
        os.makedirs(self.path, exist_ok=True)
        # promote exactly the staged files the successful attempts
        # named; anything else in this job's staging is a dead
        # attempt's orphan
        names = []
        for m in messages:
            if m is None or not m.path:
                continue
            name = os.path.basename(m.path)
            os.replace(m.path, os.path.join(self.path, name))
            names.append(name)
        total = int(sum(m.n_rows for m in messages if m is not None))
        success = os.path.join(self.path, "_SUCCESS")
        # the manifest read-merge-write below must be a critical
        # section: two concurrent appends each read prior state and
        # write a merged manifest, and without mutual exclusion the
        # later writer would silently drop the earlier one's entries
        with _locked_success(self.path):
            prior_files: set[str] = set()
            if os.path.exists(success):
                with open(success, "r", encoding="utf-8") as f:
                    prior = json.load(f)
                prior_files = set(prior.get("files", []))
                if not self.overwrite:
                    # append mode MERGES with the prior committed manifest —
                    # a second append must not orphan the first write's rows
                    # from the manifest-trusting read path
                    names = sorted(prior_files | set(names))
                    total += int(prior.get("total_rows", 0))
            _write_manifest_atomic(
                success, {"files": sorted(names), "total_rows": total}
            )
        if self.overwrite:
            # retraction AFTER the new manifest swapped in: a crash at
            # any earlier point leaves the old manifest + files fully
            # readable (atomic overwrite); leftover old files after the
            # swap are invisible to manifest-trusting readers
            for name in prior_files - set(names):
                old = os.path.join(self.path, name)
                if os.path.exists(old):
                    os.remove(old)
        # sweep ONLY this job's staging — never another job's (a crashed
        # job's stale _staging-* dir is inert: invisible to
        # manifest-trusting readers, reclaimable out-of-band)
        shutil.rmtree(os.path.join(self.path, self._staging), ignore_errors=True)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, self._staging), ignore_errors=True)
        # defensive: also drop any message-named file that somehow
        # escaped staging (e.g. a future layout change)
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)


class GraftSinkSource(DataSource):
    """``df.write.format("graftsink").option("path", ...).save()``."""

    @classmethod
    def name(cls) -> str:
        return "graftsink"

    def writer(self, schema, overwrite: bool) -> GraftFileWriter:
        return GraftFileWriter(self.options, overwrite)


def register_graftsink(spark) -> None:
    spark.dataSource.register(GraftSinkSource)


# ---------------------------------------------------------------------------
# Streaming third of the connector lifecycle: a pure-Python micro-batch
# stream source with explicit offsets (the Kafka-offset/CDC-cursor
# shape). Offsets are dicts checkpointed by the engine; replay of a
# committed range (readBetweenOffsets) must be deterministic, which is
# exactly what a row-id-derived table gives — that determinism is what
# makes end-to-end exactly-once recovery possible.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class GraftGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = max(1, int(options.get("batch_rows", 100)))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_rows, self.n_rows)
        # iter(list), NOT a generator or bare list: the engine caches the
        # prefetched batch until commit and copy.copy()s the iterator on
        # replan — generators can't be copied, lists aren't iterators;
        # a list_iterator is both
        return (iter([_row(i) for i in range(lo, hi)]), {"next": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        # deterministic replay of a checkpointed range (failure recovery)
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])


class GraftGenStreamSource(DataSource):
    """``spark.readStream.format("graftgen_stream")`` — bounded: emits
    ``n_rows`` across ceil(n_rows/batch_rows) micro-batches, then idles
    (empty batches), so availableNow-style drains terminate."""

    @classmethod
    def name(cls) -> str:
        return "graftgen_stream"

    def schema(self) -> str:
        return "id bigint, label string, score double, bucket bigint"

    def simpleStreamReader(self, schema) -> GraftGenStreamReader:
        return GraftGenStreamReader(self.options)


def register_graftgen_stream(spark) -> None:
    spark.dataSource.register(GraftGenStreamSource)


# ---------------------------------------------------------------------------
# Fourth corner of the connector matrix (batch/stream x read/write): a
# pure-Python STREAMING sink. Each micro-batch's partitions stage part
# files executor-side; commit(messages, batchId) publishes a per-epoch
# manifest — the idempotent-epoch contract (a replayed batch id simply
# overwrites its own manifest, so downstream readers that trust
# manifests get exactly-once).
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceStreamWriter


class GraftStreamFileWriter(DataSourceStreamWriter):
    """HARD CONTRACT: one streaming query per output path. The
    committed namespace is per-path ``_manifest-<batchId>`` — epoch
    numbers only mean anything within a single query's checkpoint
    lineage, so a second concurrent query writing the same path would
    collide on batch ids and replay-retract the first query's
    committed files. The query-scoped staging dir below only protects
    the STAGED parts of a query that is shutting down while its
    replacement (same checkpoint, hence same epoch sequence) starts up;
    it does not make two independent queries on one path meaningful."""

    def __init__(self, options):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("graftsink_stream requires .option('path', ...)")
        # query-scoped staging: a successor/overlapping instance of the
        # query can never sweep this instance's staged parts
        self._staging = f"{_STAGING_PREFIX}{uuid.uuid4().hex[:12]}"

    def write(self, iterator) -> _PartCommit:
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        staging = os.path.join(self.path, self._staging)
        os.makedirs(staging, exist_ok=True)
        name = f"epoch-{uuid.uuid4().hex[:12]}-p{pid:05d}.graft"
        full = os.path.join(staging, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write("\x1f".join("" if v is None else str(v) for v in row))
                f.write("\n")
                n += 1
        return _PartCommit(path=full, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        import shutil

        # an all-empty epoch may have run zero write() tasks on a
        # fresh path; its (empty) manifest must still publish
        os.makedirs(self.path, exist_ok=True)
        # Same ordering invariant as the batch overwrite path: promote
        # first, swap the manifest in atomically, retract LAST. A
        # REPLAYED batch id (restart between commit and the engine
        # recording the epoch) therefore never has a window where the
        # on-disk _manifest-N references deleted files — a crash at any
        # point leaves either the old attempt fully readable or the new
        # one; part names are uuid-suffixed so attempts never collide.
        mpath = os.path.join(self.path, f"_manifest-{batchId:010d}.json")
        prior_files: set[str] = set()
        if os.path.exists(mpath):
            with open(mpath, "r", encoding="utf-8") as f:
                prior_files = set(json.load(f).get("files", []))
        # promote the staged files this epoch's successful attempts
        # named; dead attempts' orphans stay invisible in staging and
        # are swept below (micro-batches are sequential, so nothing
        # else is staging in this job's directory).
        names = []
        for m in messages:
            if m is None or not m.path:
                continue
            name = os.path.basename(m.path)
            os.replace(m.path, os.path.join(self.path, name))
            names.append(name)
        _write_manifest_atomic(
            mpath,
            {
                "batch_id": int(batchId),
                "files": sorted(names),
                "rows": int(sum(m.n_rows for m in messages if m is not None)),
            },
        )
        # retraction of the replaced attempt's files AFTER the swap:
        # these are unreferenced by any manifest from here on
        for name in prior_files - set(names):
            old = os.path.join(self.path, name)
            if os.path.exists(old):
                os.remove(old)
        shutil.rmtree(os.path.join(self.path, self._staging), ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        import os
        import shutil

        # sweep this query's whole staging dir, not just message-named
        # files: a task that died mid-write has no commit message, and
        # epochs are sequential so no other batch of THIS query is
        # staging concurrently
        shutil.rmtree(os.path.join(self.path, self._staging), ignore_errors=True)
        for m in messages:
            if m and m.path and os.path.exists(m.path):
                os.remove(m.path)


class GraftStreamSinkSource(DataSource):
    """``df.writeStream.format("graftsink_stream").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "graftsink_stream"

    def streamWriter(self, schema, overwrite: bool) -> GraftStreamFileWriter:
        return GraftStreamFileWriter(self.options)


def register_graftsink_stream(spark) -> None:
    spark.dataSource.register(GraftStreamSinkSource)
