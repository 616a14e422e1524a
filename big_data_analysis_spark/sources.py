"""Custom connector via the Python DataSource API (Spark 4): a
deterministic synthetic-documents source with REAL filter pushdown and
partition pruning — the extension surface a user reaches for when the
data lives behind an API/format Spark has no built-in reader for.

Why it matters at 100 TB: a naive custom reader generates/fetches
everything and lets Spark filter afterwards; this one implements
``pushFilters`` so `source = 'web'` / `source IN (...)` predicates
prune whole input partitions BEFORE any row is produced (each
partition carries one source label). Every partition generates rows
from (seed, partition_id, row_index) hashes only — no RNG state, no
driver-side data, fully rerun-stable, so task retries are exact
replays (the same property the parquet scans get for free).

Usage::

    register_synthdocs(spark)
    df = (spark.read.format("synthdocs")
          .option("rows", 100000).option("partitions", 64)
          .load().filter(F.col("source") == "web"))
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.session import SparkSession

SYNTH_SOURCES = ("web", "books", "code", "wiki")
_WORDS = (
    "data spark shuffle join scan filter window stream batch merge "
    "vector token corpus sample dedup quality index bucket sketch plan"
).split()


def _h(*parts: object) -> int:
    """Stable 64-bit hash of the parts — the only randomness source."""
    raw = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def _pid_of(doc_id: int, n_rows: int, n_parts: int) -> int:
    """Invert the batch reader's (possibly uneven) contiguous layout:
    which partition id owns ``doc_id``. Partitions 0..extra-1 hold
    per+1 docs, the rest hold per. Keeping ONE inverse shared by the
    stream reader guarantees stream and batch assign identical source
    labels for ANY (rows, partitions), not just even splits."""
    per, extra = divmod(n_rows, n_parts)
    cut = (per + 1) * extra
    if doc_id < cut:
        return doc_id // (per + 1)
    return extra + (doc_id - cut) // per


def _doc_row(seed: str, doc_id: int, source: str) -> tuple:
    """The one generator: (doc_id, source, text, quality) as a pure
    function of (seed, doc_id). Batch reader, stream reader and the
    DuckDB replay oracle must all agree on this — which is why it
    exists exactly once."""
    bits = _h(seed, doc_id)
    n_words = 5 + bits % 20
    words = [_WORDS[_h(seed, doc_id, k) % len(_WORDS)] for k in range(n_words)]
    quality = (_h(seed, doc_id, "q") % 10**6) / 10**6
    return (doc_id, source, " ".join(words), quality)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = options.get("seed", "synth-v1")
        self.keep_sources = set(SYNTH_SOURCES)

    # -- pushdown ---------------------------------------------------------
    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Handle source-equality predicates natively; everything else
        stays with Spark. Returned filters must be the unhandled subset
        (by reference, per the API contract)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source",):
                self.keep_sources &= {f.value}
            elif isinstance(f, In) and f.attribute == ("source",):
                self.keep_sources &= set(f.value)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        """One source label per partition -> a pushed source predicate
        prunes partitions here, before any read() task is scheduled."""
        return [
            InputPartition(pid)
            for pid in range(self.n_parts)
            if SYNTH_SOURCES[pid % len(SYNTH_SOURCES)] in self.keep_sources
        ]

    # -- generation -------------------------------------------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        pid = partition.value
        source = SYNTH_SOURCES[pid % len(SYNTH_SOURCES)]
        per_part = self.n_rows // self.n_parts
        extra = self.n_rows % self.n_parts
        lo = pid * per_part + min(pid, extra)
        n = per_part + (1 if pid < extra else 0)
        for doc_id in range(lo, lo + n):
            yield _doc_row(self.seed, doc_id, source)


class SynthDocsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the SAME deterministic generator: the
    offset is simply the next row index, each trigger advances it by
    ``rows_per_batch`` until the ``rows`` cap saturates (then
    latestOffset stops moving and processAllAvailable() returns).

    Exactly-once contract: generation is a pure function of
    (seed, doc_id), so a replayed batch — partitions(start, end) from
    the checkpointed offset log after a crash — yields byte-identical
    rows; with an idempotent sink the pipeline is exactly-once without
    any source-side bookkeeping. Restart safety: on restart the engine
    re-delivers the recovered offset to the fresh reader BEFORE asking
    for new data — commit(end) after a fully-committed shutdown,
    partitions(start, end) for an in-flight replay (the contract
    pyspark's own _SimpleStreamReaderWrapper relies on; pinned by
    test_synthdocs_stream_full_commit_restart_emits_nothing). Both
    callbacks bump the internal cursor, so latestOffset never regresses
    below a checkpoint-recovered offset; a defensive guard additionally
    returns zero partitions for any empty/backwards range.

    ``partitions`` (label layout) matches the batch reader via the
    shared _pid_of layout inverse, so the stream's cumulative output is
    row-identical to one batch scan with the same options for ANY
    (rows, partitions) — even uneven splits. ``tasks_per_batch``
    controls physical parallelism per micro-batch independently of the
    label layout."""

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("rows", 1000))
        self.rpb = int(options.get("rows_per_batch", 250))
        self.n_labels = int(options.get("partitions", 8))
        self.tasks = max(1, int(options.get("tasks_per_batch", 4)))
        self.seed = options.get("seed", "synth-v1")
        self._next = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        self._next = min(self._next + self.rpb, self.total)
        return {"index": self._next}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["index"]), int(end["index"])
        self._next = max(self._next, lo, hi)
        if hi <= lo:
            # Defensive: never produce rows for an empty/backwards
            # range (the cursor is still bumped past it, above).
            return []
        n = max(1, min(self.tasks, hi - lo))
        step, extra = divmod(hi - lo, n)
        parts, cur = [], lo
        for i in range(n):
            size = step + (1 if i < extra else 0)
            parts.append(InputPartition((cur, cur + size)))
            cur += size
        return parts

    def commit(self, end: dict) -> None:
        self._next = max(self._next, int(end["index"]))

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            pid = _pid_of(doc_id, self.total, self.n_labels)
            source = SYNTH_SOURCES[pid % len(SYNTH_SOURCES)]
            yield _doc_row(self.seed, doc_id, source)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, source string, text string, quality double"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(dict(self.options))

    def streamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(dict(self.options))


def register_synthdocs(spark: SparkSession) -> None:
    """Idempotent registration of the synthdocs format. Also flips the
    Spark 4 gate for Python-source filter pushdown in case the session
    was not built by session.get_spark."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)


# ===========================================================================
# Sink side of the DataSource API: an atomic manifest-committed JSONL
# sink. Tasks write part files under a temp name and report them in
# their commit message; only the DRIVER's commit() publishes a
# _MANIFEST.json naming the files that constitute the dataset. Readers
# load manifest-listed files ONLY, so a torn job (task retries, orphan
# part files from a killed executor, a concurrent failed write) is
# invisible — the same visibility contract a table format's snapshot
# commit provides, in one small file. Parquet/ORC get this from Spark's
# own commit protocol; this is the pattern for custom sinks that don't.
# ===========================================================================


def _write_jsonl_part(path: str, fields: list, job_token: str, rows) -> tuple:
    """Executor-side part write shared by the batch and streaming
    manifest sinks: one uniquely-named jsonl file per task attempt
    ((job_token, taskAttemptId) — globally unique across application
    restarts), rows dumped with the declared field order. Returns
    (filename, n_rows); the file is invisible until a driver commit
    publishes a manifest naming it."""
    import json
    import os

    from pyspark import TaskContext

    ctx = TaskContext.get()
    fname = (
        f"part-{ctx.partitionId():05d}-{job_token}-{ctx.taskAttemptId()}.jsonl"
    )
    os.makedirs(path, exist_ok=True)
    n = 0
    with open(os.path.join(path, fname), "w", encoding="utf-8") as fh:
        for row in rows:
            fh.write(json.dumps(dict(zip(fields, row)), default=str))
            fh.write("\n")
            n += 1
    return fname, n


class _ManifestCommitMessage:
    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


try:  # WriterCommitMessage is a plain marker base class in Spark 4
    from pyspark.sql.datasource import (
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class ManifestCommitMessage(WriterCommitMessage, _ManifestCommitMessage):
        pass

    class ManifestJsonlWriter(DataSourceWriter):
        def __init__(self, options: dict, schema, overwrite: bool) -> None:
            import uuid

            self.path = options["path"]
            self.fields = [f.name for f in schema.fields]
            self.overwrite = overwrite
            # Optional exactly-once handle for foreachBatch pipelines:
            # with .option("batch_id", <epoch>) the commit publishes a
            # per-batch _BATCH_{id}.json manifest (the streaming
            # writer's protocol) instead of _MANIFEST.json — a replayed
            # micro-batch re-running the SAME foreachBatch body finds
            # its manifest already published, discards the duplicate
            # part files and returns. This is what lets arbitrary
            # batch-only logic (anti joins, groupBy dedup) live inside
            # foreachBatch WITHOUT giving up the sink's exactly-once
            # guarantee (r7: streaming corpus refresh).
            self.batch_id = (
                int(options["batch_id"]) if "batch_id" in options else None
            )
            # Per-JOB token baked into every part filename:
            # (partitionId, taskAttemptId) alone is only unique within
            # one SparkContext, so an append from a restarted
            # application would reuse the same names and clobber prior
            # committed files. The token makes filenames globally
            # unique; within-job task retries stay unique via
            # taskAttemptId.
            self.job_token = uuid.uuid4().hex[:12]

        def write(self, rows) -> "ManifestCommitMessage":
            """Executor side: write this partition to a uniquely-named
            part file (shared _write_jsonl_part) — a retried task
            writes a DIFFERENT file and the loser's output is simply
            never referenced by the manifest."""
            return ManifestCommitMessage(
                *_write_jsonl_part(self.path, self.fields, self.job_token, rows)
            )

        def commit(self, messages) -> None:
            """Driver side, runs once after EVERY task succeeded: the
            manifest write is the atomic publish point. The save mode
            is honored here — append MERGES the existing manifest's
            file list (prior committed data stays visible), overwrite
            publishes only this job's files (the old files become
            invisible orphans the instant the manifest swaps). The
            read-merge-replace runs under an exclusive flock on a
            sidecar lock file so two concurrent append jobs cannot
            lose each other's files (POSIX local/NFS-with-locking
            semantics; where flock is unavailable — Windows, some
            object stores — the commit proceeds lock-free and
            concurrent appends must be serialized externally)."""
            import json
            import os

            try:
                import fcntl
            except ImportError:  # pragma: no cover - non-POSIX driver
                fcntl = None

            # The directory is normally created executor-side in write(),
            # but a job that schedules ZERO write tasks (empty
            # 0-partition input) reaches commit() with no directory —
            # it must still publish an (empty) manifest, not crash
            # opening the lock file (ADVICE r5).
            os.makedirs(self.path, exist_ok=True)
            files = [
                {"name": m.filename, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ]
            if self.batch_id is not None:
                # foreachBatch exactly-once path: per-batch manifest,
                # replay-idempotent (the streaming writer's protocol).
                mpath = os.path.join(self.path, f"_BATCH_{self.batch_id}.json")
                if os.path.exists(mpath):
                    for f in files:
                        try:
                            os.remove(os.path.join(self.path, f["name"]))
                        except OSError:
                            pass
                    return
                tmp = mpath + ".tmp"
                with open(tmp, "w", encoding="utf-8") as fh:
                    json.dump(
                        {
                            "batch_id": self.batch_id,
                            "files": files,
                            "total_rows": sum(f["n_rows"] for f in files),
                        },
                        fh,
                    )
                os.replace(tmp, mpath)
                return
            mpath = os.path.join(self.path, "_MANIFEST.json")
            lock_path = os.path.join(self.path, "._MANIFEST.lock")
            with open(lock_path, "w") as lock_fh:
                if fcntl is not None:
                    fcntl.flock(lock_fh, fcntl.LOCK_EX)
                if not self.overwrite and os.path.exists(mpath):
                    with open(mpath, encoding="utf-8") as fh:
                        files = json.load(fh)["files"] + files
                manifest = {
                    "files": files,
                    "total_rows": sum(f["n_rows"] for f in files),
                }
                tmp = os.path.join(self.path, "._MANIFEST.json.tmp")
                with open(tmp, "w", encoding="utf-8") as fh:
                    json.dump(manifest, fh)
                os.replace(tmp, mpath)

        def abort(self, messages) -> None:
            """Best-effort cleanup; correctness never depends on it —
            unreferenced part files are ignored by the reader."""
            import os

            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    class ManifestJsonlStreamWriter(DataSourceStreamWriter):
        """Streaming side of the manifest sink: one atomic
        ``_BATCH_{id}.json`` manifest per committed micro-batch, so the
        sink is EXACTLY-ONCE under replay — on restart the engine
        re-runs the last in-flight batch with the SAME batchId; commit
        sees that batch's manifest already published, discards the
        replay attempt's duplicate part files, and returns. A reader
        (read_manifest_jsonl_stream) unions manifest-listed files only,
        so a torn batch (crash between task writes and commit) is
        invisible exactly like a torn batch job.

        This is the general recipe for custom streaming sinks to
        targets with no transactional append: idempotence comes from
        the (batchId -> manifest) rename being the single publish
        point, not from the target supporting transactions."""

        def __init__(self, options: dict, schema) -> None:
            import uuid

            self.path = options["path"]
            self.fields = [f.name for f in schema.fields]
            self.job_token = uuid.uuid4().hex[:12]

        def write(self, rows) -> "ManifestCommitMessage":
            return ManifestCommitMessage(
                *_write_jsonl_part(self.path, self.fields, self.job_token, rows)
            )

        def _batch_manifest(self, batch_id: int) -> str:
            import os

            return os.path.join(self.path, f"_BATCH_{batch_id}.json")

        def commit(self, messages, batchId: int) -> None:
            import json
            import os

            os.makedirs(self.path, exist_ok=True)
            files = [
                {"name": m.filename, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ]
            mpath = self._batch_manifest(batchId)
            if os.path.exists(mpath):
                # Replayed batch: a prior attempt already published.
                # This attempt's part files are duplicates of committed
                # data — remove them so they never count twice.
                for f in files:
                    try:
                        os.remove(os.path.join(self.path, f["name"]))
                    except OSError:
                        pass
                return
            tmp = mpath + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(
                    {
                        "batch_id": batchId,
                        "files": files,
                        "total_rows": sum(f["n_rows"] for f in files),
                    },
                    fh,
                )
            os.replace(tmp, mpath)

        def abort(self, messages, batchId: int) -> None:
            import os

            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    class ManifestJsonlDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "manifest_jsonl"

        def writer(self, schema, overwrite: bool) -> ManifestJsonlWriter:
            return ManifestJsonlWriter(dict(self.options), schema, overwrite)

        def streamWriter(self, schema, overwrite: bool) -> ManifestJsonlStreamWriter:
            return ManifestJsonlStreamWriter(dict(self.options), schema)

    _HAS_WRITER_API = True
except ImportError:  # pragma: no cover - older pyspark without writer API
    _HAS_WRITER_API = False


def register_manifest_jsonl(spark: SparkSession) -> None:
    """Idempotent registration of the manifest_jsonl sink format."""
    if not _HAS_WRITER_API:
        raise RuntimeError(
            "manifest_jsonl sink needs the Spark 4 Python DataSource "
            "writer API (pyspark.sql.datasource.DataSourceWriter)"
        )
    spark.dataSource.register(ManifestJsonlDataSource)


def read_manifest_jsonl(spark: SparkSession, path: str, schema: str):
    """Load ONLY the files the manifest names — orphan part files from
    failed/torn writes are invisible, completing the sink's atomicity
    contract. The manifest is one small JSON read on the driver; the
    listed files load through Spark's normal distributed JSON reader."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    files = [os.path.join(path, f["name"]) for f in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def read_manifest_jsonl_stream(spark: SparkSession, path: str, schema: str):
    """Batch-read everything the STREAMING manifest sink has committed:
    the union of all ``_BATCH_{id}.json`` manifests' files, in batch-id
    order. Orphan part files from torn/replayed batches are invisible
    (they appear in no manifest), completing the sink's exactly-once
    contract on the read side."""
    import glob
    import json
    import os

    files: list[str] = []
    for mpath in sorted(
        glob.glob(os.path.join(path, "_BATCH_*.json")),
        key=lambda p: int(os.path.basename(p)[len("_BATCH_"):-len(".json")]),
    ):
        with open(mpath, encoding="utf-8") as fh:
            files.extend(
                os.path.join(path, f["name"]) for f in json.load(fh)["files"]
            )
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
