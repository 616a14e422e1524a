"""Python DataSource API connector (sources.py): determinism, row
accounting, and — the scale property — that source predicates prune
input partitions inside the connector rather than filtering after."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analysis_spark.sources import SYNTH_SOURCES, register_synthdocs


def _load(spark, **opts):
    register_synthdocs(spark)
    r = spark.read.format("synthdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthdocs_rowcount_schema_and_determinism(spark):
    df = _load(spark, rows=1000, partitions=8)
    assert df.count() == 1000
    assert [f.name for f in df.schema.fields] == ["doc_id", "source", "text", "quality"]
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _load(spark, rows=1000, partitions=8).collect()))
    assert a == b
    # doc_ids are a exact partition of [0, 1000) even with uneven splits
    ids = [r[0] for r in a]
    assert ids == list(range(1000))


def test_synthdocs_uneven_split_accounts_every_row(spark):
    df = _load(spark, rows=103, partitions=8)
    assert df.count() == 103
    assert df.select("doc_id").distinct().count() == 103


def test_synthdocs_source_filter_prunes_partitions(spark):
    """EqualTo('source', 'web') must reach pushFilters and drop 6 of 8
    input partitions before scheduling — observable as the scan's task
    count, not just the row values."""
    df = _load(spark, rows=1000, partitions=8).filter(F.col("source") == "web")
    assert df.rdd.getNumPartitions() == 2
    rows = df.collect()
    assert rows and all(r["source"] == "web" for r in rows)
    # IN-list pushdown keeps two labels -> 4 of 8 partitions
    df2 = _load(spark, rows=1000, partitions=8).filter(
        F.col("source").isin("web", "code")
    )
    assert df2.rdd.getNumPartitions() == 4


def test_synthdocs_residual_filter_stays_correct(spark):
    """A non-source predicate is NOT pushed (returned to Spark) and the
    combined query still computes correctly."""
    df = _load(spark, rows=1000, partitions=8).filter(
        (F.col("source") == "books") & (F.col("quality") > 0.5)
    )
    rows = df.collect()
    assert all(r["source"] == "books" and r["quality"] > 0.5 for r in rows)
    full = _load(spark, rows=1000, partitions=8).collect()
    expect = sum(1 for r in full if r["source"] == "books" and r["quality"] > 0.5)
    assert len(rows) == expect


def test_synthdocs_feeds_engine_operators(spark):
    """The connector output flows into the normal operator stack (the
    point of a DataSource: everything downstream is just a DataFrame)."""
    from big_data_analysis_spark.operators import relational as rel

    df = _load(spark, rows=400, partitions=4)
    top = rel.top_k_per_group(
        df, ["source"], [F.col("quality").desc(), F.col("doc_id")], 3
    )
    assert top.count() == 3 * len(SYNTH_SOURCES)


def test_manifest_jsonl_sink_atomic_visibility(spark):
    """The DataSource WRITER surface: tasks write uniquely-named part
    files, the driver's commit publishes _MANIFEST.json, and the reader
    loads manifest-listed files ONLY — an orphan part file planted in
    the directory (a torn write / killed-executor leftover) is
    invisible. Row fidelity is exact through the roundtrip."""
    import json
    import os
    import shutil

    from big_data_analysis_spark.sources import (
        read_manifest_jsonl,
        register_manifest_jsonl,
    )

    path = "/root/repo/.scratch/manifest-sink"
    shutil.rmtree(path, ignore_errors=True)
    register_manifest_jsonl(spark)

    df = spark.range(100).selectExpr(
        "id", "concat('doc-', id) AS name", "cast(id * 1.5 as double) AS score"
    ).repartition(4)
    df.write.format("manifest_jsonl").option("path", path).mode("append").save()

    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["total_rows"] == 100
    assert sum(f["n_rows"] for f in manifest["files"]) == 100
    part_files = [f for f in os.listdir(path) if f.startswith("part-")]
    assert sorted(part_files) == sorted(f["name"] for f in manifest["files"])

    # torn-write simulation: an orphan part file must stay invisible
    with open(os.path.join(path, "part-99999-0.jsonl"), "w") as fh:
        fh.write('{"id": 424242, "name": "ghost", "score": 0.0}\n')

    back = read_manifest_jsonl(
        spark, path, "id long, name string, score double"
    )
    rows = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert len(rows) == 100 and 424242 not in rows
    assert rows[7] == ("doc-7", 10.5)

    # append MERGES the manifest: a second batch extends, not replaces
    df2 = spark.range(100, 150).selectExpr(
        "id", "concat('doc-', id) AS name", "cast(id * 1.5 as double) AS score"
    ).repartition(2)
    df2.write.format("manifest_jsonl").option("path", path).mode("append").save()
    appended = read_manifest_jsonl(
        spark, path, "id long, name string, score double"
    )
    assert appended.count() == 150
    with open(os.path.join(path, "_MANIFEST.json")) as fh:
        assert json.load(fh)["total_rows"] == 150

    # overwrite publishes ONLY the new job's files
    df2.write.format("manifest_jsonl").option("path", path).mode(
        "overwrite"
    ).save()
    replaced = read_manifest_jsonl(
        spark, path, "id long, name string, score double"
    )
    assert replaced.count() == 50


def test_manifest_sink_zero_task_job_publishes_empty_manifest(spark):
    """ADVICE r5: a job that schedules ZERO write tasks reaches commit()
    with no output directory (the directory is normally created
    executor-side in write()) — commit must still publish an (empty)
    manifest instead of crashing on the missing lock file. Spark's
    scheduler happens to coalesce even a 0-partition plan to one write
    task today, so the zero-task contract is pinned at the writer
    level: commit() with no prior write() call and no directory."""
    import json
    import os
    import shutil

    from pyspark.sql.types import StringType, StructField, StructType

    from big_data_analysis_spark.sources import (
        ManifestJsonlWriter,
        read_manifest_jsonl,
    )

    path = "/root/repo/.scratch/manifest-empty"
    shutil.rmtree(path, ignore_errors=True)
    schema = StructType([StructField("v", StringType())])
    writer = ManifestJsonlWriter({"path": path}, schema, overwrite=True)
    writer.commit([])  # no write task ever ran; directory doesn't exist
    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as fh:
        manifest = json.load(fh)
    assert manifest == {"files": [], "total_rows": 0}
    assert read_manifest_jsonl(spark, path, "v string").count() == 0


def test_xml_roundtrip_exact_fidelity(spark, tmp_path):
    """write_xml -> read_xml is byte-exact for entity-laden, whitespace-
    padded, multiline, empty, null and CJK text; the reader's default
    whitespace trimming is opted out (preserve_whitespace=True)."""
    from big_data_analysis_spark.io import read_xml, write_xml

    rows = [
        (1, "plain"),
        (2, "with <tag> & ampersand \"quotes\" 'single'"),
        (3, "  leading/trailing  "),
        (4, "line1\nline2\ttab"),
        (5, ""),
        (6, None),
        (7, "蔬菜价格 ✓"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    path = str(tmp_path / "xmlrt")
    write_xml(df, path, row_tag="doc", root_tag="docs")
    back = read_xml(spark, path, row_tag="doc", schema="id long, text string")
    got = {r["id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)
    trimmed = read_xml(
        spark, path, row_tag="doc", schema="id long, text string",
        preserve_whitespace=False,
    )
    got_t = {r["id"]: r["text"] for r in trimmed.collect()}
    assert got_t[3] == "leading/trailing"


def test_synthdocs_stream_matches_batch_and_bounds_batches(spark, tmp_path):
    """The streaming reader's cumulative output is row-identical to one
    batch scan with the same options; every micro-batch respects
    rows_per_batch; the saturating offset ends the stream."""
    import uuid

    from big_data_analysis_spark.sources import register_synthdocs

    register_synthdocs(spark)
    name = f"synthstream_t_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.format("synthdocs")
        .option("rows", 1000).option("partitions", 8)
        .option("rows_per_batch", 300).load()
    )
    q = (
        stream.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    out = spark.table(name)
    batch = (
        spark.read.format("synthdocs")
        .option("rows", 1000).option("partitions", 8).load()
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0
    sizes = [p["numInputRows"] for p in progress if p["numInputRows"] > 0]
    assert sum(sizes) == 1000 and max(sizes) <= 300, sizes


def test_synthdocs_stream_restart_is_exactly_once(spark, tmp_path):
    """Kill the stream after the first micro-batch, restart from the
    same checkpoint into the same file sink: the deterministic replay +
    the sink's commit log must yield each row exactly once."""
    from big_data_analysis_spark.sources import register_synthdocs

    register_synthdocs(spark)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("synthdocs")
            .option("rows", 1000).option("partitions", 8)
            .option("rows_per_batch", 250).load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    import time

    q = start()
    try:
        deadline = time.time() + 60
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        assert q.recentProgress, "no batch completed within 60s"
    finally:
        q.stop()
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == 1000
    assert got.select("doc_id").distinct().count() == 1000


def test_manifest_stream_sink_exactly_once_and_orphan_invisible(spark, tmp_path):
    """Custom streaming sink: per-batch atomic manifests; a planted
    orphan part file (torn batch) is invisible to the reader; a
    kill-and-restart drains to exactly-once."""
    import glob
    import time

    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
        register_synthdocs,
    )

    register_synthdocs(spark)
    register_manifest_jsonl(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    schema = "doc_id bigint, source string, text string, quality double"

    def start():
        return (
            spark.readStream.format("synthdocs")
            .option("rows", 1000).option("partitions", 8)
            .option("rows_per_batch", 250).load()
            .writeStream.format("manifest_jsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    q = start()
    try:
        deadline = time.time() + 60
        while not q.recentProgress and time.time() < deadline:
            time.sleep(0.2)
        assert q.recentProgress, "no batch completed within 60s"
    finally:
        q.stop()
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # plant an orphan part file: must stay invisible (no manifest names it)
    with open(f"{out}/part-99999-deadbeef-0.jsonl", "w") as fh:
        fh.write('{"doc_id": 424242, "source": "web", "text": "x", "quality": 0.5}\n')
    got = read_manifest_jsonl_stream(spark, out, schema)
    assert got.count() == 1000
    assert got.select("doc_id").distinct().count() == 1000
    assert got.filter("doc_id = 424242").count() == 0
    batch = (
        spark.read.format("synthdocs")
        .option("rows", 1000).option("partitions", 8).load()
    )
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
    assert glob.glob(f"{out}/_BATCH_*.json")


def test_manifest_stream_sink_duplicate_commit_discards_replay(tmp_path):
    """Driver-level replay contract: commit() called twice with the
    same batchId keeps the FIRST manifest and deletes the second
    attempt's duplicate part files."""
    import json
    import os

    from pyspark.sql.types import StructType

    from big_data_analysis_spark.sources import (
        ManifestCommitMessage,
        ManifestJsonlDataSource,
    )

    path = str(tmp_path / "sink")
    os.makedirs(path)
    schema = StructType.fromDDL("doc_id bigint, text string")
    w = ManifestJsonlDataSource(options={"path": path}).streamWriter(schema, False)
    for fname, payload in (("a.jsonl", "first"), ("b.jsonl", "replay")):
        with open(os.path.join(path, fname), "w") as fh:
            fh.write(json.dumps({"doc_id": 1, "text": payload}) + "\n")
    w.commit([ManifestCommitMessage("a.jsonl", 1)], batchId=7)
    w.commit([ManifestCommitMessage("b.jsonl", 1)], batchId=7)  # replay
    with open(os.path.join(path, "_BATCH_7.json")) as fh:
        manifest = json.load(fh)
    assert [f["name"] for f in manifest["files"]] == ["a.jsonl"]
    assert not os.path.exists(os.path.join(path, "b.jsonl"))
    assert os.path.exists(os.path.join(path, "a.jsonl"))


def test_synthdocs_stream_uneven_split_label_parity(spark, tmp_path):
    """rows % partitions != 0: the stream reader's shared layout
    inverse must assign the SAME source labels as the batch reader's
    uneven contiguous layout (1000/7 -> first 6 partitions hold 143,
    the last 142)."""
    import uuid

    from big_data_analysis_spark.sources import register_synthdocs

    register_synthdocs(spark)
    name = f"uneven_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("synthdocs")
        .option("rows", 1000).option("partitions", 7)
        .option("rows_per_batch", 301).load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name)
    batch = (
        spark.read.format("synthdocs")
        .option("rows", 1000).option("partitions", 7).load()
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_synthdocs_stream_full_commit_restart_emits_nothing(spark, tmp_path):
    """Restart after a FULLY-committed shutdown: the engine re-delivers
    the recovered offset (commit callback) before asking for new data,
    so the fresh reader's cursor jumps to the cap and zero rows are
    re-emitted — the case where a naive cursor would regress to 0 and
    re-emit rows 250..cap as duplicate forward batches."""
    from big_data_analysis_spark.sources import register_synthdocs

    register_synthdocs(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("synthdocs")
            .option("rows", 1000).option("partitions", 8)
            .option("rows_per_batch", 250).load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 1000
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert got.select("doc_id").distinct().count() == 1000


def test_manifest_batch_writer_batch_id_replay_idempotent(spark, tmp_path):
    """The batch writer's foreachBatch handle: .option("batch_id", N)
    publishes a per-batch _BATCH_{N}.json manifest and a REPLAY of the
    same batch id (a restarted foreachBatch re-running its body,
    possibly with different recomputed content) is discarded — the
    first commit wins and its rows are what the reader sees. Distinct
    batch ids accumulate; the plain path (_MANIFEST.json) is untouched
    by batch_id commits."""
    import json
    import os

    from big_data_analysis_spark.sources import (
        read_manifest_jsonl_stream,
        register_manifest_jsonl,
    )

    register_manifest_jsonl(spark)
    out = str(tmp_path / "out")
    schema = "k bigint, v string"

    def write(df, bid):
        (
            df.write.format("manifest_jsonl")
            .option("path", out)
            .option("batch_id", str(bid))
            .mode("append")
            .save()
        )

    first = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    write(first, 0)
    # replay of batch 0 with DIFFERENT content: must be discarded
    write(spark.createDataFrame([(9, "z")], schema), 0)
    write(spark.createDataFrame([(3, "c")], schema), 1)

    back = {
        (r["k"], r["v"])
        for r in read_manifest_jsonl_stream(spark, out, schema).collect()
    }
    assert back == {(1, "a"), (2, "b"), (3, "c")}
    manifests = sorted(
        f for f in os.listdir(out) if f.startswith("_BATCH_")
    )
    assert manifests == ["_BATCH_0.json", "_BATCH_1.json"]
    m0 = json.load(open(os.path.join(out, "_BATCH_0.json")))
    assert m0["total_rows"] == 2  # the first commit's rows, not the replay's
    # the replay attempt's part files were removed, not orphaned
    listed = {
        f["name"]
        for mf in manifests
        for f in json.load(open(os.path.join(out, mf)))["files"]
    }
    on_disk = {f for f in os.listdir(out) if f.startswith("part-")}
    assert on_disk == listed
    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
