"""Source/sink round-trip tests (E2, E4–E6).

Parquet scans are exercised by every oracle test; here we cover the
remaining formats: CSV and JSON-lines round-trips with explicit schemas
(the 100 TB default — schema inference is a full extra read pass),
in-memory aligned-sequence tables (the reference's multi-iterable zip,
reference ``distributed_handler.py:135-140``), Hive-partitioned writes
with partition-pruned reads, and the per-row side-effecting sink
(reference PNG writer pattern, ``scripts/test_aics_cluster.py:98-101``).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aics_dask_utils_spark.sources import (
    foreach_partition_sink,
    from_sequences,
    load_table,
    read_csv,
    read_json,
    write_partitioned,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("name", StringType()),
        StructField("grp", IntegerType()),
    ]
)


@pytest.fixture(scope="module")
def small_df(spark):
    rows = [(i, f"name_{i}", i % 3) for i in range(100)]
    return spark.createDataFrame(rows, SCHEMA)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "t.csv")
    small_df.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path, schema=SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(small_df)


def test_csv_infer_schema(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csvi") / "t.csv")
    small_df.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, path)  # inference path
    assert back.count() == 100 and set(back.columns) == {"k", "name", "grp"}


def test_json_round_trip(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json") / "t.json")
    small_df.write.mode("overwrite").json(path)
    back = read_json(spark, path, schema=SCHEMA)
    assert _sorted_rows(back) == _sorted_rows(small_df)


def test_from_sequences_aligned(spark):
    df = from_sequences(spark, [1, 2, 3], ["a", "b", "c"], names=["n", "s"])
    assert _sorted_rows(df) == [(1, "a"), (2, "b"), (3, "c")]


def test_from_sequences_misaligned_raises(spark):
    with pytest.raises(ValueError):
        from_sequences(spark, [1, 2], [1])


def test_partitioned_write_prunes(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "t")
    write_partitioned(small_df, path, ["grp"])
    # one hive directory per partition value
    assert sorted(
        d for d in os.listdir(path) if d.startswith("grp=")
    ) == ["grp=0", "grp=1", "grp=2"]
    back = spark.read.parquet(path).where(F.col("grp") == 1)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the scan, not post-filter all rows
    assert "PartitionFilters" in plan
    assert back.count() == sum(1 for i in range(100) if i % 3 == 1)


def test_foreach_partition_sink_writes_rows(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sink")
    df = spark.range(20).repartition(4)

    def row_sink(row, state):
        with open(os.path.join(state, f"{row.id}.txt"), "w") as fh:
            fh.write(str(row.id))

    foreach_partition_sink(df, row_sink, open_partition=lambda: str(out))
    written = sorted(int(f.split(".")[0]) for f in os.listdir(out))
    assert written == list(range(20))


def test_events_nanos_timestamp(spark, sf_dir):
    # events.ts is TIMESTAMP(NANOS) parquet; reader must floor to micros
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName().startswith("timestamp")
    assert ev.where(F.col("ts").isNull()).count() == 0


def test_compacted_sink_bounds_file_count(spark, sf_dir):
    """The compaction sink must produce few, right-sized files: at most
    repartition-count parquet parts (maxRecordsPerFile only splits a
    task's output when it exceeds the cap)."""
    from aics_dask_utils_spark.plans import all_plans

    from aics_dask_utils_spark.plans.sources_plans import _tmp

    all_plans()["sink_compacted_files"].fn(spark, sf_dir).collect()
    out = _tmp(sf_dir, "compact")
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(parts) <= 4


def test_clustered_write_files_cover_disjoint_ranges(spark, sf_dir):
    """repartitionByRange + sortWithinPartitions must yield files whose
    key ranges don't interleave — the property parquet row-group stats
    need for data skipping."""
    from aics_dask_utils_spark.plans import all_plans

    from aics_dask_utils_spark.plans.sources_plans import _tmp

    all_plans()["sink_sorted_clustered"].fn(spark, sf_dir).collect()
    out = _tmp(sf_dir, "clustered")
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) >= 2
    ranges = []
    for p in parts:
        mm = (
            spark.read.parquet(os.path.join(out, p))
            .agg(F.min("l_shipdate"), F.max("l_shipdate"))
            .first()
        )
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_zorder_write_files_cover_disjoint_z_ranges(spark, sf_dir):
    """The Morton-key clustered files must not interleave in z — and
    because z-order locality is 2-D, each file's (partkey, suppkey)
    bounding box must be a strict sub-box of the table's (a single
    z-range never spans the full extent of both dimensions)."""
    from aics_dask_utils_spark.plans import all_plans

    from aics_dask_utils_spark.plans.sources_plans import _tmp

    all_plans()["sink_zorder_clustered"].fn(spark, sf_dir).collect()
    out = _tmp(sf_dir, "zorder")
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) >= 2
    ranges = []
    for p in parts:
        mm = (
            spark.read.parquet(os.path.join(out, p))
            .agg(F.min("zkey"), F.max("zkey"))
            .first()
        )
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_python_datasource_partitioned_and_invariant(spark):
    """The custom Python connector must (a) honor its partition plan —
    n_parts splits become actual scan partitions, the parallelism
    contract — and (b) produce the identical table at any partition
    count (rows derive from the global id, never the split)."""
    from aics_dask_utils_spark.sources.python_datasource import register_graftgen

    register_graftgen(spark)

    def load(parts):
        return (
            spark.read.format("graftgen")
            .option("n_rows", 200)
            .option("n_parts", parts)
            .load()
        )

    assert load(5).rdd.getNumPartitions() == 5
    one = sorted(map(tuple, load(1).collect()))
    five = sorted(map(tuple, load(5).collect()))
    assert one == five and len(one) == 200


def test_python_datasource_rejects_ragged_options(spark):
    from aics_dask_utils_spark.sources.python_datasource import register_graftgen

    register_graftgen(spark)
    # n_parts > n_rows must still work (empty trailing splits avoided by
    # ceil stepping), not error
    df = (
        spark.read.format("graftgen")
        .option("n_rows", 3)
        .option("n_parts", 8)
        .load()
    )
    assert df.count() == 3


def test_python_sink_commit_manifest(spark, tmp_path):
    """The graftsink two-phase commit must publish a _SUCCESS manifest
    whose file list and row total match what landed on disk."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import register_graftsink

    register_graftsink(spark)
    path = str(tmp_path / "sinkout")
    df = spark.range(100).selectExpr("id", "id * 2 AS dbl").repartition(4)
    df.write.format("graftsink").option("path", path).mode("append").save()
    manifest = json.load(open(os.path.join(path, "_SUCCESS")))
    assert manifest["total_rows"] == 100
    on_disk = sorted(f for f in os.listdir(path) if f.endswith(".graft"))
    assert manifest["files"] == on_disk
    assert len(on_disk) == 4  # one staged file per partition


def test_python_sink_requires_path(spark):
    import pytest as _pytest

    from aics_dask_utils_spark.sources.python_datasource import register_graftsink

    register_graftsink(spark)
    with _pytest.raises(Exception, match="path"):
        spark.range(3).write.format("graftsink").mode("append").save()


def test_python_sink_overwrite_clears_stale_parts(spark, tmp_path):
    """mode('overwrite') must remove prior part files before writing —
    otherwise a glob re-scan mixes stale and new rows."""
    import os

    from aics_dask_utils_spark.sources.python_datasource import register_graftsink

    register_graftsink(spark)
    path = str(tmp_path / "ow")
    spark.range(50).repartition(2).write.format("graftsink").option(
        "path", path
    ).mode("append").save()
    spark.range(10).repartition(2).write.format("graftsink").option(
        "path", path
    ).mode("overwrite").save()
    rows = []
    for f in os.listdir(path):
        if f.endswith(".graft"):
            rows += open(os.path.join(path, f)).read().splitlines()
    assert len(rows) == 10  # stale 50-row write fully replaced


def test_graftsink_append_merges_manifest(spark, tmp_path):
    """Two mode('append') writes to the same graftsink path must leave
    a _SUCCESS manifest covering BOTH writes' files — the
    manifest-trusting read path would otherwise silently drop the
    first write's rows."""
    from aics_dask_utils_spark.sources.python_datasource import (
        read_graft_manifest,
        register_graftsink,
    )

    register_graftsink(spark)
    out = str(tmp_path / "sink")
    df1 = spark.range(0, 10).selectExpr("id", "concat('a', id) AS s")
    df2 = spark.range(10, 25).selectExpr("id", "concat('b', id) AS s")
    df1.coalesce(2).write.format("graftsink").option("path", out).mode("append").save()
    df2.coalesce(2).write.format("graftsink").option("path", out).mode("append").save()
    files = read_graft_manifest(out)
    lines = [ln for f in files for ln in open(f).read().splitlines()]
    ids = sorted(int(ln.split("\x1f")[0]) for ln in lines)
    assert ids == list(range(25))
    # and overwrite resets the manifest to just the new write
    df1.coalesce(1).write.format("graftsink").option("path", out).mode(
        "overwrite"
    ).save()
    files = read_graft_manifest(out)
    lines = [ln for f in files for ln in open(f).read().splitlines()]
    assert sorted(int(ln.split("\x1f")[0]) for ln in lines) == list(range(10))


def test_graftsink_stream_replayed_epoch_retracts_prior_files(tmp_path):
    """A replayed micro-batch id must retract the files its previous
    commit promoted before promoting fresh ones: the exactly-once
    contract for suffix-globbing consumers, not just manifest readers."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import (
        GraftStreamFileWriter,
        _PartCommit,
    )

    out = str(tmp_path / "stream_sink")
    w = GraftStreamFileWriter({"path": out})
    # first attempt of epoch 3
    m1 = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m1], 3)
    first_files = set(json.load(open(os.path.join(out, "_manifest-0000000003.json")))["files"])
    assert all(os.path.exists(os.path.join(out, f)) for f in first_files)
    # replay of epoch 3 (restart between commit and offset record)
    m2 = w.write(iter([(1, "x"), (2, "y")]))
    w.commit([m2], 3)
    second_files = set(json.load(open(os.path.join(out, "_manifest-0000000003.json")))["files"])
    on_disk = {f for f in os.listdir(out) if f.endswith(".graft")}
    assert on_disk == second_files, "prior attempt's promoted files must be retracted"
    # abort sweeps staged orphans (task died mid-write, no message)
    w.write(iter([(9, "z")]))
    w.abort([], 4)
    assert not [d for d in os.listdir(out) if d.startswith("_staging-")]


def test_graftsink_protocol_random_sequences(tmp_path):
    """Property: after ANY sequence of append/overwrite writes and
    failed (aborted) attempts in either mode, the manifest-driven read
    yields exactly the logically-committed rows — no loss, no dupes —
    and the committed root holds no unreferenced part files. (Stream
    EPOCH REPLAY retraction is covered by the directed test above.)
    Drives the writer classes directly (no Spark) so hypothesis can
    explore many sequences fast."""
    import json
    import os

    from hypothesis import given, settings, strategies as st

    from aics_dask_utils_spark.sources.python_datasource import (
        GraftFileWriter,
        read_graft_manifest,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(
                    ["append", "overwrite", "abort_append", "abort_overwrite"]
                ),
                st.lists(st.integers(0, 999), min_size=0, max_size=5),
            ),
            min_size=1,
            max_size=6,
        ),
    )
    def run(seq):
        import uuid

        # fresh dir per example — hypothesis replays/shrinks must not
        # see a previous example's committed files
        out = str(tmp_path / f"case_{uuid.uuid4().hex}")
        expected: list[int] = []
        for op, rows in seq:
            w = GraftFileWriter(
                {"path": out}, overwrite=op.endswith("overwrite")
            )
            msgs = [w.write(iter([(r, f"v{r}") for r in rows]))]
            if op.startswith("abort"):
                # a failed write — in EITHER mode — must leave the
                # previously committed table untouched (atomic
                # overwrite: retraction only happens inside commit)
                w.abort(msgs)
            else:
                w.commit(msgs)
                expected = rows if op == "overwrite" else expected + rows
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            assert expected == []
            return
        got = [
            int(ln.split("\x1f")[0])
            for f in read_graft_manifest(out)
            for ln in open(f).read().splitlines()
        ]
        assert sorted(got) == sorted(expected)
        # no unreferenced .graft files in the committed root
        manifest = set(json.load(open(os.path.join(out, "_SUCCESS")))["files"])
        on_disk = {f for f in os.listdir(out) if f.endswith(".graft")}
        assert on_disk == manifest

    run()


def test_graftsink_concurrent_appends_interleaved(tmp_path):
    """Two append JOBS interleaved on the same path (both staged before
    either commits) must each keep their staged parts — job-scoped
    staging — and the locked manifest merge must cover both writes."""
    import os

    from aics_dask_utils_spark.sources.python_datasource import (
        GraftFileWriter,
        read_graft_manifest,
    )

    out = str(tmp_path / "sink")
    w1 = GraftFileWriter({"path": out}, overwrite=False)
    w2 = GraftFileWriter({"path": out}, overwrite=False)
    m1 = w1.write(iter([(i, f"a{i}") for i in range(5)]))
    m2 = w2.write(iter([(i, f"b{i}") for i in range(5, 12)]))
    # neither job's staging dir is visible to the other's sweep
    assert w1._staging != w2._staging
    w1.commit([m1])
    assert os.path.exists(m2.path), "commit of job 1 deleted job 2's staged part"
    w2.commit([m2])
    got = sorted(
        int(ln.split("\x1f")[0])
        for f in read_graft_manifest(out)
        for ln in open(f).read().splitlines()
    )
    assert got == list(range(12))


def test_graftsink_stream_replay_never_breaks_manifest_readability(tmp_path):
    """At every observable point of a replayed epoch's commit, the
    on-disk _manifest-N must reference only files that exist: the new
    ordering promotes + swaps the manifest BEFORE retracting the prior
    attempt's files (mirrors the batch overwrite invariant)."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import GraftStreamFileWriter

    out = str(tmp_path / "stream_sink")
    w = GraftStreamFileWriter({"path": out})
    w.commit([w.write(iter([(1, "x")]))], 7)
    mpath = os.path.join(out, "_manifest-0000000007.json")

    def manifest_files_exist():
        files = json.load(open(mpath)).get("files", [])
        return all(os.path.exists(os.path.join(out, f)) for f in files)

    assert manifest_files_exist()
    # replay epoch 7; afterwards the manifest again references only
    # live files and the prior attempt's files are gone
    first = set(json.load(open(mpath))["files"])
    w.commit([w.write(iter([(1, "x")]))], 7)
    assert manifest_files_exist()
    for f in first:
        assert not os.path.exists(os.path.join(out, f))


def test_read_graft_table_empty_manifest(spark, tmp_path):
    """A committed manifest naming zero files loads as a typed empty
    frame (spark.read.text([]) would raise)."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import read_graft_table

    out = tmp_path / "empty_sink"
    out.mkdir()
    with open(os.path.join(str(out), "_SUCCESS"), "w") as f:
        json.dump({"files": [], "total_rows": 0}, f)
    df = read_graft_table(spark, str(out))
    assert df.columns == ["value"]
    assert df.count() == 0


def test_graftsink_zero_task_write_commits_empty_manifest(tmp_path, spark):
    """A commit with zero task messages on a brand-new path must still
    publish the empty manifest (no write() task ever created the
    directory) and read back as a typed empty frame."""
    import json
    import os

    from aics_dask_utils_spark.sources.python_datasource import (
        GraftFileWriter,
        GraftStreamFileWriter,
        read_graft_table,
    )

    out = str(tmp_path / "never_created")
    w = GraftFileWriter({"path": out}, overwrite=False)
    w.commit([])  # must not raise FileNotFoundError
    assert json.load(open(os.path.join(out, "_SUCCESS"))) == {
        "files": [],
        "total_rows": 0,
    }
    assert read_graft_table(spark, out).count() == 0

    out2 = str(tmp_path / "stream_never_created")
    sw = GraftStreamFileWriter({"path": out2})
    sw.commit([], 0)  # empty epoch on a fresh path
    m = json.load(open(os.path.join(out2, "_manifest-0000000000.json")))
    assert m["files"] == [] and m["rows"] == 0
