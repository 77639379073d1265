"""IO layer tests: the three CSV schema modes, JSON, partitioned parquet
write + partition-discovery read + pruning (SURVEY.md §2.1-2.2)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_algorithms_with_pyspark_spark.sources.readers import (
    load_table,
    read_csv,
    read_json,
    read_parquet,
    read_text,
)
from data_algorithms_with_pyspark_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)
from tests.conftest import SF_SMOKE


def test_csv_three_schema_modes(spark, tmp_path):
    p = str(tmp_path / "people.csv")
    with open(p, "w") as f:
        f.write("name,age\nalex,30\nmary,25\n")

    inferred = read_csv(spark, p, header=True, infer_schema=True)
    assert dict(inferred.dtypes) == {"name": "string", "age": "int"}

    explicit_schema = T.StructType(
        [
            T.StructField("name", T.StringType(), False),
            T.StructField("age", T.LongType(), True),
        ]
    )
    explicit = read_csv(spark, p, schema=explicit_schema)
    assert dict(explicit.dtypes) == {"name": "string", "age": "bigint"}

    headerless = read_csv(spark, p, header=False, infer_schema=False)
    assert headerless.columns == ["_c0", "_c1"]  # default naming
    assert headerless.count() == 3  # header row becomes data


def test_json_nested_inference_and_explode(spark, tmp_path):
    p = str(tmp_path / "emps.json")
    with open(p, "w") as f:
        f.write('{"name":"alex","skills":["python","spark"]}\n')
        f.write('{"name":"mary","skills":["sql"]}\n')
    df = read_json(spark, p)
    assert isinstance(df.schema["skills"].dataType, T.ArrayType)
    exploded = df.select("name", F.explode("skills").alias("skill"))
    assert exploded.count() == 3


def test_text_reader(spark, tmp_path):
    p = str(tmp_path / "sample.txt")
    with open(p, "w") as f:
        f.write(">header\nATCG\nGGTA\n")
    df = read_text(spark, p)
    assert df.columns == ["value"]
    assert df.where(~F.col("value").startswith(">")).count() == 2


def test_partitioned_write_discovery_and_pruning(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(orders, out, partition_by=("o_year",))

    # one file per hive partition (repartition-before-partitionBy compaction)
    for d in os.listdir(out):
        if d.startswith("o_year="):
            files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
            assert len(files) == 1, f"expected 1 compacted file in {d}, got {files}"

    back = read_parquet(spark, out)
    assert "o_year" in back.columns  # partition discovery
    pruned = back.where(F.col("o_year") == 1996)
    expected = orders.where(F.col("o_year") == 1996).count()
    assert pruned.count() == expected

    # partition pruning visible in the physical plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_csv_json_writers_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_SMOKE, "region")
    csv_out = str(tmp_path / "region_csv")
    write_csv(df, csv_out, sep="|", single_file=True)
    back = read_csv(spark, csv_out, header=True, infer_schema=True, sep="|")
    assert sorted([tuple(r) for r in back.collect()]) == sorted(
        [tuple(r) for r in df.collect()]
    )

    json_out = str(tmp_path / "region_json")
    write_json(df, json_out, single_file=True)
    back_json = read_json(spark, json_out).select("r_regionkey", "r_name")
    assert back_json.count() == df.count()


def test_orc_roundtrip_partitioned(spark, tmp_path):
    """ORC sink/scan with the same surface as parquet: partitioned write,
    partition discovery on read."""
    from data_algorithms_with_pyspark_spark.sources.readers import read_orc
    from data_algorithms_with_pyspark_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "x", 2024), (2, "y", 2024), (3, "x", 2025)], ["id", "tag", "year"]
    )
    path = str(tmp_path / "orc_out")
    write_orc(df, path, partition_by=("year",))
    back = read_orc(spark, path)
    assert {tuple(r) for r in back.select("id", "tag", "year").collect()} == {
        (1, "x", 2024),
        (2, "y", 2024),
        (3, "x", 2025),
    }
    pruned = back.where(F.col("year") == 2025)
    assert pruned.count() == 1


def test_write_range_clustered_files_are_disjoint(spark, tmp_path):
    """Each output file covers a disjoint key range (repartitionByRange)
    and is sorted inside (sortWithinPartitions) — the precondition for
    parquet min/max row-group skipping."""
    import glob

    from data_algorithms_with_pyspark_spark.sources.writers import (
        write_range_clustered,
    )

    df = spark.range(0, 10_000).selectExpr(
        "CAST(id * 37 % 10000 AS LONG) AS k", "id AS payload"
    )
    path = str(tmp_path / "clustered")
    write_range_clustered(df, path, ("k",), n_files=4)

    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        rows = [r.k for r in spark.read.parquet(f).collect()]
        assert rows == sorted(rows)  # clustered within the file
        ranges.append((min(rows), max(rows)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint across files

    pruned = spark.read.parquet(path).where(F.col("k") < 100)
    assert pruned.count() == 100


def test_json_corrupt_record_quarantine(spark, tmp_path):
    """PERMISSIVE + corrupt-record column keeps bad lines for quarantine;
    DROPMALFORMED removes them; FAILFAST raises."""
    from pyspark.sql import types as T

    from data_algorithms_with_pyspark_spark.sources.readers import read_json

    p = tmp_path / "rows.json"
    p.write_text('{"id": 1, "v": "a"}\n{"id": oops}\n{"id": 3, "v": "c"}\n')
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    kept = read_json(
        spark, str(p), schema=schema, corrupt_record_col="_bad"
    ).collect()
    assert len(kept) == 3
    bad = [r for r in kept if r["_bad"] is not None]
    assert len(bad) == 1 and "oops" in bad[0]["_bad"]

    dropped = read_json(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert dropped.count() == 2

    import pytest as _pytest

    with _pytest.raises(Exception):
        read_json(spark, str(p), schema=schema, mode="FAILFAST").collect()


def test_parquet_merge_schema_evolution(spark, tmp_path):
    """Files written before/after adding a column read back as the union
    schema with nulls for the missing column."""
    from data_algorithms_with_pyspark_spark.sources.readers import read_parquet

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(path)
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]).write.mode(
        "append"
    ).parquet(path)
    merged = read_parquet(spark, path, merge_schema=True)
    assert set(merged.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in merged.collect()}
    assert got[1] is None and got[2] == 9.5


# --- Python DataSource: synthetic events ------------------------------------


def test_synthetic_source_deterministic_and_partition_independent(spark):
    """Row i is a pure function of (seed, i): the same multiset must come
    back at ANY partition count, and re-reads must be identical — the
    contract that makes the source usable for scale testing."""
    from pyspark.sql import functions as F

    from data_algorithms_with_pyspark_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)

    def checksum(partitions: int):
        df = (
            spark.read.format("synthetic_events")
            .option("rows", 5000)
            .option("partitions", partitions)
            .load()
        )
        agg = df.agg(
            F.count("*").alias("n"),
            F.countDistinct("event_id").alias("ids"),
            F.bit_xor(F.xxhash64("event_id", "ts_us", "user_id", "event_type",
                                 (F.col("value") * 100).cast("long"))).alias("h"),
        ).collect()[0]
        return (agg["n"], agg["ids"], agg["h"])

    a, b = checksum(4), checksum(17)
    assert a == b == (5000, 5000, a[2])

    df = (
        spark.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 8)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert types <= {"signup", "view", "click", "purchase", "refund"}
    assert len(types) >= 4


def test_synthetic_source_zero_rows_is_empty_relation(spark):
    from data_algorithms_with_pyspark_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 0)
        .load()
    )
    assert df.count() == 0


def test_binary_files_ingest_to_image_decode(spark, tmp_path):
    """binaryFile scan -> multimodal decode: files on disk become the
    (media_id, payload) shape the decoders consume, and the REAL BMP
    decoder recovers each file's dimensions and checksum."""
    import numpy as np

    from data_algorithms_with_pyspark_spark.operators.multimodal import (
        decode_image_batch,
        encode_bmp,
    )
    from data_algorithms_with_pyspark_spark.sources.readers import (
        read_binary_files,
    )

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    expected = {}
    for i, (h, w) in enumerate([(5, 7), (9, 3), (4, 4)]):
        px = (
            np.arange(h * w * 3, dtype=np.int64) * (i + 1) % 256
        ).astype(np.uint8).reshape(h, w, 3)
        (media_dir / f"img{i}.bmp").write_bytes(encode_bmp(px))
        expected[i] = (h, w, int(px.sum(dtype=np.int64)))
    (media_dir / "notes.txt").write_text("not an image")

    files = read_binary_files(spark, str(media_dir), glob="*.bmp")
    assert files.count() == 3  # pathGlobFilter pruned the .txt
    media = files.select(
        F.regexp_extract(F.col("path"), r"img(\d+)\.bmp$", 1)
        .cast("long")
        .alias("media_id"),
        F.col("content").alias("payload"),
    )
    out = {
        r["media_id"]: (r["height"], r["width"], r["pixel_sum"])
        for r in decode_image_batch(media).collect()
    }
    assert out == expected


def test_table_fingerprint_tracks_content_and_degrades_loudly(tmp_path, capsys):
    """Cache keys for derived state (ANN index, streaming split files,
    compaction pairs) must change when a table is regenerated IN PLACE —
    including a same-size rewrite, which the pre-r9 size-only directory
    signature missed — and must warn when stat fails (path-only keying
    can serve stale state)."""
    import os
    import shutil

    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    sf_dir = str(tmp_path)
    tgt = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, tgt)
    else:
        shutil.copy(src, tgt)
    fp1 = table_fingerprint(sf_dir, "events")
    assert fp1 == table_fingerprint(sf_dir, "events")  # stable

    # same-size in-place regeneration: only mtime moves
    part = tgt
    if os.path.isdir(tgt):
        part = os.path.join(
            tgt,
            sorted(
                e for e in os.listdir(tgt) if not e.startswith((".", "_"))
            )[0],
        )
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    fp2 = table_fingerprint(sf_dir, "events")
    assert fp2 != fp1

    # different sf_dir, same content bytes -> different key (path in sig)
    assert table_fingerprint("/root/testdata/sf0.001", "events") != fp2

    # missing table: loud fallback to path-only keying
    capsys.readouterr()
    fp_missing = table_fingerprint(str(tmp_path / "nope"), "events")
    assert len(fp_missing) == 8
    assert "falling back to path-only" in capsys.readouterr().err


# --- Python DataSource API: FASTA record source ------------------------------


def _write_fasta(path, text):
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(text)


def test_fasta_pyds_reassembles_multiline_records(spark, tmp_path):
    """Multi-line sequences concatenate in order; blank lines and CRLF
    are tolerated; a header with zero sequence lines yields ''."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    f = tmp_path / "part-00000.txt"
    _write_fasta(
        str(f),
        ">doc_1\nacgt\nACGT\n\n>doc_2\r\n\r\n>doc_3\ntt\ngg\ncc\n",
    )
    register_fasta_source(spark)
    rows = {
        r["header"]: r["sequence"]
        for r in spark.read.format("fasta")
        .option("path", str(f))
        .load()
        .collect()
    }
    assert rows == {"doc_1": "acgtACGT", "doc_2": "", "doc_3": "ttggcc"}


def test_fasta_pyds_one_partition_per_file(spark, tmp_path):
    """Directory input: one InputPartition per part- file (records never
    span files), non-part files ignored, all records surfaced."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    d = tmp_path / "fasta"
    d.mkdir()
    _write_fasta(str(d / "part-00000.txt"), ">a\nac\n>b\ngt\n")
    _write_fasta(str(d / "part-00001.txt"), ">c\ntttt\n")
    _write_fasta(str(d / "_SUCCESS"), "")
    register_fasta_source(spark)
    df = spark.read.format("fasta").option("path", str(d)).load()
    assert df.rdd.getNumPartitions() == 2
    assert {(r["header"], r["sequence"]) for r in df.collect()} == {
        ("a", "ac"),
        ("b", "gt"),
        ("c", "tttt"),
    }


def test_fasta_pyds_wrap_roundtrip_matches_source_text(spark, tmp_path):
    """End-to-end: 60-char wrapping then pyds read reproduces the exact
    original sequences, including lengths that are multiples of 60."""
    from pyspark.sql import functions as F

    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    seqs = {0: "a" * 60, 1: "acgt" * 40, 2: "", 3: "g" * 121}
    docs = spark.createDataFrame(
        [(k, v) for k, v in seqs.items()], "doc_id long, seq string"
    )
    out = str(tmp_path / "wrapped")
    rec = F.concat(
        F.lit(">doc_"),
        F.col("doc_id").cast("string"),
        F.lit("\n"),
        F.regexp_replace(F.col("seq"), "(.{60})", "$1\n"),
    )
    docs.select(rec.alias("value")).write.mode("overwrite").text(out)
    register_fasta_source(spark)
    got = {
        int(r["header"].removeprefix("doc_")): r["sequence"]
        for r in spark.read.format("fasta")
        .option("path", out)
        .load()
        .collect()
    }
    assert got == seqs


def test_fasta_pyds_writer_roundtrip_and_commit(spark, tmp_path):
    """Custom Arrow sink: wraps at the wrap option, one file per
    partition, _SUCCESS manifest lists exactly the committed files;
    reading back through the custom source reproduces the data."""
    from pyspark.sql import functions as F  # noqa: F401

    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    data = {0: "acgt" * 5, 1: "a" * 7, 2: ""}
    df = spark.createDataFrame(
        [(f"doc_{k}", v) for k, v in data.items()],
        "header string, sequence string",
    ).repartition(2)
    out = str(tmp_path / "fa")
    df.write.format("fasta").mode("overwrite").option("path", out).option(
        "wrap", "8"
    ).save()

    files = sorted(f for f in os.listdir(out) if f.startswith("part-"))
    assert len(files) == 2  # one file per partition
    manifest = (tmp_path / "fa" / "_SUCCESS").read_text().split()
    assert sorted(manifest) == files
    # wrapping: no sequence line longer than 8 chars
    for f in files:
        for line in (tmp_path / "fa" / f).read_text().splitlines():
            if line and not line.startswith(">"):
                assert len(line) <= 8
    got = {
        r["header"]: r["sequence"]
        for r in spark.read.format("fasta").option("path", out).load().collect()
    }
    assert got == {f"doc_{k}": v for k, v in data.items()}


def test_fasta_pyds_writer_overwrite_drops_stale_files(spark, tmp_path):
    """mode(overwrite): files from the previous job disappear in
    commit(); record set equals the new write only."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    out = str(tmp_path / "fa")

    def write(rows, parts):
        spark.createDataFrame(
            rows, "header string, sequence string"
        ).repartition(parts).write.format("fasta").mode("overwrite").option(
            "path", out
        ).save()

    write([("a", "aa"), ("b", "bb")], 4)
    first = {f for f in os.listdir(out) if f.startswith("part-")}
    write([("c", "cc")], 1)
    second = {f for f in os.listdir(out) if f.startswith("part-")}
    assert not (first & second)
    got = {
        r["header"]
        for r in spark.read.format("fasta").option("path", out).load().collect()
    }
    assert got == {"c"}


def test_fasta_pyds_writer_rejects_wrong_schema(spark, tmp_path):
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    df = spark.createDataFrame([("x", 1)], "header string, n long")
    with pytest.raises(Exception, match="header, sequence"):
        df.write.format("fasta").mode("overwrite").option(
            "path", str(tmp_path / "bad")
        ).save()


def test_fasta_pyds_reader_trusts_manifest_over_listing(spark, tmp_path):
    """A part- file NOT named by a non-empty _SUCCESS manifest (an
    orphan from a failed/speculative attempt, which never returns a
    commit message) is excluded from read-back."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    d = tmp_path / "fa"
    d.mkdir()
    _write_fasta(str(d / "part-00000-ok.fasta"), ">a\nac\n")
    _write_fasta(str(d / "part-00001-orphan.fasta"), ">zombie\ntt\n")
    _write_fasta(str(d / "_SUCCESS"), "part-00000-ok.fasta\n")
    register_fasta_source(spark)
    rows = (
        spark.read.format("fasta").option("path", str(d)).load().collect()
    )
    assert {(r["header"], r["sequence"]) for r in rows} == {("a", "ac")}


def test_fasta_pyds_commit_sweeps_uncommitted_orphans(spark, tmp_path):
    """commit() removes part- files that returned no commit message —
    e.g. a leftover from a failed attempt present before the job —
    completing the two-phase protocol abort() alone cannot."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    out = tmp_path / "fa"
    out.mkdir()
    _write_fasta(str(out / "part-99999-orphan.fasta"), ">zombie\ntt\n")
    spark.createDataFrame(
        [("a", "acgt")], "header string, sequence string"
    ).coalesce(1).write.format("fasta").mode("overwrite").option(
        "path", str(out)
    ).save()
    files = {f for f in os.listdir(out) if f.startswith("part-")}
    assert "part-99999-orphan.fasta" not in files
    assert len(files) == 1
    got = {
        r["header"]
        for r in spark.read.format("fasta")
        .option("path", str(out))
        .load()
        .collect()
    }
    assert got == {"a"}


def test_fasta_pyds_append_retains_prior_manifest_files(spark, tmp_path):
    """mode(append): the prior manifest's files survive the sweep and
    the merged manifest covers both writes."""
    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_fasta_source,
    )

    register_fasta_source(spark)
    out = str(tmp_path / "fa")

    def write(rows, mode):
        spark.createDataFrame(
            rows, "header string, sequence string"
        ).coalesce(1).write.format("fasta").mode(mode).option(
            "path", out
        ).save()

    write([("a", "aa")], "overwrite")
    write([("b", "bb")], "append")
    manifest = [
        ln
        for ln in (tmp_path / "fa" / "_SUCCESS").read_text().split()
        if ln
    ]
    files = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )
    assert sorted(manifest) == files and len(files) == 2
    got = {
        r["header"]
        for r in spark.read.format("fasta").option("path", out).load().collect()
    }
    assert got == {"a", "b"}


def test_scratch_dir_is_pid_keyed_and_tracked():
    """Two processes at the same SF never collide; the path registers
    for exit-time cleanup."""
    import os as _os

    from data_algorithms_with_pyspark_spark import scratch

    p1 = scratch.scratch_dir("x", "/root/testdata/sf0.01")
    p2 = scratch.scratch_dir("x", "/root/testdata/sf0.01")
    assert p1 == p2  # stable within a process
    assert str(_os.getpid()) in _os.path.basename(p1)
    assert p1 in scratch._CREATED
    other = scratch.scratch_dir("x", "/root/testdata/sf0.1")
    assert other != p1


def test_scratch_sweep_orphans_reclaims_dead_pid_dirs(tmp_path):
    """ADVICE r10: atexit never fires on SIGKILL/OOM, and PID-keyed paths
    mean a later run never overwrites a crashed run's leak — the import-
    time sweep must reclaim dirs whose embedded PID is dead and leave
    live ones alone."""
    import os as _os

    from data_algorithms_with_pyspark_spark import scratch

    # A PID that cannot exist (> kernel pid_max on any default config).
    dead = tmp_path / "spark_graft_x_sf0.01_999999999"
    dead.mkdir()
    dead_mk = tmp_path / "spark_graft_cdc_stream_pid-999999999_ab_1cd"
    dead_mk.mkdir()
    live = tmp_path / f"spark_graft_x_sf0.01_{_os.getpid()}"
    live.mkdir()
    unmarked = tmp_path / "spark_graft_nopid_suffix"
    unmarked.mkdir()
    other = tmp_path / "unrelated_dir_123"
    other.mkdir()

    removed = scratch.sweep_orphans(str(tmp_path))
    assert sorted(removed) == sorted([str(dead), str(dead_mk)])
    assert not dead.exists() and not dead_mk.exists()
    assert live.exists() and unmarked.exists() and other.exists()


def test_scratch_mkdtemp_embeds_marker_and_pid():
    import os as _os

    from data_algorithms_with_pyspark_spark import scratch

    p = scratch.scratch_mkdtemp(prefix="unittest_stage_")
    try:
        base = _os.path.basename(p)
        assert base.startswith("spark_graft_unittest_stage_")
        assert f"pid-{_os.getpid()}_" in base
        assert p in scratch._CREATED
    finally:
        _os.rmdir(p)


def test_parquet_row_count_matches_scan(spark):
    """Footer-metadata counts agree with a real scan on file and
    directory parquet layouts, and cache per content fingerprint."""
    from data_algorithms_with_pyspark_spark.sources.readers import (
        load_table,
        parquet_row_count,
    )

    for table in ("embeddings", "nation"):
        n_meta = parquet_row_count("/root/testdata/sf0.001", table)
        n_scan = load_table(spark, "/root/testdata/sf0.001", table).count()
        assert n_meta == n_scan > 0
