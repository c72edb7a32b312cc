"""Sources/sinks + metrics tests (SURVEY §2.1, §2.9), including the
reference's one exact golden assertion: DebuggingWordCount's
``{Flourish: 3, stomach: 1}`` on the King Lear excerpt with filter
``Flourish|stomach`` (``DebuggingWordCount.scala:56-60,89-95``).
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from pyspark.sql import Observation
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from beam_scala_examples_spark import io as bio
from beam_scala_examples_spark import metrics
from beam_scala_examples_spark.operators.text import tokenize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kinglear_excerpt.txt")


def test_debugging_wordcount_golden(spark):
    """M3/Q3: the literal reference golden on the bundled excerpt."""
    lines = bio.read_text(spark, FIXTURE)
    filtered = (
        tokenize(lines, "value")
        .filter(F.col("word").rlike(r"Flourish|stomach"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    metrics.assert_contains_exactly(filtered, {("Flourish", 3), ("stomach", 1)})


def test_wordcount_metrics_observed(spark):
    """M1/M2: empty-line counter + line-length distribution ride the
    action via observe — no second job."""
    lines = bio.read_text(spark, FIXTURE)
    obs = Observation("wc")
    observed = metrics.observe(
        lines,
        obs,
        metrics.counter(F.col("value") == "", "empty_lines"),
        metrics.distribution(F.length("value"), "line_len"),
    )
    n = observed.count()
    m = obs.get
    assert m["empty_lines"] > 0
    assert m["line_len_count"] == n
    assert 0 <= m["line_len_min"] <= m["line_len_max"]


def test_read_text_with_origin(spark, tmp_path):
    """S2/S3: multi-file read tagged by source URI via input_file_name."""
    for name, content in [("a.txt", "alpha\nbeta"), ("b.txt", "gamma")]:
        (tmp_path / name).write_text(content)
    df = bio.read_text_with_origin(spark, str(tmp_path / "*.txt"))
    rows = {(os.path.basename(r.uri), r.line) for r in df.collect()}
    assert rows == {("a.txt", "alpha"), ("a.txt", "beta"), ("b.txt", "gamma")}


def test_write_text_fixed_shards(spark, tmp_path):
    """S4: fixed shard count = repartition before write."""
    df = spark.range(100).select(F.col("id").cast("string").alias("value"))
    out = str(tmp_path / "out")
    bio.write_text(df, out, num_shards=3)
    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 3
    back = spark.read.text(out)
    assert back.count() == 100


def test_write_windowed_files(spark, tmp_path):
    """S5: one directory per window with a fixed shard count per window."""
    df = spark.createDataFrame(
        [("2024-01-01 00:05:00", "a", 1.0), ("2024-01-01 01:05:00", "b", 2.0)],
        "ts string, k string, v double",
    ).select(F.to_timestamp("ts").alias("ts"), "k", "v")
    windowed = df.select(F.window("ts", "1 hour").start.alias("win_start"), "k", "v")
    out = str(tmp_path / "winout")
    bio.write_windowed_files(windowed, out, "win_start", num_shards=2)
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(f"{out}/window_start=*")
    )
    assert dirs == [
        "window_start=2024-01-01-00-00",
        "window_start=2024-01-01-01-00",
    ]
    back = spark.read.parquet(out)
    assert back.count() == 2


def test_row_sink_projection(spark):
    """S9: declarative field->expression sink projection."""
    df = spark.createDataFrame([(1, "x", 2.5)], "a int, b string, c double")
    out = bio.row_sink_projection(
        df, {"total": F.col("a") + F.col("c"), "label": F.upper("b")}
    )
    assert out.columns == ["total", "label"]
    assert out.collect()[0].asDict() == {"total": 3.5, "label": "X"}


def test_permissive_csv_drops_and_counts(spark):
    """P5/N9/M1: malformed rows dropped + counted, never failing the job
    (UserScore.scala:139-152: 'user14_X,TeamX,18,144...,2015-11-19 09:53:53.444')."""
    lines = spark.createDataFrame(
        [
            ("user1_A,TeamA,18,1447719060000,2015-11-16 16:11:03.921",),
            ("THIS IS NOT CSV",),          # corrupt (Injector.java:299-304)
            ("user2_B,TeamB,notanumber,1447719060000,x",),  # bad int field
            ("user3_C,TeamC,5,1447719061000,2015-11-16 16:11:04.053",),
        ],
        "value string",
    )
    schema = StructType(
        [
            StructField("user", StringType(), nullable=False),
            StructField("team", StringType(), nullable=False),
            StructField("score", IntegerType(), nullable=False),
            StructField("timestamp_ms", LongType(), nullable=False),
            StructField("readable", StringType(), nullable=False),
        ]
    )
    obs = Observation("parse")
    parsed = bio.permissive_csv(lines, schema, observation=obs)
    rows = parsed.collect()
    assert {r.user for r in rows} == {"user1_A", "user3_C"}
    assert obs.get["parse_errors"] == 2
    assert obs.get["rows_seen"] == 4


def test_permissive_csv_keeps_empty_optional_fields(spark):
    """P5: a field left nullable in the target schema is optional — a
    valid row with that field empty is kept, not counted as a parse
    error."""
    lines = spark.createDataFrame(
        [("user1,TeamA,18",), ("user2,,7",), ("user3,TeamC,notanumber",)],
        "value string",
    )
    schema = StructType(
        [
            StructField("user", StringType(), nullable=False),
            StructField("team", StringType(), nullable=True),  # optional
            StructField("score", IntegerType(), nullable=False),
        ]
    )
    obs = Observation("parse_opt")
    parsed = bio.permissive_csv(lines, schema, observation=obs)
    rows = {(r.user, r.team) for r in parsed.collect()}
    assert rows == {("user1", "TeamA"), ("user2", None)}
    assert obs.get["parse_errors"] == 1


def test_permissive_csv_rejects_all_nullable_schema(spark):
    """P5: a schema with no required fields would make malformed-row
    detection vacuously pass everything — rejected loudly."""
    lines = spark.createDataFrame([("a,b",)], "value string")
    schema = StructType(
        [StructField("x", StringType()), StructField("y", StringType())]
    )
    with pytest.raises(ValueError, match="no non-nullable fields"):
        bio.permissive_csv(lines, schema)


def test_explode_lane_columns(spark):
    """P6: one wide traffic reading -> one row per lane via stack."""
    from beam_scala_examples_spark.operators.parse import explode_lane_columns

    wide = spark.createDataFrame(
        [("s1", 10.0, 5, 20.0, 7), ("s2", 1.5, 1, 2.5, 2)],
        "station string, l1_speed double, l1_flow int,"
        " l2_speed double, l2_flow int",
    )
    out = explode_lane_columns(
        wide,
        [
            {"speed": "l1_speed", "flow": "l1_flow"},
            {"speed": "l2_speed", "flow": "l2_flow"},
        ],
        keep=["station"],
    )
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [
        ("s1", 1, 10.0, 5),
        ("s1", 2, 20.0, 7),
        ("s2", 1, 1.5, 1),
        ("s2", 2, 2.5, 2),
    ]
    # narrow: the fan-out must not introduce an exchange
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_parse_json_lines_permissive(spark):
    """P8 + N9: malformed JSON dropped and counted, never failing."""
    from beam_scala_examples_spark.operators.parse import parse_json_lines

    lines = spark.createDataFrame(
        [('{"user": "alice", "n": 3}',), ("not json at all{",), ('{"user": "bob", "n": 1}',)],
        "value string",
    )
    obs = Observation("json_parse")
    out = parse_json_lines(lines, "user string, n int", observation=obs)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("alice", 3), ("bob", 1)]
    assert obs.get["parse_errors"] == 1
    assert obs.get["rows_seen"] == 3


def test_checksum_order_independent_and_sensitive(spark):
    """A4/M3: the global row-hash checksum ignores row order but catches
    any value change."""
    a = spark.createDataFrame([("x", 1), ("y", 2)], "w string, n int")
    b = spark.createDataFrame([("y", 2), ("x", 1)], "w string, n int")
    c = spark.createDataFrame([("x", 1), ("y", 3)], "w string, n int")
    assert metrics.checksum(a) == metrics.checksum(b)
    assert metrics.checksum(a) != metrics.checksum(c)


def test_cli_list_and_run(spark, capsys):
    """CLI lifecycle (SURVEY §3.1): list + run resolve and execute."""
    from beam_scala_examples_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q07_tfidf  [oracle]" in out
    assert main(["run", "nonexistent_query"]) == 2


def test_parse_json_lines_drops_null_lines(spark):
    """'null', '' and SQL NULL parse to a null struct, not a corrupt
    record — they must still be dropped and counted."""
    from beam_scala_examples_spark.operators.parse import parse_json_lines

    lines = spark.createDataFrame(
        [('{"user": "a", "n": 1}',), ("null",), ("",), (None,)],
        "value string",
    )
    obs = Observation("null_lines")
    out = parse_json_lines(lines, "user string, n int", observation=obs)
    assert [tuple(r) for r in out.collect()] == [("a", 1)]
    assert obs.get["parse_errors"] == 3


def test_checksum_empty_dataframe(spark):
    empty = spark.createDataFrame([], "w string, n int")
    assert metrics.checksum(empty) == 0


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Data-layout contract: a day-partitioned parquet table must prune
    to the matching partition directories at read time — the scan's
    partition filters carry the predicate and the other days' files are
    never listed into the plan.  At 100 TB this is the difference
    between scanning one day and scanning three years."""
    from beam_scala_examples_spark.io import write_windowed_files
    from beam_scala_examples_spark.tables import load

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    write_windowed_files(ev, str(tmp_path / "t"), "day", num_shards=2)

    back = spark.read.parquet(str(tmp_path / "t"))
    one_day = back.filter(F.col("window_start") == "2024-01-05-00-00")
    plan = one_day._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "window_start" in pf_line and "2024-01-05-00-00" in pf_line
    # and the data still round-trips
    n_expected = ev.filter(
        F.date_format("day", "yyyy-MM-dd-HH-mm") == "2024-01-05-00-00"
    ).count()
    assert one_day.count() == n_expected > 0
    # pruning must reach the file listing, not just the plan text: the
    # executed scan reads exactly the selected day's shard files
    # (inputFiles() is NOT filter-aware — it lists the whole relation)
    one_day.collect()
    scan = one_day._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    n_files_read = scan.metrics().apply("numFiles").value()
    assert n_files_read == 2  # num_shards of one day
    n_days = len(
        {f.split("window_start=")[1].split("/")[0] for f in back.inputFiles()}
    )
    assert n_days > 1  # there was something to prune


def test_epoch_us_handles_both_timestamp_types(spark):
    """The driver fixtures have shipped both TIMESTAMP (round 1 nanos
    path) and TIMESTAMP_NTZ (round 2 tz-naive micros) — epoch_us must
    return identical exact micros for either representation of the same
    wall-clock instant under the engine's UTC sessions."""
    from beam_scala_examples_spark.operators.windows import epoch_us

    df = spark.sql(
        "SELECT TIMESTAMP'2024-01-01 00:00:01.5' AS ltz,"
        "       TIMESTAMP_NTZ'2024-01-01 00:00:01.5' AS ntz"
    )
    row = df.select(
        epoch_us("ltz").alias("a"), epoch_us("ntz").alias("b")
    ).first()
    expected = 1704067201500000
    assert row.a == expected and row.b == expected


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution: a table whose newer partitions carry an added
    column must read as the union schema with mergeSchema, old rows
    NULL-filled — the append-only contract that lets a 100 TB table
    gain columns without rewriting history. Pruned reads of old
    partitions stay narrow (the new column never materializes there)."""
    old = spark.range(3).select(
        F.col("id").alias("k"), F.lit("v1").alias("a")
    ).withColumn("part", F.lit(0))
    new = spark.range(3, 6).select(
        F.col("id").alias("k"),
        F.lit("v2").alias("a"),
        F.lit(42).alias("b"),
    ).withColumn("part", F.lit(1))
    path = str(tmp_path / "evolving")
    old.write.partitionBy("part").parquet(path)
    new.write.mode("append").partitionBy("part").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"k", "a", "b", "part"}
    rows = {r.k: (r.a, r.b) for r in merged.collect()}
    assert rows[0] == ("v1", None) and rows[5] == ("v2", 42)
    # old-partition reads never touch the new column's (absent) data
    old_only = merged.filter(F.col("part") == 0).select("k", "a")
    assert old_only.count() == 3


def test_table_format_roundtrips(spark, sf_dir, tmp_path):
    """S6/S8 generalized: nation survives a write/read roundtrip in every
    supported format — ORC exercises the second columnar path (same
    Catalyst pushdown machinery as parquet); CSV/JSON roundtrip with an
    explicit read schema."""
    from beam_scala_examples_spark.io import (
        TABLE_FORMATS,
        read_table,
        write_table,
    )
    from beam_scala_examples_spark.tables import load

    src = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    expect = sorted(tuple(r) for r in src.collect())
    for fmt in TABLE_FORMATS:
        path = str(tmp_path / f"t_{fmt}")
        write_table(src, path, fmt)
        back = read_table(
            spark, path, fmt,
            schema=src.schema if fmt in ("csv", "json") else None,
        )
        got = sorted(tuple(r) for r in back.select(*src.columns).collect())
        assert got == expect, fmt


def test_orc_scan_gets_pushdown(spark, sf_dir, tmp_path):
    """ORC reads plan with predicate pushdown + column pruning exactly
    like parquet — the point of supporting the second columnar format."""
    from beam_scala_examples_spark.io import read_table, write_table
    from beam_scala_examples_spark.tables import load

    path = str(tmp_path / "orders_orc")
    write_table(load(spark, sf_dir, "orders"), path, "orc")
    df = read_table(spark, path, "orc").filter("o_custkey = 7").select(
        "o_orderkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan


def test_read_table_evolving_merges_added_column(spark, tmp_path):
    """Schema evolution across a table directory: files written before a
    column existed read back with NULLs in it; the merged schema is the
    union.  (io.py::read_table_evolving)"""
    from beam_scala_examples_spark.io import read_table_evolving

    p = str(tmp_path / "evolve")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(p + "/part=v1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(p + "/part=v2")

    df = read_table_evolving(spark, p)
    assert {f.name for f in df.schema.fields} == {"id", "name", "score", "part"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows[1] == ("a", None)   # pre-evolution file: NULL new column
    assert rows[2] == ("b", 9.5)


def _file_stats(path, col):
    """Per-file (min, max) of ``col`` from parquet footer statistics —
    what a stats-pruning reader consults before opening the file."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_range_sorted_write_files_are_disjoint_and_sorted(spark, tmp_path, sf_dir):
    """Range-partitioned sorted layout (io.py::write_range_sorted): file
    footer ranges on the key must be pairwise non-overlapping (a
    BETWEEN reader opens only intersecting files) and each file
    internally sorted (row-group pruning)."""
    from beam_scala_examples_spark import io as bio
    from beam_scala_examples_spark.tables import load

    out = str(tmp_path / "ranged")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bio.write_range_sorted(li, out, "l_orderkey", num_files=8)

    stats = _file_stats(out, "l_orderkey")
    assert len(stats) == 8
    for (_, hi), (lo2, _) in zip(sorted(stats), sorted(stats)[1:]):
        assert hi <= lo2  # contiguous, non-overlapping key slices
    # spot-check within-file ordering on one file
    import glob as _glob
    one = sorted(_glob.glob(f"{out}/part-*.parquet"))[0]
    vals = [r.l_orderkey for r in spark.read.parquet(one).collect()]
    assert vals == sorted(vals)


def test_zorder_write_prunes_on_second_dimension(spark, tmp_path):
    """Z-order clustering (io.py::write_zordered): in a layout sorted on
    x alone, EVERY file's footer spans the full y domain, so a y
    predicate prunes nothing; the Morton layout bounds each file's y
    range too, so a y point-predicate must skip at least half the
    files while x pruning keeps working.  (Summed bounding-box AREA is
    the wrong metric here — on a uniform grid, x-stripes and z-cells
    tie on area; the win is pruning power on the second dimension.)"""
    from beam_scala_examples_spark import io as bio

    # the full 128x128 grid, one point each (id*37 % 128 vs id*101 % 128
    # would be CORRELATED — both linear in id mod 128 — and an x-sort
    # would then bound y too, hiding the effect under test)
    df = (
        spark.range(16384)
        .selectExpr(
            "cast(id % 128 as long) as x",
            "cast((id div 128) % 128 as long) as y",
        )
    )
    z_out, x_out = str(tmp_path / "zord"), str(tmp_path / "xsort")
    bio.write_zordered(df, z_out, "x", "y", num_files=16, bits=7)
    bio.write_range_sorted(df, x_out, "x", num_files=16)

    def files_matching(path, col, val):
        return sum(1 for lo, hi in _file_stats(path, col) if lo <= val <= hi)

    # y = 5: the x-sorted layout cannot prune (all 16 files match)
    assert files_matching(x_out, "y", 5) == 16
    assert files_matching(z_out, "y", 5) * 2 <= 16
    # x pruning must also still work in the z layout
    assert files_matching(z_out, "x", 5) * 2 <= 16


def test_compact_table_reduces_files_preserving_rows(spark, tmp_path, sf_dir):
    """Small-files compaction (io.py::compact_table): 64 files -> 4 with
    identical content; the pre-compaction copy survives at
    ``<path>.__compact_old`` as the restore point (readers must be
    quiesced during the swap — the rename pair is not atomic)."""
    from beam_scala_examples_spark import io as bio
    from beam_scala_examples_spark.tables import load

    out = str(tmp_path / "frag")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(out)
    import glob as _glob
    assert len(_glob.glob(f"{out}/part-*.parquet")) == 64

    before = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    bio.compact_table(spark, out, target_files=4)
    assert len(_glob.glob(f"{out}/part-*.parquet")) == 4
    after = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert before == after
    # Restore point: the old copy is kept until the next compaction.
    old = sorted(
        tuple(r) for r in spark.read.parquet(out + ".__compact_old").collect()
    )
    assert old == before
    # ...and the next compaction replaces it rather than accreting.
    bio.compact_table(spark, out, target_files=2)
    assert len(_glob.glob(f"{out}/part-*.parquet")) == 2
    assert len(_glob.glob(f"{out}.__compact_old/part-*.parquet")) == 4


def test_table_diff_classifies_all_change_kinds(spark, sf_dir):
    """Reconciliation diff (io.py::table_diff): added / removed /
    changed / unchanged classification over a synthetic second version,
    with the payload shuffled as one md5 per row."""
    from beam_scala_examples_spark import io as bio
    from beam_scala_examples_spark.tables import load

    left = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    right = (
        left.filter("doc_id != 3")                      # 3 removed
        .withColumn(
            "n_chars",
            F.when(F.col("doc_id") == 5, F.col("n_chars") + 1).otherwise(
                F.col("n_chars")
            ),                                          # 5 changed
        )
        .unionByName(
            spark.createDataFrame(
                [(10_000_000, "web", 1)], "doc_id long, source string, n_chars int"
            ).withColumn("n_chars", F.col("n_chars").cast("integer"))
        )                                               # one added
    )
    d = {r.doc_id: r.status for r in bio.table_diff(left, right, ["doc_id"]).collect()}
    n = left.count()
    assert d[3] == "removed"
    assert d[5] == "changed"
    assert d[10_000_000] == "added"
    from collections import Counter
    c = Counter(d.values())
    assert c == Counter(
        {"unchanged": n - 2, "removed": 1, "changed": 1, "added": 1}
    )


def test_table_diff_detects_delimiter_shifting_payloads(spark):
    """Rows whose cells would collide under a delimiter-joined concat
    ('a\\x01b','c' vs 'a','b\\x01c') must report 'changed' — the per-cell
    hash keeps boundaries unambiguous; NULL vs the literal sentinel
    string must differ too."""
    from beam_scala_examples_spark import io as bio

    left = spark.createDataFrame(
        [(1, "a\x01b", "c"), (2, None, "x")], "k long, p string, q string"
    )
    right = spark.createDataFrame(
        [(1, "a", "b\x01c"), (2, "\x00null", "x")],
        "k long, p string, q string",
    )
    got = {r.k: r.status for r in bio.table_diff(left, right, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_write_manifest(spark, tmpdir):
    """write_manifest: per-file row counts sum to the table count, byte
    sizes are real, key ranges cover the data, and the sidecar is
    invisible to parquet directory reads."""
    import json
    import os

    from beam_scala_examples_spark.io import write_manifest

    path = f"{tmpdir}/manifested"
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    df.repartition(4).write.mode("overwrite").parquet(path)
    man = write_manifest(spark, path, key_col="id").collect()
    assert sum(r.n_rows for r in man) == 1000
    assert all(r.n_bytes and r.n_bytes > 0 for r in man)
    assert min(int(r.key_min) for r in man) == 0
    assert max(int(r.key_max) for r in man) == 999
    # sidecar exists as JSON lines and does not break directory reads
    lines = open(os.path.join(path, "_manifest.json")).read().splitlines()
    assert len(lines) == len(man)
    assert json.loads(lines[0])["n_rows"] > 0
    assert spark.read.parquet(path).count() == 1000


def test_write_manifest_partitioned_keeps_subpaths(spark, tmpdir):
    """Hive-partitioned layout: manifest entries carry the partition
    subpath (path relative to the dataset root), so same-named
    part files in different partitions never collide, and every
    entry resolves to a real file with its real size."""
    import os

    from beam_scala_examples_spark.io import write_manifest

    path = f"{tmpdir}/manifested_parts"
    df = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).alias("grp")
    )
    df.repartition(1).write.mode("overwrite").partitionBy("grp").parquet(
        path
    )
    man = write_manifest(spark, path).collect()
    assert sum(r.n_rows for r in man) == 300
    assert {r.file.split(os.sep)[0] for r in man} == {
        "grp=0", "grp=1", "grp=2"
    }
    for r in man:
        full = os.path.join(path, r.file)
        assert os.path.isfile(full)
        assert r.n_bytes == os.path.getsize(full)
