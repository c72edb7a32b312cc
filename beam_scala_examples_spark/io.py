"""Sources & sinks (SURVEY §2.1 S1–S9).

The reference's cloud connectors (GCS text, BigQuery, Pub/Sub, Datastore)
map to Spark's file sources/sinks over local fixtures; the semantics that
matter — glob expansion, origin tagging, schema'd writes, windowed file
output, fixed sharding, permissive parsing with metrics — are reproduced
here Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S1 — ``TextIO.read().from(path)`` (``MinimalWordCount.scala:35``);
    glob patterns supported natively by the file index (S3)."""
    return spark.read.text(path)


def read_text_with_origin(spark: SparkSession, path: str) -> DataFrame:
    """S2 — multi-file read tagged by source URI
    (``complete/TfIdf.scala:151-181``): one relation, the per-file
    tagging done by ``input_file_name()`` instead of N separate reads +
    Flatten (scan enumeration stays in the file index — S3)."""
    return spark.read.text(path).select(
        F.input_file_name().alias("uri"), F.col("value").alias("line")
    )


def write_text(df: DataFrame, path: str, num_shards: int | None = None) -> None:
    """S4 — sharded text write (``MinimalWordCount.scala:53``). A fixed
    shard count (``withNumShards(3)``, ``utils/WriteToText.scala:91``) is a
    repartition before the write."""
    out = df.repartition(num_shards) if num_shards else df
    out.write.mode("overwrite").text(path)


def write_windowed_files(
    df: DataFrame, path: str, win_start_col: str, num_shards: int = 3
) -> None:
    """S5 — one file set per window, filename keyed by window bounds
    (``common/WriteOneFilePerWindow.java:46-116``): a partitioned write on
    the window-start column; each window directory gets ``num_shards``
    files. Streaming twin: ``writeStream.partitionBy`` or foreachBatch."""
    (
        df.withColumn("window_start", F.date_format(win_start_col, "yyyy-MM-dd-HH-mm"))
        .repartition(num_shards)
        .write.mode("overwrite")
        # dynamic: only the window partitions present in df are replaced —
        # required for repeated (streaming foreachBatch) invocations,
        # where static overwrite would wipe every previously written
        # window on each batch
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("window_start")
        .parquet(path)
    )


def row_sink_projection(df: DataFrame, field_fns: dict[str, Column]) -> DataFrame:
    """S9 — the declarative ``field -> value`` row-building sink
    (``utils/WriteToBigQuery.scala:38-92``): a plain select projection
    applied immediately before the write."""
    return df.select(*[c.alias(name) for name, c in field_fns.items()])


def permissive_csv(
    lines: DataFrame, schema: StructType, sep: str = ",",
    observation: Observation | None = None,
) -> DataFrame:
    """P5/N9 — permissive CSV parse: malformed rows are dropped and
    counted, never fail the job (``UserScore.scala:139-152``).

    ``from_csv`` in PERMISSIVE mode nulls unparseable fields; a row is
    malformed if any field declared ``nullable=False`` in the target
    schema is null.  Fields left nullable are optional: a legitimately
    empty value passes through (declare every field non-nullable to get
    the reference's all-required behavior). The parse-error count rides
    an ``observe`` (M1) so no extra action is needed.
    """
    parsed = lines.select(
        F.from_csv(
            F.col(lines.columns[0]),
            schema.simpleString(),
            {"sep": sep, "mode": "PERMISSIVE"},
        ).alias("r")
    ).select("r.*")
    ok = [F.col(f.name).isNotNull() for f in schema.fields if not f.nullable]
    if not ok:
        # StructField defaults to nullable=True: an all-default schema
        # would silently disable malformed-row detection entirely —
        # fail loudly instead of parsing corrupt lines as all-NULL rows
        raise ValueError(
            "permissive_csv: schema declares no non-nullable fields, so no "
            "row could ever be counted malformed; mark required fields "
            "StructField(..., nullable=False)"
        )
    all_ok = ok[0]
    for c in ok[1:]:
        all_ok = all_ok & c
    parsed = parsed.withColumn("__ok", all_ok)
    if observation is not None:
        parsed = parsed.observe(
            observation,
            F.count(F.when(~F.col("__ok"), True)).alias("parse_errors"),
            F.count(F.lit(1)).alias("rows_seen"),
        )
    return parsed.filter("__ok").drop("__ok")


# Formats the generic table reader/writer accepts.  Parquet/ORC are the
# columnar pair (both splittable, predicate-pushdown-capable — ORC reads
# arrive with the same Catalyst pushdown/pruning as parquet); CSV/JSON
# are the interchange pair (row formats: no pushdown beyond partition
# pruning — fine for export, wrong for a 100 TB scan, which is why the
# engine's own tables stay columnar).
TABLE_FORMATS = ("parquet", "orc", "csv", "json")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Generic sink: the S8 shape for any supported format.  CSV writes
    a header so the roundtrip is schema-recoverable (types still need
    the read-side schema — see ``read_table``)."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {TABLE_FORMATS}")
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema=None) -> DataFrame:
    """Generic source for ``TABLE_FORMATS``.  Columnar formats carry
    their own schema; CSV/JSON accept an explicit one (pass ``schema``)
    — inference would scan the data twice and guess types, so prefer
    explicit schemas anywhere correctness matters."""
    if fmt not in TABLE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {TABLE_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true")
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        r = r.option("inferSchema", "true")
    return r.load(path)


def read_table_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across files written under EVOLVED schemas
    (``mergeSchema``): columns added over time surface as nullable with
    NULLs for older files — the ingestion posture for long-lived table
    directories whose producers gain fields.

    Scale note: schema merging footers across millions of files is a
    driver-side listing cost — on a real deployment pin the merged
    schema explicitly (``.schema(...)``) once it stabilizes, or manage
    evolution in a table format (Delta/Iceberg); this reader is the
    plain-parquet fallback.  Column pruning still reaches the scan:
    per-file readers project only the requested subset of the merged
    schema."""
    return spark.read.option("mergeSchema", "true").parquet(path)


# --------------------------------------------------------------------------
# Data-layout utilities (100 TB output management)
# --------------------------------------------------------------------------

def write_range_sorted(df: DataFrame, path: str, key: str,
                       num_files: int) -> None:
    """Range-partitioned, within-file-sorted parquet write: file i holds
    a contiguous, non-overlapping slice of the key domain, sorted.

    This is the layout a 100 TB output wants for key-ranged consumers:
    a reader filtering ``key BETWEEN a AND b`` opens only the files
    whose [min, max] footer range intersects — parquet's file/row-group
    stats become an index.  ``repartitionByRange`` samples the key to
    build balanced range bounds (skew-resistant), and the within-
    partition sort makes every row group internally ordered so range
    predicates prune at row-group granularity too."""
    (
        df.repartitionByRange(num_files, F.col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave two non-negative integer
    columns (each truncated to ``bits`` low bits).  Sorting/range-
    partitioning output by this key clusters rows that are close in
    BOTH dimensions into the same files, so per-file min/max footer
    stats prune selective predicates on EITHER column — the plain-
    parquet form of multi-dimensional clustering (Delta/Iceberg
    Z-ORDER).  Pure integer bit arithmetic inside codegen; no UDF."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(x.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i) % 2, 2 * i + 1)
        )
    return acc


def write_zordered(df: DataFrame, path: str, col_x: str, col_y: str,
                   num_files: int, bits: int = 16) -> None:
    """Z-order-clustered parquet write on two integer dimensions: range-
    partition + sort on the Morton key, then drop it.  Each output
    file covers a compact rectangle of (x, y) space instead of a full-
    width stripe, so min/max pruning works for predicates on either
    column — in an x-sorted layout a y predicate prunes NOTHING (every
    file spans all of y); here it skips most files.  Pinned by
    ``test_zorder_write_prunes_on_second_dimension``."""
    keyed = df.withColumn(
        "__zkey", zorder_key(F.col(col_x), F.col(col_y), bits)
    )
    (
        keyed.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_table(spark: SparkSession, path: str, target_files: int) -> None:
    """Small-files compaction: rewrite a parquet directory into
    ``target_files`` files.  Streaming sinks and fine-grained dynamic
    partition overwrites accrete small files; scan cost at 100 TB is
    dominated by per-file open/footer overhead once files drop below
    ~100 MB, so periodic compaction is part of the maintenance loop
    (with Delta/Iceberg this is OPTIMIZE; this is the plain-parquet
    form).

    LOCAL-FILESYSTEM utility: the swap uses OS renames, so this is for
    dev/posix deployments — on an object store use the table format's
    OPTIMIZE/rewrite instead.  The swap is NOT atomic: between the two
    renames there is a window where no table exists at ``path``, so
    readers must be quiesced during compaction (with Delta/Iceberg the
    snapshot swap handles this; plain parquet has no commit protocol).
    The rewrite lands fully in a temp directory before any destructive
    step, and the full old copy is kept at ``<path>.__compact_old``
    until the NEXT compaction — a crash before the swap leaves the
    original serving; a crash inside the two renames (or a bad rewrite)
    leaves the old copy to restore from, never a half-written table as
    the only copy."""
    import shutil as _shutil

    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    df = spark.read.parquet(path)
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    _shutil.rmtree(old, ignore_errors=True)
    _shutil.move(path, old)
    _shutil.move(tmp, path)


def table_diff(left: DataFrame, right: DataFrame,
               key_cols: list[str]) -> DataFrame:
    """Reconciliation diff between two versions of a relation (e.g. two
    pipeline runs, or a serving table before/after a backfill): one row
    per key classed ``added`` (right only), ``removed`` (left only),
    ``changed`` (both, payload differs) or ``unchanged``.

    The payload comparison hashes each cell SEPARATELY (md5, or the
    literal token ``N`` for NULL — ``N`` is outside the hex alphabet,
    so the concatenation of fixed-width hex tokens and ``N`` markers is
    uniquely decodable) and then hashes the token string: injective
    over rows, unlike a single delimiter-joined concat, where a cell
    containing the delimiter shifts boundaries and two different rows
    collide.  Computed map-side on each input — the full outer join
    carries ONE 32-byte digest per row regardless of row width.
    Downstream: ``groupBy('status')`` for the reconciliation report,
    or filter ``status != 'unchanged'`` for the change feed."""
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        payload = [c for c in df.columns if c not in key_cols]
        cells = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N"))
            for c in sorted(payload)
        ]
        body = F.concat(*cells) if cells else F.lit("")
        return df.select(*key_cols, F.md5(body).alias(alias))
    lh = hashed(left, "__lh")
    rh = hashed(right, "__rh")
    status = (
        F.when(F.col("__lh").isNull(), "added")
        .when(F.col("__rh").isNull(), "removed")
        .when(F.col("__lh") != F.col("__rh"), "changed")
        .otherwise("unchanged")
    )
    return lh.join(rh, key_cols, "full_outer").select(
        *key_cols, status.alias("status")
    )


def write_manifest(spark: SparkSession, path: str,
                   key_col: str | None = None) -> DataFrame:
    """Dataset manifest for a written parquet directory: one row per
    data file with its row count, byte size, and (optionally) the
    min/max of ``key_col`` — the sidecar a published training corpus
    ships so consumers can plan reads (size-based split assignment,
    range pruning, integrity row-count checks) without opening every
    footer.  Written to ``<path>/_manifest.json`` (JSON lines) and
    returned as a DataFrame.

    Scale: per-file row counts come from ONE distributed pass grouped
    by ``input_file_name()`` (no per-file driver loop); byte sizes from
    one driver-side listing (O(files), the same listing any planner
    does).  Files are recorded by their path RELATIVE to the dataset
    root, so Hive-partitioned layouts keep their partition subpath and
    two ``part-00000`` files in different partitions never collide.
    The leading ``_`` keeps the manifest invisible to parquet
    directory reads, the Spark convention for sidecar files."""
    import json as _json
    import os as _os
    from urllib.parse import unquote as _unquote
    from urllib.parse import urlparse as _urlparse

    df = spark.read.parquet(path)
    aggs = [F.count("*").alias("n_rows")]
    if key_col is not None:
        aggs += [
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        ]
    per_file = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    root_abs = _os.path.abspath(path)
    sizes = {}
    for root, _dirs, files in _os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                full = _os.path.join(root, f)
                rel = _os.path.relpath(_os.path.abspath(full), root_abs)
                sizes[rel] = _os.path.getsize(full)

    def _rel(uri: str) -> str:
        # input_file_name() returns a (possibly percent-encoded) URI
        parsed = _urlparse(uri)
        local = _unquote(parsed.path) if parsed.scheme else _unquote(uri)
        return _os.path.relpath(local, root_abs)

    rows = []
    for r in sorted(per_file, key=lambda r: r.file):
        rel = _rel(r.file)
        d = {"file": rel, "n_rows": r.n_rows}
        d["n_bytes"] = sizes.get(rel)
        if key_col is not None:
            d["key_min"] = r.key_min
            d["key_max"] = r.key_max
        rows.append(d)
    with open(_os.path.join(path, "_manifest.json"), "w") as fh:
        for d in rows:
            fh.write(_json.dumps(d, default=str) + "\n")
    schema = "file string, n_rows long, n_bytes long" + (
        ", key_min string, key_max string" if key_col is not None else ""
    )
    return spark.createDataFrame(
        [tuple(str(v) if k.startswith("key_") and v is not None else v
               for k, v in d.items()) for d in rows],
        schema,
    )
