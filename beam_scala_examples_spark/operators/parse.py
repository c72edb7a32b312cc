"""Structured parsing operators (SURVEY §2.2 P6, P8).

P6 — the reference's 50-field traffic CSV explodes one reading into 8
per-lane records (``complete/TrafficMaxLaneFlow.scala:194-236``, layout
doc ``:182-192``). Spark-first shape: ``stack`` (a generator expression,
no shuffle, whole-stage-codegen friendly) pivots the lane column groups
into rows.

P8 — JSON line → typed row (``complete/TopWikipediaSessions.scala:99-109``).
The reference throws on bad input; per the engine's permissive-parse
convention (N9) we drop-and-count instead: ``from_json`` PERMISSIVE
yields null structs for malformed lines, which are filtered with an
optional ``observe`` metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def explode_lane_columns(
    df: DataFrame,
    lane_groups: list[dict[str, str]],
    keep: list[str],
    lane_col: str = "lane",
) -> DataFrame:
    """One wide reading -> one row per lane (P6).

    ``lane_groups[i]`` maps output field name -> source column name for
    lane ``i``; ``keep`` columns are carried through unchanged. Emitted
    rows carry a 1-based ``lane`` index. ``stack`` evaluates per input
    row inside the scan stage — the fan-out never crosses an exchange,
    so at 100 TB this costs exactly one pass over the source.
    """
    fields = list(lane_groups[0])
    args: list[Column] = [F.lit(len(lane_groups))]
    for i, group in enumerate(lane_groups):
        args.append(F.lit(i + 1))
        args.extend(F.col(group[f]) for f in fields)
    stacked = F.stack(*args).alias(lane_col, *fields)
    return df.select(*keep, stacked)


def parse_json_lines(
    lines: DataFrame,
    schema: str,
    column: str | None = None,
    observation: Observation | None = None,
) -> DataFrame:
    """JSON line -> typed columns, permissive (P8 + N9).

    Malformed lines (null struct or all-null fields after PERMISSIVE
    parse) are dropped and counted via ``observe`` — the engine's
    parse-error metric convention — never failing the job.
    """
    col = column or lines.columns[0]
    # PERMISSIVE from_json yields an all-null struct (not a null) for
    # malformed lines; the corrupt-record column is the reliable signal.
    parsed = lines.select(
        F.from_json(
            F.col(col),
            f"{schema}, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    )
    # a line of 'null', '', or SQL NULL parses to a null STRUCT (not a
    # corrupt record) — require the struct itself to be non-null too
    parsed = parsed.withColumn(
        "__ok", F.col("r").isNotNull() & F.col("r._corrupt").isNull()
    )
    if observation is not None:
        parsed = parsed.observe(
            observation,
            F.count(F.when(~F.col("__ok"), True)).alias("parse_errors"),
            F.count(F.lit(1)).alias("rows_seen"),
        )
    return parsed.filter("__ok").select("r.*").drop("_corrupt")
