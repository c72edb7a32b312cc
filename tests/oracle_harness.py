"""Local twin of the driver's correctness gate: run a Spark query and its
DuckDB oracle on the same parquet tables, canonicalize (sort columns by
name, then rows), and compare values exactly.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

from beam_scala_examples_spark.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits absorbs float->double formatting noise;
        # engine queries round doubles explicitly well below this.
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    return repr(v)


def canonicalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in colnames), out


def compare(spark_df, con, sql: str):
    """Return (ok, message) comparing a Spark DataFrame against oracle SQL."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_res = con.sql(sql)
    d_rows = [tuple(r) for r in d_res.fetchall()]
    d_cols = list(d_res.columns)

    sc, sr = canonicalize(s_rows, s_cols)
    dc, dr = canonicalize(d_rows, d_cols)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diffs = [
            (a, b) for a, b in zip(sr, dr) if a != b
        ][:5]
        return False, f"value mismatch ({len(diffs)}+ shown): {diffs}"
    return True, f"ok ({len(sr)} rows)"
