"""Mergeable sketch operators (Apache DataSketches via Spark built-ins).

At 100 TB, exact ``countDistinct`` / ``percentile`` per fine-grained
group is an O(distinct-values) shuffle per group and cannot be rolled
up later without rescanning the facts.  Sketches fix both: a fixed-size
state per group, partial-combined map-side like any algebraic
aggregate, and — the property that matters operationally — *mergeable*:
daily sketch rows union into monthly/yearly estimates without touching
the raw data again.  All functions below are JVM-side Spark built-ins
(DataSketches); no Python in the path.

Accuracy contracts pinned by ``tests/test_sketches.py``:
 - HLL relative standard error is ~1.04/sqrt(2^lgk) (~1.6% at lgk=12);
   tests assert a 5-sigma band against the exact count.
 - Union-of-parts equals sketch-of-whole EXACTLY (register-wise max),
   not just approximately — the rollup invariant.
 - KLL quantile estimates land within the sketch's normalized rank
   error of the exact quantile.

These are engine surface, not oracle queries: the estimates are
DataSketches-implementation-specific, so DuckDB cannot replay them; the
exact baseline they are tested against IS an oracle query
(``queries/behavior.py::events_reach_daily``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_LGK = 12  # 2^12 registers/group: ~1.6% RSE, 4 KiB max per sketch


def hll_reach(
    df: DataFrame, group_cols: list[str], key_col: str, lgk: int = HLL_LGK
) -> DataFrame:
    """Per-group distinct-``key_col`` sketch + estimate.  Keep the
    ``reach_sketch`` binary column in the written table — it is the
    mergeable state; the estimate is derived, never stored alone."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("reach_sketch"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(key_col, F.lit(lgk))
        ).cast("long").alias("reach_est"),
    )


def hll_rollup(
    sketch_df: DataFrame, group_cols: list[str], sketch_col: str = "reach_sketch"
) -> DataFrame:
    """Merge finer-grained sketch rows into coarser groups — the
    no-rescan rollup (daily -> monthly reach).  ``hll_union_agg`` is
    register-wise max, so the result is bit-identical to sketching the
    raw union."""
    merged = F.hll_union_agg(F.col(sketch_col), F.lit(True))
    return sketch_df.groupBy(*group_cols).agg(
        merged.alias("reach_sketch"),
        F.hll_sketch_estimate(merged).cast("long").alias("reach_est"),
    )


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    k: int = 200,
) -> DataFrame:
    """Per-group streaming quantile estimates over a double column via a
    KLL sketch (normalized rank error ~0.8% at k=200).  Unlike exact
    ``percentile`` — which collects every value per group — state is
    O(k log n) per group and mergeable across partitions and time."""
    sk = F.kll_sketch_agg_double(value_col, F.lit(k))
    cols = [
        F.kll_sketch_get_quantile_double(sk, F.lit(p)).alias(
            f"q{str(p).replace('0.', '')}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(
        *cols, F.kll_sketch_get_n_double(sk).alias("n")
    )
