"""Skew mitigation (SURVEY §2.5 T2, §4): salted fanout.

The reference hand-rolls hot-key fanout for its per-prefix top-K
(``Combine.perKey(...).withHotKeyFanout(fanout)``,
``complete/AutoComplete.scala:249-254``). In Spark, *combinable*
aggregates need none of this — map-side partial aggregation already emits
at most one row per key per task, so a hot key costs the final reducer
``O(tasks)``, not ``O(rows)``. Two places genuinely still skew:

1. **Non-combinable aggregation** (``collect_list`` / GroupByKey A10):
   every raw row of a hot key lands on one reducer. ``salted_collect``
   splits the key across ``fanout`` reducers and flattens the partial
   lists in a second, small aggregation.
2. **Joins where AQE's skew-split does not apply** (e.g. bucketed or
   storage-partitioned joins that AQE must not repartition):
   ``salted_join`` spreads the big side by a deterministic salt and
   replicates the small side ``fanout``x.

Both are semantically transparent (tested equal to the unsalted plan);
they trade one extra small shuffle (1) or ``fanout``x small-side
replication (2) for bounded per-reducer input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, fanout: int, from_col: str,
              out: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, fanout): pmod of the hash of an existing
    column (any column whose values spread within a hot key)."""
    return df.withColumn(out, F.pmod(F.hash(F.col(from_col)), F.lit(fanout)))


def salted_collect(
    df: DataFrame,
    keys: list[str],
    value: str,
    fanout: int = 16,
    out: str = "values",
    salt_from: str | None = None,
) -> DataFrame:
    """Two-stage ``collect_list`` with salted fanout (T2 for A10-shaped
    grouping). Stage 1 groups (keys, salt) — a hot key's rows spread over
    ``fanout`` reducers; stage 2 merges ``fanout`` partial lists per key.
    The second exchange carries one row per (key, salt): O(keys x fanout),
    independent of the hot key's row count.

    ``salt_from`` must name a column whose values spread *within* a hot
    key; it defaults to the value column, which is only right when values
    vary — a hot key with constant values needs a row-unique column here
    or the whole key still lands on one reducer.
    """
    salted = with_salt(df, fanout, from_col=salt_from or value)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_list(value).alias("__part")
    )
    return partial.groupBy(*keys).agg(
        F.flatten(F.collect_list("__part")).alias(out)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fanout: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side ``fanout``x, join on (key, salt). A key receiving K
    rows on the big side lands ~K/fanout per reducer. Use when AQE's
    runtime skew-split is unavailable (bucketed / storage-partitioned
    joins) — otherwise prefer plain ``join`` + AQE.

    Only join types that preserve per-big-row semantics are transparent
    under salting: each big row carries exactly one salt, but small-side
    rows are replicated ``fanout``x, so right/full outer joins would emit
    ``fanout`` copies of unmatched small rows and are rejected.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "leftsemi",
            "left_semi", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in safe}:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics (the "
            "replicated small side would duplicate unmatched rows); "
            f"supported: inner, left, left_semi, left_anti"
        )
    salt_src = salt_from or big.columns[0]
    b = with_salt(big, fanout, from_col=salt_src)
    s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {fanout - 1})"))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
