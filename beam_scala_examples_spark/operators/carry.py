"""Sharded prefix sums: exact windowed cumsum / row_number with bounded
per-task sorts.

``Window.partitionBy(part).orderBy(key)`` puts every row of a partition
value into ONE task.  When ``part`` has whale values (a mixture source
that is 90% of a 100 TB corpus), that task sorts billions of rows.  This
module is the prefix-sum specialisation of the two-pass carry already
proven in :func:`operators.asof.asof_join_bucketed`:

  1. *within-shard*: rows are bucketed by a shard id that is MONOTONE
     non-decreasing in the ordering key, and the window runs per
     ``(part, shard)`` — each task sorts at most one shard;
  2. *carry*: per-(part, shard) totals (one row per shard — O(shards),
     not O(rows)) are prefix-summed per part and joined back as the
     offset every row in the shard adds to its local running sum.

Because prefix sum is associative and the shard id is monotone in the
order, ``local_cumsum + earlier_shard_totals`` equals the global
windowed cumsum exactly — same answers, per-shard bounded sorts.  The
carry window itself runs over the totals relation (O(parts x shards)
rows of three columns), which at 100 TB with a 2^16-row shard span is
~10^6 tiny rows per part — a trivial sort where the naive plan sorted
the rows themselves.

Monotonicity is the caller's contract (mirroring ``asof_join_bucketed``'s
``bucket``): ordering by ``(shard, *order)`` must equal ordering by
``*order`` within each part — i.e. shard is a range bucketing of the
leading order key (``doc_id div span``, ``hash div 2^k``), never an
unordered hash.

NON-NULL is part of the same contract: ``part``, the ``order`` keys,
and the ``shard`` expression must not evaluate to NULL.  The offset
join back is an equi-join on ``(part, shard)``, and SQL null keys never
match — a NULL part/shard row would be silently dropped here where the
naive ``Window.partitionBy`` would keep it in a null partition.  Every
caller in this repo derives part/shard from non-null key columns;
filter or coalesce nullable keys before calling.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Greppable in physical plans: plan tests assert the window's
# windowspecdefinition partitions on this column.
SHARD_COL = "__prefix_shard"


def sharded_prefix_sum(
    df: DataFrame,
    *,
    part: str,
    order: Sequence[str],
    shard: Column,
    val: "Column | str",
    out: str,
    inclusive: bool = False,
) -> DataFrame:
    """Add ``out`` = exact running sum of ``val`` over ``order`` within
    ``part`` (rows strictly before, or including the current row when
    ``inclusive``), computed with per-``(part, shard)`` bounded sorts.

    ``shard`` must be monotone non-decreasing in ``order`` within each
    part (equal order keys -> equal shards); see module docstring.
    Column names starting with ``__`` are reserved by this helper.
    """
    val_col = F.col(val) if isinstance(val, str) else val
    sharded = df.withColumn(SHARD_COL, shard).withColumn("__val", val_col)

    end = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(part, SHARD_COL)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = F.coalesce(F.sum("__val").over(w_local), F.lit(0))

    totals = sharded.groupBy(part, SHARD_COL).agg(
        F.sum("__val").alias("__tot")
    )
    # O(parts x shards) rows; the carry window sorts shard summaries,
    # never data rows.  Hint-free join by house policy — shard count is
    # data-dependent, AQE broadcasts it when it is small.
    w_carry = (
        Window.partitionBy(part)
        .orderBy(SHARD_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        part,
        SHARD_COL,
        F.coalesce(F.sum("__tot").over(w_carry), F.lit(0)).alias("__off"),
    )

    return (
        sharded.withColumn("__loc", local)
        .join(offsets, [part, SHARD_COL])
        .withColumn(out, F.col("__loc") + F.col("__off"))
        .drop(SHARD_COL, "__val", "__loc", "__off")
    )


def sharded_row_number(
    df: DataFrame,
    *,
    part: str,
    order: Sequence[str],
    shard: Column,
    out: str,
) -> DataFrame:
    """``row_number() over (partition by part order by order)`` as an
    inclusive sharded prefix sum of 1s — same bounded-sort guarantees as
    :func:`sharded_prefix_sum`.  The ordering must be a total order
    within each part: the ROWS-frame sum counts physical rows, so tied
    order keys get DISTINCT, arbitrarily-ordered numbers (row_number's
    own nondeterminism under ties) — which is why every caller here
    suffixes a unique key to make the order total.
    """
    return sharded_prefix_sum(
        df,
        part=part,
        order=order,
        shard=shard,
        val=F.lit(1),
        out=out,
        inclusive=True,
    )
