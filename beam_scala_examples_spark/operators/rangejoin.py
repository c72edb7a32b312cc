"""Binned range join — equi-join a point column into [lo, hi) bands.

Spark plans a raw ``point >= lo AND point < hi`` join as a broadcast
nested loop (or worse, a cartesian product when neither side is small):
every fact row is tested against every band.  The scale-out form bins
the number line:

    1. each band row is replicated once per fixed-width bin it overlaps
       (``floor(lo/w) .. floor_inclusive(hi/w)``);
    2. each fact row computes its single bin ``floor(point/w)``;
    3. equi-join on the bin (hash join — shuffles or broadcasts like
       any other key join), then re-check the exact band residually.

Cost: the band side grows by ``O(band_width / w)`` replicas — pick
``w`` near the typical band width so replication stays small — while
the fact side never fans out (one bin per row).  Overlapping bands are
allowed (a fact row matches every band containing it), exactly like the
interval joins in KDB/Flink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def range_join_binned(
    facts: DataFrame,
    point: str,
    bands: DataFrame,
    lo: str,
    hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join ``facts`` to every ``bands`` row whose half-open
    interval ``[lo, hi)`` contains ``facts[point]``; output carries all
    columns of both sides."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))
    # Last bin that can contain a band value: hi is exclusive, so a band
    # ending EXACTLY on a bin edge stops one bin earlier — tested with an
    # exact equality, not a float epsilon (an epsilon both drops true
    # matches when hi sits within eps above an edge and degrades to a
    # no-op when ulp(hi) exceeds it).  The CASE guard mirrors the
    # engine-wide sequence() rule (an empty band lo >= hi must yield no
    # bins, not a descending sequence).
    first_bin = F.floor(F.col(lo) / w).cast("long")
    hi_bin = F.floor(F.col(hi) / w).cast("long")
    last_bin = F.when(
        F.col(hi) == hi_bin.cast("double") * w, hi_bin - 1
    ).otherwise(hi_bin)
    binned = bands.withColumn(
        _BIN,
        F.explode(
            F.when(
                F.col(lo) < F.col(hi),
                F.sequence(first_bin, F.greatest(first_bin, last_bin)),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    pointed = facts.withColumn(
        _BIN, F.floor(F.col(point) / w).cast("long")
    )
    return (
        pointed.join(binned, on=_BIN, how="inner")
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) < F.col(hi)))
        .drop(_BIN)
    )
