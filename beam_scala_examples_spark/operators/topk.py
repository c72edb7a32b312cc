"""Top-K per key (SURVEY §2.5).

``Top.largestPerKey(K)`` (``complete/AutoComplete.scala:246-249``) and
``Top.of(1,...)`` (``complete/TopWikipediaSessions.scala:144-158``) map to
a rank over a window — Spark plans this as a partial top-K
(``WindowGroupLimit`` pushes the limit before the shuffle on Spark 3.5+),
so the shuffle carries at most K rows per key per input partition: the
built-in replacement for the reference's hand-rolled hot-key fanout
(``AutoComplete.scala:249-254``, SURVEY §2.5-T2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_key(df: DataFrame, keys: Sequence[str], order: Sequence[Column],
                  k: int, rank_col: str = "rk") -> DataFrame:
    """Keep the top-``k`` rows per key, deterministic given a total order."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )
