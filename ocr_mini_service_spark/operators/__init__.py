"""Driver-query operator library.

``ordered`` — presentation sort for driver-sized results: a global
``orderBy`` runs a RangePartitioner *sampling pass* that re-evaluates the
whole upstream plan a second time; for an expensive pipeline (Arrow kernels,
shingle hashing) that doubles the query.  A ``repartition(1)`` shuffle keeps
the upstream fully parallel (unlike ``coalesce(1)``, which propagates the
1-partition constraint up to the previous shuffle boundary and serializes
shuffle-free pipelines into a single task) and sorting the one post-shuffle
partition yields the same total order with a single upstream evaluation.
Only for results meant to be collected/compared (all ``queries()`` outputs
are); large distributed outputs keep real orderBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    return df.repartition(1).sortWithinPartitions(*cols)


def first_words(col: str | Column, n: int) -> Column:
    """First *n* whitespace-normalized words of *col*, as an array — the
    word-split idiom every transcript construction shares (transcribe,
    convo).  The DuckDB oracles re-derive the same trim/collapse/split
    steps, so a normalization change must land HERE and in the oracles
    together; keeping one definition removes the four-copy drift risk."""
    return F.slice(F.split(F.regexp_replace(F.trim(col), r"\s+", " "), " "), 1, n)
