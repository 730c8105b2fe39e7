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

from pyspark.sql import DataFrame


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    return df.repartition(1).sortWithinPartitions(*cols)
