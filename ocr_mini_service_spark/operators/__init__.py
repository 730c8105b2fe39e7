"""Driver-query operator library.

``ordered`` — presentation sort for driver-sized results: a global
``orderBy`` runs a RangePartitioner *sampling pass* that re-evaluates the
whole upstream plan a second time; for an expensive pipeline (Arrow kernels,
shingle hashing) that doubles the query.  Collapsing to one partition and
sorting within it yields the same total order with a single upstream
evaluation.  Only for results meant to be collected/compared (all
``queries()`` outputs are); large distributed outputs keep real orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    return df.coalesce(1).sortWithinPartitions(*cols)
