"""Relational + pipeline operators.

Each operator is a DataFrame -> DataFrame transformer designed for
cluster scale: no driver-side collects in the data plane, broadcast
hints where one side is provably small, windows instead of self-joins,
and shuffle keys chosen to survive skew (salting / AQE skew-join).
"""

from linkmerce_spark.operators.dedup import (  # noqa: F401
    dedupe_keep_first,
    insert_ignore,
    exact_dedup,
)
from linkmerce_spark.operators.merge import merge_frames  # noqa: F401
from linkmerce_spark.operators.allocation import (  # noqa: F401
    allocate_proportional,
    allocate_integer_even,
)
from linkmerce_spark.operators.rangejoin import (  # noqa: F401
    effective_dated_join,
    rolling_range_agg,
)
from linkmerce_spark.operators.rownum import global_row_number  # noqa: F401
from linkmerce_spark.operators.topk import top_k_per_group  # noqa: F401
from linkmerce_spark.operators.unpivot import unpivot  # noqa: F401

__all__ = [
    "dedupe_keep_first",
    "insert_ignore",
    "exact_dedup",
    "merge_frames",
    "allocate_proportional",
    "allocate_integer_even",
    "effective_dated_join",
    "rolling_range_agg",
    "global_row_number",
    "top_k_per_group",
    "unpivot",
]
