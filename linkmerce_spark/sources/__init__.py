from linkmerce_spark.sources.readers import read_table  # noqa: F401
from linkmerce_spark.sources.writers import (  # noqa: F401
    write_append,
    write_overwrite_where,
    write_merge,
)

__all__ = [
    "read_table",
    "write_append",
    "write_overwrite_where",
    "write_merge",
]
