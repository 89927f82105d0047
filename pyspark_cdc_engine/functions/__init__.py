"""Reusable column-expression builders (HOF dedup/merge, etc.)."""

from pyspark_cdc_engine.functions.arrays import (  # noqa: F401
    dedup_array_expr,
    merge_array_expr,
    merge_struct_expr,
)
