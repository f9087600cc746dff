"""Operator library: the reference's pipeline operators (SURVEY.md §2) as
idiomatic DataFrame -> DataFrame functions.

Tenzir pipelines are linear operator chains over event streams
(reference: libtenzir/include/tenzir/pipeline.hpp:30-36); here each operator
is a composable Python function, and Catalyst replaces the reference's
hand-rolled pushdown pass (libtenzir/src/pipeline.cpp:147-218).
"""

from tenzir_spark.operators.core import (
    where, select, drop, put, extend, set_fields, replace_fields, rename,
    head, tail, slice_rows, taste, unique_adjacent, deduplicate, enumerate_rows,
    reverse,
)
from tenzir_spark.operators.aggregate import summarize, top, rare, sort, measure
from tenzir_spark.operators.structural import flatten, unflatten, unroll, yield_
from tenzir_spark.operators.transform import hash_field, timeshift, parse_json_field
from tenzir_spark.operators.enrich import enrich, lookup_table_context, bloom_filter_context
