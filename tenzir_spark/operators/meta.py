"""Pipeline-control / metadata operators (SURVEY.md §2.8).

Reference parity:
- pass            -> builtins/operators/pass.cpp (identity)
- discard         -> discard.cpp (consume & drop; noop sink)
- set-attributes/ -> set_attributes.cpp / get_attributes.cpp — schema-level
  get-attributes     key/value metadata; Spark analog is StructField.metadata
- chart           -> chart.cpp:55-115 (rendering hints as schema attributes)
- version         -> version.cpp (one version event)
- show schemas    -> builtins/aspects (catalog introspection)
- unordered       -> unordered.cpp (order relaxation — Spark default; no-op)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pass_(df: DataFrame) -> DataFrame:
    return df


def discard(df: DataFrame) -> None:
    """Consume and drop the stream (forces full evaluation, no output)."""
    df.write.format("noop").mode("overwrite").save()


def unordered(df: DataFrame) -> DataFrame:
    """Order relaxation is Spark's default execution model; identity."""
    return df


def set_attributes(df: DataFrame, field: str, **attrs) -> DataFrame:
    """Attach key/value attributes to one field's schema metadata — the
    type-attribute system of the reference (type.hpp:119-132)."""
    fields = []
    for f in df.schema.fields:
        if f.name == field:
            md = dict(f.metadata or {})
            md.update(attrs)
            f = T.StructField(f.name, f.dataType, f.nullable, md)
        fields.append(f)
    # metadata-only change: re-alias the column with the new metadata
    return df.withColumn(field, F.col(field).alias(field, metadata=dict(
        next(f for f in fields if f.name == field).metadata)))


def get_attributes(df: DataFrame, field: str) -> dict:
    return dict(df.schema[field].metadata or {})


def chart(df: DataFrame, chart_type: str, x: str, y: str) -> DataFrame:
    """Attach rendering hints (chart.cpp attaches type/x/y as schema
    attributes)."""
    out = set_attributes(df, x, chart="x", chart_type=chart_type)
    return set_attributes(out, y, chart="y", chart_type=chart_type)


def version(spark: SparkSession) -> DataFrame:
    """One event describing the engine (version.cpp analog)."""
    import tenzir_spark

    return spark.createDataFrame(
        [Row(engine="tenzir_spark",
             version=getattr(tenzir_spark, "__version__", "0.1"),
             spark_version=spark.version)]
    )


def show_schemas(spark: SparkSession, sf_dir: str, tables: list[str]) -> DataFrame:
    """`show schemas|fields` aspect: one row per (table, field, type)."""
    rows = []
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for f in df.schema.fields:
            rows.append(Row(table=t, field=f.name, type=f.dataType.simpleString(),
                            nullable=f.nullable))
    return spark.createDataFrame(rows)
