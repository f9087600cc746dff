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


def batch(df: DataFrame, rows_per_batch: int = 65536,
          row_count: int | None = None) -> DataFrame:
    """`batch <n>` (batch.cpp): re-chunk the stream into ~n-row units.

    When the row count is known for FREE — supplied by the caller or
    exact in the optimized plan's statistics (parquet footer counts,
    range sources) — the Spark analog of a batch is a partition, so this
    repartitions to ceil(rows/n) partitions. When it is NOT (filters,
    joins), no counting job runs: the reference's batch resizes TABLE
    SLICES inside one pipe, not parallelism, so the faithful analog is
    per-partition Arrow re-chunking — `mapInArrow` slices each incoming
    record batch to ≤n rows, one pass, zero shuffle, zero extra jobs.
    At scale prefer tuning spark.sql.files.maxPartitionBytes so the SCAN
    produces the right granularity in the first place."""
    import math

    rows_per_batch = max(rows_per_batch, 1)
    if row_count is None:
        # optimized-plan row-count statistic: exact for simple scans
        # (parquet footer counts) and range sources; absent otherwise
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        if stats.rowCount().isDefined():
            row_count = int(str(stats.rowCount().get()))
        else:
            n = rows_per_batch

            def _rechunk(batches):
                for b in batches:
                    for off in range(0, b.num_rows, n):
                        yield b.slice(off, min(n, b.num_rows - off))

            return df.mapInArrow(_rechunk, df.schema)
    n = max(1, math.ceil(row_count / rows_per_batch))
    return df.repartition(n)


def delay(batches, time_col: str = "ts", speed: float = 1.0, sleep=None):
    """`delay` (delay.cpp:17-40): replay pacing — re-emit micro-batches
    spaced by the time column's inter-batch gaps, scaled by ``speed``
    (2.0 = twice as fast). A driver-side generator over (start_ts,
    DataFrame) pairs: rows never pass through Python, only the batch
    boundary timestamps do. Yields each DataFrame at its paced moment."""
    import time as _time

    _sleep = sleep or _time.sleep
    prev_ts = None
    for ts, df in batches:
        if prev_ts is not None and speed > 0:
            gap = (ts - prev_ts) / speed
            if gap > 0:
                _sleep(gap)
        prev_ts = ts
        yield df


def shell(df: DataFrame, command: str, column: str | None = None,
          out_col: str = "line") -> DataFrame:
    """``shell <command>`` (shell.cpp; shell.md: stdin/stdout hooked into
    the pipeline). The Spark-native restatement is ``RDD.pipe`` — each
    PARTITION spawns the command and streams its rows through the child's
    stdin/stdout (the Hadoop-streaming model), so the operator
    distributes instead of funneling bytes through one process like the
    reference. Consequences, documented not hidden: the command runs once
    per partition (a stateful filter like ``sort`` is per-partition), and
    row order within a partition is the child's output order.

    One string column in (default: the first), one string column out.
    This is one of the few justified RDD usages in the engine — genuinely
    per-partition imperative byte piping with no Catalyst equivalent."""
    col = column or df.columns[0]
    spark = df.sparkSession
    piped = (
        df.select(F.col(col).cast("string"))
        .rdd.map(lambda r: r[0] if r[0] is not None else "")
        .pipe(command)
    )
    return spark.createDataFrame(piped.map(lambda s: (s,)),
                                 T.StructType([T.StructField(out_col, T.StringType(), True)]))


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


def show(spark: SparkSession, aspect: str, table=None) -> DataFrame:
    """Lake introspection aspects from the table manifests — the
    reference's `show <aspect>` family (builtins/aspects/*.cpp exposes
    partitions/fields/version/...; here the lake snapshot JSON already
    holds everything, so every aspect is a driver-side manifest read, no
    Spark job).

    Aspects over a LakeTable:
    - ``partitions``: one row per data file (path, kind, commit, bucket(s),
      rows) — the reference's partition synopsis listing.
    - ``fields``: one row per schema field of the current snapshot.
    - ``properties``: flattened snapshot properties (watermarks etc.).
    - ``snapshots``: one row per snapshot version (the time-travel log).
    Global: ``version`` (no table needed).
    """
    import json

    if aspect == "version":
        return version(spark)
    if table is None:
        raise ValueError(f"aspect {aspect!r} needs a LakeTable")
    if aspect == "partitions":
        rows = [
            Row(
                path=e["path"],
                kind=e.get("kind", "base"),
                commit=int(e["commit"]),
                buckets=[int(b) for b in e.get("buckets", [e.get("bucket")])],
                rows=int(e.get("rows", -1)),
            )
            for e in table.snapshot()["files"]
        ]
        schema = "path string, kind string, commit long, buckets array<int>, rows long"
        return spark.createDataFrame(rows, schema)
    if aspect == "fields":
        snap = table.snapshot()
        rows = [
            Row(field=f["name"], type=str(f["type"]), nullable=bool(f["nullable"]))
            for f in snap["schema"]["fields"]
        ]
        return spark.createDataFrame(rows, "field string, type string, nullable boolean")
    if aspect == "properties":
        props = table.properties()
        rows = [Row(key=k, value=json.dumps(v, sort_keys=True)) for k, v in sorted(props.items())]
        return spark.createDataFrame(rows, "key string, value string")
    if aspect == "snapshots":
        # LakeTable.history() is the single source of truth: RETAINED
        # versions only (a dense range() would crash on expired holes),
        # rollbacks carrying their marker so the history reads honestly
        rows = [
            Row(
                version=h["version"],
                parent=h["parent"],
                n_base_files=h["base_files"],
                n_delta_files=h["delta_files"],
                total_rows=h["rows"],
                rollback_of=h["rollback_of"],
            )
            for h in table.history()
        ]
        return spark.createDataFrame(
            rows,
            "version long, parent long, n_base_files long, "
            "n_delta_files long, total_rows long, rollback_of long",
        )
    raise ValueError(f"unknown aspect {aspect!r} "
                     "(partitions|fields|properties|snapshots|version|"
                     "operators|formats)")


#: `show operators` / `show formats` (the reference's plugin-registry
#: aspects, builtins/aspects/operators.cpp, formats.cpp). The pipeline
#: front-end's operator names are its registry; the format list mirrors
#: sources/formats.py + grok/feather.
_PIPELINE_OPERATORS = [
    "where", "select", "drop", "rename", "set", "extend", "replace", "put",
    "summarize", "sort", "head", "tail", "taste", "slice", "reverse",
    "top", "rare", "unique", "deduplicate", "enumerate", "measure",
    "unroll", "flatten", "unflatten", "yield", "batch", "timeshift",
    "hash", "pass", "discard", "repeat", "parse", "apply", "enrich",
    "decapsulate", "yara",
    "lookup", "sigma", "pseudonymize", "compress", "decompress", "publish",
    "chart", "shell", "version", "local", "remote", "unordered",
    "every", "cron", "python",
    # training-data curation extensions (not reference operators):
    "sample", "c4-filter", "window-dedup", "dedup-spans", "pack", "chunk", "fim",
    "line-dedup",
    "redact-pii", "dsir-sample", "bpe", "semdedup", "cluster-dedup",
    "near-dedup", "semantic-dedup",
    "lm-filter", "gopher-filter", "repetition-filter",
    "html-extract", "url-filter", "quality-filter", "cross-dedup",
    "sessionize", "fill-forward", "rolling", "asof-join",
]
_FORMATS = [
    "json", "ndjson", "csv", "tsv", "ssv", "xsv", "parquet", "feather",
    "lines", "kv", "grok", "syslog3164", "syslog5424", "cef", "leef",
    "zeek-tsv", "zeek-json", "yaml", "pcap", "bitz", "gelf", "suricata",
    "msgpack", "fluentbit",
]
_CONNECTORS = [
    # (name, loader?, saver?) — the byte-transport inventory; each maps to
    # the module named in SURVEY §2's coverage table
    ("file", True, True), ("directory", True, True), ("stdin", True, False),
    ("stdout", False, True), ("tcp", True, False), ("udp", True, False),
    ("http", True, True), ("https", True, True), ("ftp", True, False),
    ("email", False, True), ("kafka", True, False),
    ("sqs", True, False), ("amqp", True, False), ("zmq", True, True),
    ("s3", True, True), ("gcs", True, True), ("nic", True, False),
    ("fluentbit", True, True),
]


def show_registry(spark: SparkSession, aspect: str) -> DataFrame:
    """`show operators|formats`: the textual front-end's operator registry
    and the format-parser inventory, one name per row."""
    if aspect == "connectors":
        return spark.createDataFrame(
            [Row(name=n, loader=l, saver=s)
             for n, l, s in sorted(_CONNECTORS)],
            "name string, loader boolean, saver boolean")
    names = {"operators": _PIPELINE_OPERATORS, "formats": _FORMATS}.get(aspect)
    if names is None:
        raise ValueError(f"unknown registry aspect {aspect!r}")
    return spark.createDataFrame([Row(name=n) for n in sorted(names)],
                                 "name string")
