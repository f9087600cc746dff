"""tenzir_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A brand-new engine re-imagining the reference's (Tenzir v4.14, a C++
streaming security-telemetry pipeline engine, /root/reference) pipeline
operators as idiomatic PySpark:

- ``tenzir_spark.lake``    — an Iceberg-style ACID table layer (Parquet data
  files + atomic JSON snapshot commits) playing the role of the reference's
  partition store + catalog (reference: libtenzir/src/importer.cpp:43-60,
  libtenzir/src/catalog.cpp:119-171).
- ``tenzir_spark.cdc``     — binlog/WAL-tail consumer: LWW collapse,
  idempotent MERGE, per-partition watermarks, schema evolution, metrics
  (reference dedup semantics: libtenzir/builtins/operators/deduplicate.cpp).
- ``tenzir_spark.operators`` — the reference's operator inventory
  (SURVEY.md §2) as DataFrame -> DataFrame functions.
- ``tenzir_spark.functions`` — vectorized pandas/Arrow UDFs (token arrays,
  fingerprints); never per-row Python.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the open-source reference repo.
"""

__version__ = "0.1.0"
