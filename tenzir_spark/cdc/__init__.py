from tenzir_spark.cdc.changegen import generate_changes
from tenzir_spark.cdc.collapse import collapse_lww
from tenzir_spark.cdc.runner import IngestRunner, BASE_PAYLOAD_SCHEMA

__all__ = ["generate_changes", "collapse_lww", "IngestRunner", "BASE_PAYLOAD_SCHEMA"]
