from tenzir_spark.lake.table import LakeTable, BUCKET_COL, COMMIT_COL
from tenzir_spark.lake.merge import merge_batch

__all__ = ["LakeTable", "merge_batch", "BUCKET_COL", "COMMIT_COL"]
