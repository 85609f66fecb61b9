"""Lake table: Iceberg-semantics snapshot table over parquet + MERGE INTO."""

from omniparser_spark.lake.table import LakeTable  # noqa: F401
from omniparser_spark.lake.merge import merge_into  # noqa: F401
