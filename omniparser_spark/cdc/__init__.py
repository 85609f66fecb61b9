"""CDC apply loop: resumable offset checkpoints, lineage, metrics, pipeline."""

from omniparser_spark.cdc.pipeline import CdcPipeline  # noqa: F401
