"""Structured Streaming front-end for the CDC apply loop."""

from omniparser_spark.streaming.stream import (  # noqa: F401
    run_streaming_apply,
    run_streaming_cdc_topic,
)
