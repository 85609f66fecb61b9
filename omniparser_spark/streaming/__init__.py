"""Structured Streaming front-end for the CDC apply loop."""

from omniparser_spark.streaming.stream import run_streaming_apply  # noqa: F401
