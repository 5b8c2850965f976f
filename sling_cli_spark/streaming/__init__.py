"""Structured Streaming operators: change-capture, incremental file watch."""

from sling_cli_spark.streaming.cdc import (  # noqa: F401
    read_file_stream, run_cdc_stream, stream_dedup_latest)
