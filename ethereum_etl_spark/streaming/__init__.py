"""Micro-batch CDC replay: WAL tail → decode → enrich → MERGE → watermark."""

from ethereum_etl_spark.streaming.streamer import ChainStreamer, StreamerConfig  # noqa: F401
