"""Micro-batch CDC replay: WAL tail → decode → enrich → MERGE → watermark."""

from ethereum_etl_spark.streaming.amqp import run_amqp_reingest  # noqa: F401
from ethereum_etl_spark.streaming.streamer import (  # noqa: F401
    DEFAULT_ENTITIES,
    ChainStreamer,
    StreamerConfig,
)
