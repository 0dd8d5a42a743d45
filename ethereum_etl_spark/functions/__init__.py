"""Scalar function surface (SURVEY.md §2.9, §2.11)."""

from ethereum_etl_spark.functions.hex import (  # noqa: F401
    hex_to_dec38,
    hex_to_long,
    split_to_words,
    to_normalized_address,
    word_to_address,
)
from ethereum_etl_spark.functions.ids import item_id, item_timestamp  # noqa: F401
from ethereum_etl_spark.functions.keccak import keccak256, keccak256_udf  # noqa: F401
