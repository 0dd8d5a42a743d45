"""Token metadata normalization — the eth_call fallback-coalesce (S9).

The reference fetches symbol/name with FOUR ABI variants (string and bytes32
returns, /root/reference/ethereumetl/service/eth_token_service.py:37-75) and
coalesces the first decodable answer. In the lake engine the metadata
arrives as a dimension stream whose values may be either plain strings or
raw bytes32 words (non-standard tokens like MKR return bytes32); the
columnar rendering decodes bytes32 → UTF-8 (trailing zero bytes stripped,
malformed bytes replaced — session-level REPLACE decode) and coalesces:
plain string → decoded bytes32 → NULL, all inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_bytes32(raw):
    """0x + 64-hex word → trimmed UTF-8 string, NULL when empty."""
    hexpart = F.regexp_replace(F.substring(raw, 3, 64), "(00)+$", "")
    decoded = F.decode(F.unhex(hexpart), "UTF-8")
    return F.nullif(F.trim(decoded), F.lit(""))


def normalize_token_metadata(
    tokens: DataFrame, cols: tuple[str, ...] = ("symbol", "name")
) -> DataFrame:
    """Per metadata column: plain strings pass through; bytes32-shaped
    values decode to UTF-8; undecodable/empty → NULL (the reference's
    final fallback, eth_token_service.py:66-75)."""
    out = tokens
    for c in cols:
        if c not in tokens.columns:
            continue
        raw = F.col(c)
        is_b32 = raw.rlike("^0x[0-9a-fA-F]{64}$")
        out = out.withColumn(c, F.when(is_b32, _clean_bytes32(raw)).otherwise(raw))
    return out
