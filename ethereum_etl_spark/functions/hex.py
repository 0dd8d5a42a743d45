"""Hex / address normalization column functions.

Re-expresses (from scratch, columnar) the scalar helpers of the reference:
- hex_to_dec       /root/reference/ethereumetl/utils.py:46-54 (tolerant int(x,16))
- to_normalized_address /root/reference/ethereumetl/utils.py:84-87 (lowercase)
- chunk_string / split_to_words / word_to_address
  /root/reference/ethereumetl/service/token_transfer_extractor.py:199-214

Hot-path policy (BASELINE.json input_hint — no per-row Python):
- values that fit in 63 bits → native ``conv`` (JVM, whole-stage codegen);
- uint256 → chunked ``conv`` + try_* Decimal(38,0) arithmetic, ALSO pure
  JVM (r6: this was an Arrow-batched pandas UDF — correct, but the
  ArrowEvalPython node it planted made EVERY row of every decode cross the
  JVM↔Python boundary even though >99.9% of real values take the fast
  path; guide §4.1). Overflow past 38 digits → NULL, same compromise as
  the reference's BigQuery schema (/root/reference/docs/limitations.md:9-12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, LongType



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


def hex_to_dec38(c: Column) -> Column:
    """0x-hex (or decimal string, or the '~0x' two's-complement marker
    emitted by the signed ABI decode) → Decimal(38,0); NULL on
    overflow/garbage. ALL-JVM (whole-stage codegen), no Python boundary:

    - '0x' hex with ≤ 15 significant digits (the overwhelming majority of
      real values: gas, indexes, token amounts in base units, 64-char ABI
      words with leading zeros) → one native ``conv``;
    - 16–39 significant digits → three 13-digit ``conv`` chunks combined
      with try_multiply/try_add Decimal(38,0) arithmetic (try_* yields NULL
      exactly on |v| ≥ 10^38, the same overflow channel the reference's
      BigQuery schema documents); ≥ 40 digits is ≥ 16^39 > 10^38 → NULL;
    - '~0x' marker: value = hex − 2^(4·width). Computed via per-digit
      complement (translate) so a tiny negative inside a 64-char word never
      touches big arithmetic: value = −(complement + 1);
    - plain decimal strings (dex parsed_event contract) → try_cast.

    Charset gate via translate-to-empty: one linear scan per word inside
    codegen — the r2 rlike + regexp_replace pair ran the regex engine twice
    per word and dominated q23 (VERDICT r2 'what's wrong #4').
    """
    dec38 = DecimalType(38, 0)
    neg = c.startswith("~0x")
    pos = c.startswith("0x")
    # unsigned magnitude digits: raw hex after '0x', or the digit-wise
    # complement after '~0x' (width preserved — the marker's width IS the
    # two's-complement modulus)
    h = F.when(
        neg,
        F.translate(
            F.lower(F.substring(c, 4, 2_000_000)),
            "0123456789abcdef",
            "fedcba9876543210",
        ),
    ).otherwise(F.substring(c, 3, 2_000_000))
    ok_hex = (F.length(h) > 0) & (
        F.length(F.translate(h, "0123456789abcdefABCDEF", "")) == 0
    )
    hz = F.ltrim(h, F.lit("0"))  # strip ABI-word zero padding (JVM trim, no regex)
    nsig = F.length(hz)
    small = F.conv(F.when(hz == "", F.lit("0")).otherwise(hz), 16, 10).cast(dec38)
    # 16–39 significant hex digits: fixed-position 13-digit chunks of the
    # zero-padded form (each ≤ 16^13−1 < 2^63, exact in conv);
    # v = ((a·16^13) + b)·16^13 + d. Only the final step can overflow, and
    # only when v itself ≥ 10^38 — try_* turns exactly that into NULL.
    hp = F.lpad(hz, 39, "0")
    p13 = F.lit(16**13).cast(dec38)
    a = F.conv(F.substring(hp, 1, 13), 16, 10).cast(dec38)
    b = F.conv(F.substring(hp, 14, 13), 16, 10).cast(dec38)
    d = F.conv(F.substring(hp, 27, 13), 16, 10).cast(dec38)
    big = F.try_add(F.try_multiply(F.try_add(F.try_multiply(a, p13), b), p13), d)
    mag = F.when(nsig <= 15, small).when(nsig <= 39, big)  # else NULL
    # '~0x': value = −(complement + 1); −1 − (10^38−1) = −10^38 overflows
    # Decimal(38,0) → NULL, matching the strict −10^38 < v bound
    signed = F.when(neg, F.try_subtract(F.lit(-1).cast(dec38), mag)).otherwise(mag)
    return (
        F.when(c.isNull(), F.lit(None).cast(dec38))
        .when(neg | pos, F.when(ok_hex, signed))
        .when(c.rlike("^\\s*[+-]?[0-9]+\\s*$"), c.try_cast(dec38))
    )


def word_to_dec38(word: Column) -> Column:
    """Bare (0x-less) hex WORD → Decimal(38,0); NULL on garbage/overflow.

    The ABI-word specialization of :func:`hex_to_dec38` (r6): transfer/log
    decode feeds words straight from topic/data slicing, so the general
    function's '0x' concat + prefix re-strip round-trip, '~0x' sign branch
    and decimal-string branch are dead weight per row — identical results
    for every input this path can produce (``hex_to_dec38('0x'||w)`` ≡
    ``word_to_dec38(w)`` for 0x-less w; pinned in test_functions)."""
    dec38 = DecimalType(38, 0)
    ok_hex = (F.length(word) > 0) & (
        F.length(F.translate(word, "0123456789abcdefABCDEF", "")) == 0
    )
    hz = F.ltrim(word, F.lit("0"))
    nsig = F.length(hz)
    small = F.conv(F.when(hz == "", F.lit("0")).otherwise(hz), 16, 10).cast(dec38)
    hp = F.lpad(hz, 39, "0")
    p13 = F.lit(16**13).cast(dec38)
    a = F.conv(F.substring(hp, 1, 13), 16, 10).cast(dec38)
    b = F.conv(F.substring(hp, 14, 13), 16, 10).cast(dec38)
    d = F.conv(F.substring(hp, 27, 13), 16, 10).cast(dec38)
    big = F.try_add(F.try_multiply(F.try_add(F.try_multiply(a, p13), b), p13), d)
    return F.when(ok_hex, F.when(nsig <= 15, small).when(nsig <= 39, big))


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
