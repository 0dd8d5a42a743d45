"""Pure-Python Keccak-256 (original Keccak padding, as used by Ethereum).

The reference derives event topics / function selectors with
``eth_utils.keccak`` (/root/reference/ethereumetl/service/token_transfer_extractor.py:47-51,
/root/reference/ethereumetl/json_rpc_requests.py:80-81). Python's hashlib only
ships SHA3 (different padding byte: 0x06 vs Keccak's 0x01), and no eth libs
are installed here, so this is a from-scratch Keccak-f[1600] sponge — public
algorithm (FIPS-202 / Keccak reference). Driver-side it derives constants
once; executor-side it is exposed as an Arrow-batched pandas UDF (P16).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rc in _RC:
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= rc


def keccak256(data: bytes | str) -> str:
    """Keccak-256 digest as 0x-hex string."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    rate = 136  # 1088 bits
    # Keccak (pre-FIPS) pad: 0x01 ... 0x80
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"

    state = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
            state[i % 5][i // 5] ^= lane
        _keccak_f(state)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        out += state[i % 5][i // 5].to_bytes(8, "little")
    return "0x" + bytes(out).hex()


@pandas_udf(StringType())
def keccak256_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) keccak256 of utf-8 strings → 0x-hex."""
    return s.map(lambda x: None if x is None else keccak256(x))


def keccak256_col(c: Column) -> Column:
    return keccak256_udf(c)


def event_topic(signature: str) -> str:
    """Event signature → topic0 (keccak of canonical signature)."""
    return keccak256(signature)


def function_selector(signature: str) -> str:
    """Function signature → 4-byte selector hex (no 0x)."""
    return keccak256(signature)[2:10]
