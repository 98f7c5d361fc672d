"""Pure-Python Keccak-256 — ABI selector hashing (SURVEY.md F5).

The reference derives 4-byte function selectors via alloy's
``f.selector()`` (reference src/functions.rs:28-29), i.e. the first 4
bytes of Keccak-256 of the canonical signature. Spark has md5/sha2 but
no keccak, and no crypto package is guaranteed on executors, so this is
a dependency-free implementation of the original Keccak (pre-SHA-3
padding, as used by Ethereum), written from the public FIPS-202 /
Keccak specification.

Used inside Arrow-batched extraction stages (see compilestage/); the
per-call cost is irrelevant there because signatures are short and one
hash is computed per extracted function, not per data row.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1

_ROUND_CONSTANTS = (
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
)

#: Rotation offsets r[x][y] from the Keccak reference specification.
_ROTATIONS = (
    (0, 36, 3, 41, 18),
    (1, 44, 10, 45, 2),
    (62, 6, 43, 15, 61),
    (28, 55, 25, 21, 56),
    (27, 20, 39, 8, 14),
)

_RATE_BYTES = 136  # 1088-bit rate / 512-bit capacity → Keccak-256


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: list[list[int]]) -> None:
    """Keccak-f[1600] permutation over the 5×5 lane state, in place."""
    for rc in _ROUND_CONSTANTS:
        # θ
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # ρ and π
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROTATIONS[x][y])
        # χ
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        a[0][0] &= _MASK
        # ι
        a[0][0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (original Keccak 0x01 padding, as in Ethereum —
    NOT the 0x06-padded SHA3-256)."""
    state = [[0] * 5 for _ in range(5)]
    # multi-rate padding: 0x01 … 0x80 (single 0x81 byte when one short)
    padded = bytearray(data)
    pad_len = _RATE_BYTES - (len(padded) % _RATE_BYTES)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"

    for block_start in range(0, len(padded), _RATE_BYTES):
        block = padded[block_start : block_start + _RATE_BYTES]
        for i in range(_RATE_BYTES // 8):
            lane = int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def selector(signature: str) -> str:
    """F5: ``0x`` + first 4 bytes of keccak256(canonical signature) —
    the format the reference stores (src/functions.rs:28-29)."""
    return "0x" + keccak256(signature.encode()).hex()[:8]
