"""Chunker parameterization — the reference's "schema" (SURVEY.md §1.2).

Each dataclass replicates one constructor from the reference exactly:

* :class:`AeParams`      — ae.rs:22-29   (window = expected − 256; the
  paper's ``expected/(e−1)`` formula is present but commented out there)
* :class:`RabinParams`   — rabin.rs:45-59 (window = expected/4 − 1,
  min = expected/4, max = 4·expected, α = 1,664,525,
  mask = next_pow2(expected) − 1; HashRabin pow table rabin.rs:19-32)
* :class:`FastCdcParams` — fastcdc.rs:62-74 (min = expected/4,
  max = 8·expected; Knuth-MMIX LCG gear table fastcdc.rs:9-21; paper
  masks at 13 bits else seed-derived rotate-left masks, fastcdc.rs:23-48)

Tables/masks are derived once per process and captured in UDF closures —
the Spark analogue of the reference's per-chunker precomputation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import numpy as np

_U64 = (1 << 64) - 1
_U32 = (1 << 32) - 1

# Knuth-MMIX LCG constants (fastcdc.rs:11-12).
_LCG_ALPHA = 6364136223846793005
_LCG_GAMMA = 1442695040888963407


def _next_pow2(x: int) -> int:
    """Rust ``usize::next_power_of_two`` — smallest power of two >= x."""
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


@lru_cache(maxsize=32)
def gear_table(seed: int) -> tuple[int, ...]:
    """256 pseudo-random u64s from the seed-driven LCG (fastcdc.rs:9-21)."""
    cur = seed & _U64
    out = []
    for _ in range(256):
        cur = (cur * _LCG_ALPHA + _LCG_GAMMA) & _U64
        out.append(cur)
    return tuple(out)


def _rotl64(v: int, r: int) -> int:
    r &= 63
    return ((v << r) | (v >> (64 - r))) & _U64


@lru_cache(maxsize=32)
def fastcdc_masks(expected_size: int, noice: int, seed: int) -> tuple[int, int]:
    """(short_mask, long_mask) per fastcdc.rs:23-48.

    At 13 effective bits (expected ≈ 8 KiB) the FastCDC paper's published
    constants are used; otherwise masks grow by OR-ing a low bit and
    rotating by LCG-driven amounts until they hold ``bits∓noice`` set bits.
    The short mask (more bits, harder to satisfy) applies below
    ``expected_size``; the long mask above — FastCDC's normalized chunking.
    """
    bits_count = bin(_next_pow2(expected_size) - 1).count("1")
    if bits_count == 13:
        return (0x0003590703530000, 0x0000D90003530000)

    mask = 0
    cur = seed & _U64
    while bin(mask).count("1") < bits_count - noice:
        cur = (cur * _LCG_ALPHA + _LCG_GAMMA) & _U64
        mask = _rotl64(mask | 1, cur & 0x3F)
    long_mask = mask
    while bin(mask).count("1") < bits_count + noice:
        cur = (cur * _LCG_ALPHA + _LCG_GAMMA) & _U64
        mask = _rotl64(mask | 1, cur & 0x3F)
    short_mask = mask
    return (short_mask, long_mask)


@dataclass(frozen=True)
class AeParams:
    expected_size: int
    window_size: int

    @staticmethod
    def make(expected_size: int, window_size: int | None = None) -> "AeParams":
        if window_size is None:
            if expected_size <= 256:
                raise ValueError(
                    "AE reference formula window = expected - 256 (ae.rs:26) "
                    f"requires expected_size > 256, got {expected_size}; "
                    "pass window_size explicitly for smaller targets"
                )
            window_size = expected_size - 256
        if window_size <= 0:
            raise ValueError(f"window_size must be positive, got {window_size}")
        return AeParams(expected_size, window_size)


@dataclass(frozen=True)
class RabinParams:
    expected_size: int
    seed: int
    window_size: int
    min_size: int
    max_size: int
    alpha: int = 1_664_525
    mask: int = 0

    @staticmethod
    def make(expected_size: int, seed: int = 0) -> "RabinParams":
        if expected_size < 8:
            raise ValueError(f"expected_size too small: {expected_size}")
        return RabinParams(
            expected_size=expected_size,
            seed=seed & _U32,
            window_size=expected_size // 4 - 1,
            min_size=expected_size // 4,
            max_size=expected_size * 4,
            mask=_next_pow2(expected_size) - 1,
        )

    @property
    def pow_table(self) -> np.ndarray:
        """pow_table[v] = v * α^window_size mod 2^32 (rabin.rs:19-24)."""
        a = pow(self.alpha, self.window_size, 1 << 32)
        return (np.arange(256, dtype=np.uint64) * np.uint64(a)).astype(np.uint32)


@dataclass(frozen=True)
class FastCdcParams:
    expected_size: int
    seed: int
    min_size: int
    max_size: int
    short_mask: int
    long_mask: int
    gear: tuple[int, ...] = field(repr=False, default=())

    @staticmethod
    def make(expected_size: int, seed: int = 0, noice: int = 1) -> "FastCdcParams":
        if expected_size < 4:
            raise ValueError(f"expected_size too small: {expected_size}")
        short_mask, long_mask = fastcdc_masks(expected_size, noice, seed)
        return FastCdcParams(
            expected_size=expected_size,
            seed=seed & _U64,
            min_size=expected_size // 4,
            max_size=expected_size * 8,
            short_mask=short_mask,
            long_mask=long_mask,
            gear=gear_table(seed & _U64),
        )


def make_params(algo: str, expected_size: int, seed: int = 0, **kw):
    if algo == "ae":
        return AeParams.make(expected_size, kw.get("window_size"))
    if algo == "rabin":
        return RabinParams.make(expected_size, seed)
    if algo == "fastcdc":
        return FastCdcParams.make(expected_size, seed, kw.get("noice", 1))
    raise ValueError(f"unknown algo: {algo!r}")
