"""Optional compiled FastCDC scan kernel (ctypes + system cc).

The pure-numpy FastCDC scan (fast.py: log-doubling candidate pass +
sparse jumps) runs ~120 MB/s single-thread — the slowest of the three
kernels, because the 64-term Gear window costs six full-array passes
however it is blocked. The rolling-hash formulation is ONE
dependency-chained shift-add per byte, which a C compiler turns into
~GB/s; this module compiles that 40-line loop at first use, caches the
shared object per source-hash in the system temp dir, and exposes it
behind a None-returning probe so callers fall back to the numpy path
when no compiler exists (or ``CDC_SPARK_NATIVE=0`` disables it).

Cluster posture: the C source lives in this module, so every executor
host compiles its own cached copy on first import — nothing is shipped,
no build step exists, heterogeneous nodes each get their own binary.
Equality with the pure paths is pinned by the golden-cut fixtures and a
native-vs-numpy property test (tests/test_property_chunkers.py).

Semantics mirror chunkers/core.py::fastcdc_cuts_py exactly
(fastcdc.rs:77-134): per chunk the Gear hash accumulates once
``local >= min_size``; cut on the short mask below ``expected_size``,
the long mask at/above, or unconditionally at ``max_size``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>

long fastcdc_scan(const uint8_t *data, long n, const uint64_t *gear,
                  long min_size, long expected_size, long max_size,
                  uint64_t short_mask, uint64_t long_mask,
                  int final_cut, long *out) {
    long ncuts = 0;
    long s = 0;
    while (s < n) {
        long cut = -1;
        uint64_t h = 0;
        long limit = n - s;
        for (long local = min_size; local < limit; local++) {
            h = (h << 1) + gear[data[s + local]];
            if ((local < expected_size ? (h & short_mask)
                                       : (h & long_mask)) == 0 ||
                local >= max_size) {
                cut = s + local;
                break;
            }
        }
        if (cut < 0)
            break;
        out[ncuts++] = cut;
        s = cut + 1;
    }
    if (final_cut && n > 0 && (ncuts == 0 || out[ncuts - 1] != n - 1))
        out[ncuts++] = n - 1;
    return ncuts;
}

/* AE (ae.rs:95-149): cut when the running max stays unbeaten for
   window_size bytes. Strict-greater updates, max_val starts at 0. */
long ae_scan(const uint8_t *data, long n, long window_size,
             int final_cut, long *out) {
    long ncuts = 0;
    long s = 0;
    while (s < n) {
        long cut = -1;
        uint8_t max_val = 0;
        long max_pos = 0;
        long limit = n - s;
        for (long local = 0; local < limit; local++) {
            uint8_t cur = data[s + local];
            if (cur > max_val) {
                max_val = cur;
                max_pos = local;
            } else if (local == max_pos + window_size) {
                cut = s + local;
                break;
            }
        }
        if (cut < 0)
            break;
        out[ncuts++] = cut;
        s = cut + 1;
    }
    if (final_cut && n > 0 && (ncuts == 0 || out[ncuts - 1] != n - 1))
        out[ncuts++] = n - 1;
    return ncuts;
}

/* Rabin (rabin.rs:131-216): h = h*alpha + byte mod 2^32; once
   local >= window_size the leaving byte is removed via
   pow_table[b] = b * alpha^window_size; cut when local >= min_size and
   (h ^ seed) & mask == 0; force-cut checked BEFORE the hash update at
   local >= max_size (a force-cut chunk is max_size + 1 bytes). The
   window contents are just the trailing bytes of data, so no ring
   buffer is needed. */
long rabin_scan(const uint8_t *data, long n, const uint32_t *pow_table,
                uint32_t alpha, uint32_t seed, uint32_t mask,
                long min_size, long max_size, long window_size,
                int final_cut, long *out) {
    long ncuts = 0;
    long s = 0;
    while (s < n) {
        long cut = -1;
        uint32_t h = 0;
        long limit = n - s;
        for (long local = 0; local < limit; local++) {
            uint8_t cur = data[s + local];
            if (local >= max_size) {
                cut = s + local;
                break;
            }
            h = h * alpha + cur;
            if (local >= window_size) {
                h -= pow_table[data[s + local - window_size]];
                if (local >= min_size && ((h ^ seed) & mask) == 0) {
                    cut = s + local;
                    break;
                }
            }
        }
        if (cut < 0)
            break;
        out[ncuts++] = cut;
        s = cut + 1;
    }
    if (final_cut && n > 0 && (ncuts == 0 || out[ncuts - 1] != n - 1))
        out[ncuts++] = n - 1;
    return ncuts;
}
"""

_lib: ctypes.CDLL | bool | None = None  # None = unprobed, False = unavailable


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib or None
    _lib = False
    if os.environ.get("CDC_SPARK_NATIVE", "1") == "0":
        return None
    try:
        tag = hashlib.sha256(_C_SRC.encode()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), "cdc_spark_native")
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, f"fastcdc_{tag}.so")
        if not os.path.exists(so_path):
            src_path = os.path.join(cache, f"fastcdc_{tag}.c")
            with open(src_path, "w") as f:
                f.write(_C_SRC)
            # compile to a unique temp name, then atomic-rename: parallel
            # Python workers probing simultaneously must never load a
            # half-written .so
            tmp_path = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", src_path, "-o", tmp_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp_path, so_path)
        lib = ctypes.CDLL(so_path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lp = ctypes.POINTER(ctypes.c_long)
        lib.fastcdc_scan.restype = ctypes.c_long
        lib.fastcdc_scan.argtypes = [
            u8p, ctypes.c_long, u64p,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int, lp,
        ]
        lib.ae_scan.restype = ctypes.c_long
        lib.ae_scan.argtypes = [
            u8p, ctypes.c_long, ctypes.c_long, ctypes.c_int, lp,
        ]
        lib.rabin_scan.restype = ctypes.c_long
        lib.rabin_scan.argtypes = [
            u8p, ctypes.c_long, u32p,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, lp,
        ]
        _lib = lib
    except Exception:  # no cc / sandboxed tmp / exotic platform → numpy path
        _lib = False
    return _lib or None


def fastcdc_scan_native(arr: np.ndarray, p, final: bool) -> list[int] | None:
    """Run the compiled scan, or return None when unavailable so the
    caller falls back to the numpy formulation. ``arr`` is the uint8
    view fast.py already builds; the gear table converts once per call
    (256 entries — negligible next to the scan)."""
    lib = _load()
    if lib is None:
        return None
    n = arr.size
    if n == 0:
        return []
    gear = np.asarray(p.gear, dtype=np.uint64)
    out = np.empty(n // (p.min_size + 1) + 2, dtype=np.int64)
    ncuts = lib.fastcdc_scan(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        gear.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        p.min_size,
        p.expected_size,
        p.max_size,
        p.short_mask,
        p.long_mask,
        1 if final else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out[:ncuts].tolist()


def ae_scan_native(arr: np.ndarray, p, final: bool) -> list[int] | None:
    lib = _load()
    if lib is None:
        return None
    n = arr.size
    if n == 0:
        return []
    # every AE chunk is at least window_size + 1 bytes (the first
    # possible cut is max_pos=0 + window_size)
    out = np.empty(n // (p.window_size + 1) + 2, dtype=np.int64)
    ncuts = lib.ae_scan(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        p.window_size,
        1 if final else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out[:ncuts].tolist()


def rabin_scan_native(arr: np.ndarray, p, final: bool) -> list[int] | None:
    lib = _load()
    if lib is None:
        return None
    n = arr.size
    if n == 0:
        return []
    # earliest hash cut at local = max(window_size, min_size); earliest
    # force cut at local = max_size — so chunks can't be shorter than
    # min(max(window_size, min_size), max_size) + 1 bytes
    shortest = min(max(p.window_size, p.min_size), p.max_size) + 1
    out = np.empty(n // shortest + 2, dtype=np.int64)
    pow_table = p.pow_table  # uint32[256]
    ncuts = lib.rabin_scan(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        pow_table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        p.alpha & 0xFFFFFFFF,
        p.seed & 0xFFFFFFFF,
        p.mask & 0xFFFFFFFF,
        p.min_size,
        p.max_size,
        p.window_size,
        1 if final else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out[:ncuts].tolist()
