"""Hypothesis property tests for the layout/linkage pure kernels.

These pin the MATH the Spark expressions implement (the Spark-vs-python
equality is pinned separately in tests/test_extras.py on the identity
grid); pure-python here so hypothesis can run hundreds of examples
without a Spark action per case.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def _demorton(z: int, bits: int = 8) -> tuple[int, int]:
    x = y = 0
    for b in range(bits):
        x |= ((z >> (2 * b + 1)) & 1) << b
        y |= ((z >> (2 * b)) & 1) << b
    return x, y


coord = st.integers(min_value=0, max_value=255)


@given(coord, coord)
@settings(max_examples=300)
def test_morton_roundtrip(x, y):
    assert _demorton(_morton(x, y)) == (x, y)


@given(coord, coord, coord, coord)
@settings(max_examples=300)
def test_morton_prefix_is_quadtree_cell(x1, y1, x2, y2):
    # two points share the top 2*k z-bits IFF they share the top k bits
    # of BOTH coordinates — the property that makes `zval >> shift` a
    # cell assignment with bounded spans in both dimensions
    for k in (2, 4):
        shift = 2 * (8 - k)
        same_cell = (_morton(x1, y1) >> shift) == (_morton(x2, y2) >> shift)
        same_coords = (x1 >> (8 - k)) == (x2 >> (8 - k)) and (
            y1 >> (8 - k)
        ) == (y2 >> (8 - k))
        assert same_cell == same_coords


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60),
    st.integers(min_value=10, max_value=400),
)
@settings(max_examples=200)
def test_compaction_greedy_rule_properties(sizes, target):
    # the rule the Spark window implements: file = floor(bytes_before / target)
    before = 0
    seqs = []
    for s in sizes:
        seqs.append(math.floor(before / float(target)))
        before += s
    # files are non-decreasing; dense whenever no item exceeds the
    # target (an oversized item legitimately skips file ids)
    assert seqs[0] == 0
    assert all(b >= a for a, b in zip(seqs, seqs[1:]))
    if max(sizes) <= target:
        assert sorted(set(seqs)) == list(range(max(seqs) + 1))
    # cumulative invariant: bytes before file k's first item >= k * target
    first_of = {}
    before = 0
    for s, q in zip(sizes, seqs):
        if q not in first_of:
            first_of[q] = before
        before += s
    for k, b in first_of.items():
        if k > 0:
            assert b >= k * target
            assert b < k * target + max(sizes)


@given(st.integers(min_value=0, max_value=2**40), st.integers(min_value=0, max_value=7))
@settings(max_examples=300)
def test_scaled_grid_floor_is_integer_exact(v, span_bits):
    # mirror of operators/layout.py::_scaled — the double-division floor
    # must equal exact rational arithmetic for any in-range input
    lo, hi = 0, (1 << (span_bits + 9)) - 1
    v = v % (hi + 1)
    bits = 8
    ieee = math.floor((v - lo) * float(1 << bits) / float(hi - lo + 1))
    exact = ((v - lo) * (1 << bits)) // (hi - lo + 1)
    assert ieee == exact
