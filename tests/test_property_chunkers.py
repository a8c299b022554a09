"""Hypothesis property tests for the chunk-boundary scanners.

The corpus-based tests pin behavior on realistic text; these drive the
vectorized scanners (chunkers/fast.py) against the reference-faithful
byte loops (chunkers/core.py) on adversarial random inputs — repeated
bytes, short buffers, low-entropy runs — checking exact cut equality
plus the CDC invariants from SURVEY.md §5: cuts strictly increasing and
ending at the last byte (cuts are inclusive end indices, reference
style: ae.rs:49-51), chunk sizes clamped to [min, max] for non-final
chunks where the algorithm defines clamps (fastcdc.rs:68-69,
rabin.rs:47-48; AE has neither — ae.rs:26), concatenation preserves
every byte, and shift-invariance (boundaries resynchronize after a
prefix edit — the property that makes chunking "content-defined" at
all, and the reason dedup survives insertions).

No Spark session: scanners are pure functions, so hypothesis can run
hundreds of cases in seconds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_algorithms_spark.chunkers import core, fast
from cdc_algorithms_spark.chunkers.params import make_params

ALGOS = ["ae", "rabin", "fastcdc"]

_PAIRS = {
    "ae": (core.ae_cuts_py, fast.ae_cuts),
    "rabin": (core.rabin_cuts_py, fast.rabin_cuts),
    "fastcdc": (core.fastcdc_cuts_py, fast.fastcdc_cuts),
}

payload = st.one_of(
    st.binary(min_size=0, max_size=4096),
    # low-entropy runs: worst case for extremum/mask logic
    st.integers(1, 4096).flatmap(
        lambda n: st.sampled_from([b"a" * n, b"ab" * (n // 2 + 1), bytes(n)])
    ),
)


@pytest.mark.parametrize("algo", ALGOS)
@settings(max_examples=150, deadline=None)
@given(data=payload, expected=st.sampled_from([320, 512, 1024]), seed=st.integers(0, 3))
def test_fast_equals_core(algo, data, expected, seed):
    p = make_params(algo, expected, seed=seed)
    ref_fn, fast_fn = _PAIRS[algo]
    assert fast_fn(data, p) == ref_fn(data, p)


@pytest.mark.parametrize("algo", ALGOS)
@settings(max_examples=100, deadline=None)
@given(data=st.binary(min_size=0, max_size=8192), seed=st.integers(0, 3))
def test_cut_invariants(algo, data, seed):
    p = make_params(algo, 512, seed=seed)
    cuts = _PAIRS[algo][1](data, p)
    assert cuts == sorted(set(cuts)), "cuts strictly increasing"
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data) - 1, "final boundary is the last byte index"
    # chunk i spans (prev_cut, cut]; lengths must reassemble the buffer
    lengths = [b - a for a, b in zip([-1] + cuts[:-1], cuts)]
    assert sum(lengths) == len(data)
    for ln in lengths[:-1]:  # the appended final chunk may be any size
        if algo in ("rabin", "fastcdc"):
            assert ln >= p.min_size, "min-size clamp skipped a cut candidate"
            assert ln <= p.max_size, "max-size force cut bounds every chunk"
        else:  # AE: window defines an implicit floor, no max clamp (ae.rs:26)
            assert ln >= p.window_size + 1


@pytest.mark.parametrize("algo", ALGOS)
@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.large_base_example],
)
@given(
    data=st.binary(min_size=2048, max_size=8192),
    prefix=st.binary(min_size=1, max_size=64),
)
def test_shift_invariance_resync(algo, data, prefix):
    """After prepending a prefix, cut positions eventually realign to the
    original cuts + len(prefix) — content-defined boundaries resynchronize
    (the defining CDC property; fixed-size chunking fails this)."""
    p = make_params(algo, 320, seed=1)
    fast_fn = _PAIRS[algo][1]
    base = {c + len(prefix) for c in fast_fn(data, p)}
    shifted = set(fast_fn(prefix + data, p))
    # all boundaries past the first resynchronized cut must agree;
    # FastCDC's normalized masks depend on distance-since-last-cut, so
    # resync can take several cuts — require agreement on the tail only.
    common = sorted(base & shifted)
    assert common, "no boundary ever resynchronized"
    tail_from = common[0]
    assert {c for c in base if c >= tail_from} == {
        c for c in shifted if c >= tail_from
    }


@pytest.mark.parametrize("algo", ALGOS)
@given(data=payload, expected=st.sampled_from([256, 512, 4096, 16384]))
@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_native_equals_numpy(algo, data, expected):
    """The optional compiled scans (chunkers/native.py) and the numpy
    formulations must produce identical cuts for both the final-cut and
    bounds variants; skips when no compiler exists (then the numpy path
    is the only one and the core-equality tests above cover it)."""
    import numpy as np

    import cdc_algorithms_spark.chunkers.native as native

    if algo == "ae" and expected == 256:
        expected = 512  # AE's reference window formula needs expected > 256
    p = make_params(algo, expected, 1)
    arr = np.frombuffer(data, dtype=np.uint8) if data else np.empty(0, np.uint8)
    native_fn = getattr(native, f"{algo}_scan_native")
    numpy_fn = getattr(fast, f"_{algo}_scan_numpy")
    for final in (True, False):
        got = native_fn(arr, p, final)
        if got is None:
            pytest.skip("no system compiler — numpy fallback is the only path")
        want = numpy_fn(arr, p, final)
        assert got == want
