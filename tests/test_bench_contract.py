"""bench.py contract-line budget: the driver records only the LAST
2000 bytes of stdout, so the one JSON line (plus newline) must fit or
its head is truncated and the round's bench artifact parses as null
(this silently happened when the headline grew to 72 entries — the
emit ladder dropped the whole per-query map). These tests pin the
budget against the CURRENT headline set so the failure mode is a red
test at the commit that adds query 71+, not a missing artifact."""

from __future__ import annotations

import json

import bench


def _line_for(values: dict[str, float]) -> str:
    # cpu_total always present in real runs — include it in the budget
    return bench.format_contract_line(
        values, sum(values.values()), 0.1,
        cpu_total=sum(values.values()) * 8.0,
    )


def _worst_case_values() -> dict[str, float]:
    # every entry at 4 value-chars ("9.99"): the widest a sane sf0.1
    # timing gets (the 2x acceptance band tops out near 6.5 s)
    return {name: 9.99 for name in bench.HEADLINE}


def test_contract_line_fits_driver_tail_at_full_precision():
    line = _line_for(_worst_case_values())
    payload = json.loads(line)
    assert len(line) + 1 <= 2000
    # and WITHOUT the 1-decimal fallback: per-query 2-decimal precision
    # is what the per-pin 2x-band audit reads. At the 9.99-everywhere
    # worst case the ladder may sacrifice cpu_total (it always survives
    # in BENCH_LOCAL.json) but never the per-query walls.
    assert payload["queries"] == {n: 9.99 for n in bench.HEADLINE}


def test_contract_line_keeps_cpu_total_at_realistic_values():
    # a realistic sf0.1 profile must carry BOTH metrics on the one
    # line — the r08 de-noise contract. Real runs mix 3- and 4-char
    # values (BENCH_r07 tail: "0.7", "1.0", "0.37", "2.54") — model
    # that mix rather than the all-4-char worst case, which is what
    # the full-precision test above covers (there cpu_total is the
    # designated sacrifice).
    vals = {
        name: (0.6 if i % 2 else 0.64)
        for i, name in enumerate(bench.HEADLINE)
    }
    line = bench.format_contract_line(vals, sum(vals.values()), 0.1,
                                      cpu_total=412.37)
    payload = json.loads(line)
    assert len(line) + 1 <= 2000
    assert payload["cpu_total"] == 412.37
    assert set(payload["queries"]) == set(bench.HEADLINE)


def test_contract_line_ladder_never_overflows():
    # pathological values (hour-long entries) may legitimately shrink
    # precision or drop the map, but the line must ALWAYS fit
    huge = {name: 8675.3091 for name in bench.HEADLINE}
    line = _line_for(huge)
    assert len(line) + 1 <= 2000
    assert json.loads(line)["metric"] == "headline_queries_total"


def test_headline_entries_all_registered_and_pinned():
    from cdc_algorithms_spark.queries import SPARK_QUERIES

    missing = [q for q in bench.HEADLINE if q not in SPARK_QUERIES]
    assert not missing, f"headline not in registry: {missing}"
    unpinned = [q for q in bench.HEADLINE if q not in bench.BASELINE_SF01]
    assert not unpinned, f"headline without sf0.1 pin: {unpinned}"


def test_contract_line_keeps_cpu_total_at_measured_regime():
    """The measured sf0.1 regime: ~all 4-char per-query values puts the
    2-decimal line at ~1984 bytes, where cpu_total doesn't fit at full
    precision — the ladder must degrade the map to 1-decimal and KEEP
    cpu_total (the r08 de-noise signal) rather than sacrifice it."""
    vals = {name: 0.64 for name in bench.HEADLINE}
    line = bench.format_contract_line(vals, sum(vals.values()), 0.1,
                                      cpu_total=208.46)
    payload = json.loads(line)
    assert len(line) + 1 <= 2000
    assert payload["cpu_total"] == 208.46
    assert set(payload["queries"]) == set(bench.HEADLINE)
