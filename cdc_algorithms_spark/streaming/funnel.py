"""Stateful streaming funnel: per-user stage progress as operator state.

The batch funnel (operators/linkage.py::event_funnel) re-aggregates the
whole event table; this is its incremental twin — per-user state holds
the earliest qualifying timestamp of each reached stage, each
micro-batch advances it, and a row ``(user, depth)`` is emitted whenever
a user reaches a deeper stage. Because depth is monotone, the converged
``max(depth)`` per user equals the batch funnel's deepest stage, so the
same DuckDB oracle checks the streaming result.

Exactness condition (asserted by the registered query's staging): event
arrival is timestamp-ordered ACROSS micro-batches per user (within a
batch any order is fine — the batch is sorted in-state). Under that
condition the sequential update rule

    stage 0:   t0 = first-seen stage-0 timestamp
    stage k:   t_k = first timestamp with type == stages[k],
               t_{k-1} set, and ts > t_{k-1}

reproduces the batch semantics (t_k = min qualifying ts) because events
are visited in ascending ts order, so the first qualifying event IS the
minimum. Ties at ts == t_{k-1} are excluded by the strict > on both
sides, independent of visit order.

Scale posture: state is ``len(stages)`` longs per in-flight user,
sharded by user across executors; emissions happen only on advancement
(at most ``len(stages)`` rows per user over the stream's lifetime).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

from pyspark.sql import DataFrame

_UNSET = -1  # sentinel: stage not reached (state columns are non-null longs)

OUT_SCHEMA = "user_id long, depth long"


def stateful_funnel(
    events_stream: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user_id, depth)`` advancement feed over an event stream.

    ``depth`` is 0-based (depth k = reached ``stages[k]``); a row is
    emitted only when a user's depth increases, so the converged
    per-user ``max(depth)`` is their final funnel stage.
    """
    stages = list(stages)
    if not stages:
        raise ValueError("stages must be non-empty")
    # fail fast in the driver: the output/state schemas are fixed, so
    # the key must be integral and the timestamp a real timestamp (an
    # integer ts would be misread as nanoseconds by the normalization)
    dtypes = dict(events_stream.dtypes)
    if dtypes.get(user_col) not in ("int", "bigint", "smallint", "tinyint"):
        raise TypeError(
            f"stateful_funnel needs an integral {user_col!r}; got "
            f"{dtypes.get(user_col)!r}"
        )
    if dtypes.get(ts_col) not in ("timestamp", "timestamp_ntz"):
        raise TypeError(
            f"stateful_funnel needs a timestamp {ts_col!r}; got "
            f"{dtypes.get(ts_col)!r}"
        )
    n_stages = len(stages)
    state_schema = ", ".join(f"t{k} long" for k in range(n_stages))

    def advance(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        user = int(key[0])
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        # normalize to ns first (pandas may hand us datetime64[us] or [ns]
        # depending on the Arrow path), then truncate to µs — the
        # resolution the batch comparison runs at
        ts_us = (
            rows[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        ).tolist()
        types = rows[type_col].tolist()

        t = list(state.get) if state.exists else [_UNSET] * n_stages
        depth_before = sum(1 for v in t if v != _UNSET) - 1

        stage_idx = {s: k for k, s in enumerate(stages)}
        for ts, typ in zip(ts_us, types):
            k = stage_idx.get(typ)
            if k is None or t[k] != _UNSET:
                continue
            if k == 0:
                t[0] = ts
            elif t[k - 1] != _UNSET and ts > t[k - 1]:
                t[k] = ts

        depth_after = sum(1 for v in t if v != _UNSET) - 1
        state.update(tuple(t))

        if depth_after > depth_before:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([user], dtype="int64"),
                    "depth": pd.Series([depth_after], dtype="int64"),
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "depth": pd.Series([], dtype="int64"),
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy(user_col).applyInPandasWithState(
        advance,
        outputStructType=OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming compaction assignment (same module: tiny stateful operators)
# ---------------------------------------------------------------------------

ASSIGN_SCHEMA = "group string, item long, size long, file_seq long"


def stateful_compaction(
    items_stream: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Streaming twin of ``operators/layout.py::compaction_plan``: the
    per-group running byte total lives in operator state, so each
    arriving item gets its target file the moment it lands — the
    continuous-ingest version of the OPTIMIZE planner.

    Emits ``(group, item, size, file_seq)`` per arriving item. Exact
    under ``order_col``-ordered arrival across micro-batches per group
    (in-batch disorder is sorted in state — same contract as
    ``stateful_funnel``); under that condition the emitted assignment
    equals the batch plan's, so the batch oracle applies to the
    aggregated manifest.

    State is ONE long per in-flight group.
    """
    from collections.abc import Iterator
    from typing import Any

    dtypes = dict(items_stream.dtypes)
    if dtypes.get(group_col) != "string":
        raise TypeError(
            f"stateful_compaction needs a string {group_col!r} (the output "
            f"schema is fixed); got {dtypes.get(group_col)!r}"
        )
    if dtypes.get(order_col) not in ("int", "bigint", "smallint", "tinyint"):
        raise TypeError(
            f"stateful_compaction needs an integral {order_col!r}; got "
            f"{dtypes.get(order_col)!r}"
        )
    target = float(int(target_bytes))

    def assign(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        group = key[0]
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(order_col)
        (cum,) = state.get if state.exists else (0,)
        items, sizes, seqs = [], [], []
        for item, size in zip(rows[order_col], rows[size_col]):
            items.append(int(item))
            sizes.append(int(size))
            seqs.append(int(math.floor(cum / target)))
            cum += int(size)
        state.update((cum,))
        yield pd.DataFrame(
            {
                "group": pd.Series([group] * len(items), dtype="object"),
                "item": pd.Series(items, dtype="int64"),
                "size": pd.Series(sizes, dtype="int64"),
                "file_seq": pd.Series(seqs, dtype="int64"),
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return items_stream.groupBy(group_col).applyInPandasWithState(
        assign,
        outputStructType=ASSIGN_SCHEMA,
        stateStructType="cum long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
