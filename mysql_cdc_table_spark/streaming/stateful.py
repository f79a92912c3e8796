"""Custom stateful streaming operators via applyInPandasWithState —
the arbitrary-state API the engine offers where built-in windows/dedup
don't fit (per-key accumulators, custom session logic, CDC-aware
counters).

State lives in the state store (checkpointed, partitioned by key);
each micro-batch routes its rows to the key's partition — one shuffle
per batch, state size O(#live keys), bounded by timeouts when
configured.

Reference parity: this surface is what the reference's users reach
through MySQL's SQL layer (the plugin itself only contributes the
scan - /root/reference/binlogdb.cc:477-551; SURVEY.md §2C).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches —
    the canonical accumulate-forever stateful operator. Emits the
    cumulative totals for every key seen in a batch."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [round(total, 6)]})

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, n long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def expiring_user_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    time_col: str = "ts",
    idle_ms: int = 30_000,
) -> DataFrame:
    """running_user_totals with EVENT-TIME TIMEOUT eviction: a key whose
    newest event is more than ``idle_ms`` behind the watermark is timed
    out — its final totals are emitted once with evicted=true and its
    state is REMOVED (state size stays O(active keys), the bound
    accumulate-forever operators lack). ``events`` must already carry a
    watermark on ``time_col`` (EventTimeTimeout requires one).

    Epoch correctness: Spark hands the Python worker SESSION-LOCAL naive
    timestamps, while pandas ``Timestamp.timestamp()`` reads a naive
    value as UTC — so the event time is localized with the session
    timezone (captured driver-side) before converting to epoch ms. The
    timeout is also clamped to watermark+1: Spark rejects a timeout at
    or below the current watermark, which a key whose newest event is
    already idle_ms behind it would otherwise request."""
    session_tz = (
        events.sparkSession.conf.get("spark.sql.session.timeZone") or "UTC"
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [round(total, 6)],
                 "evicted": [True]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        newest = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            m = pdf[time_col].max()
            newest = m if newest is None else max(newest, m)
        state.update((n, total))
        ts = pd.Timestamp(newest)
        if ts.tzinfo is None:
            ts = ts.tz_localize(session_tz)
        timeout_ms = int(ts.timestamp() * 1000) + idle_ms
        wm_ms = state.getCurrentWatermarkMs()
        if timeout_ms <= wm_ms:
            timeout_ms = wm_ms + 1
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [round(total, 6)],
             "evicted": [False]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType="key long, n long, total double, evicted boolean",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_user_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """running_user_totals on the transformWithStateInPandas API
    (Spark 4's arbitrary-state surface, successor to
    applyInPandasWithState): a StatefulProcessor with a typed
    ValueState. Both APIs are part of the engine's stateful surface —
    the old one for compatibility, this one for new code (composable
    state variables, timers, TTL). Requires the RocksDB state store
    provider (set in the test/session conf); state is checkpointed and
    partitioned by key exactly like the applyInPandas variant.

    Environment gate: the transformWithState worker protocol needs
    ``google.protobuf``, which this sandbox lacks — the operator raises
    a pointed ImportError up front instead of crashing the driver-side
    state worker mid-query (the test skips accordingly; the
    applyInPandasWithState twin carries the behavioral coverage)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (the "
            "state-server wire protocol); install protobuf or use "
            "running_user_totals (applyInPandasWithState) instead"
        ) from ex
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total double"
            )

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"key": [key[0]], "n": [n], "total": [round(total, 6)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        _Totals(),
        outputStructType="key long, n long, total double",
        outputMode="Update",
        timeMode="None",
    )


def cdc_live_key_counter(changelog: DataFrame) -> DataFrame:
    """CDC-aware stateful op: tracks whether each key is live (last op
    not DELETE) and how many images it has seen — a streaming analogue
    of cdc.ops.changes_per_key with O(keys) state."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_images, live = state.get
        else:
            n_images, live = 0, False
        # track the max (gtid, event_seq, image_seq) ACROSS chunks — a
        # key's batch rows can span pandas chunks, and the final chunk's
        # last row is not necessarily the newest (round-1 advisory)
        best_key, last_op = None, None
        for pdf in pdfs:
            n_images += len(pdf)
            for g, e, i, op in zip(
                pdf["__gtid"], pdf["__event_seq"], pdf["__image_seq"], pdf["__op"]
            ):
                k = (int(g), int(e), int(i))
                if best_key is None or k > best_key:
                    best_key, last_op = k, int(op)
        if last_op is not None:
            live = last_op != 0
        state.update((n_images, bool(live)))
        yield pd.DataFrame(
            {"key": [key[0]], "n_images": [n_images], "live": [bool(live)]}
        )

    return changelog.groupBy("id").applyInPandasWithState(
        fn,
        outputStructType="key long, n_images long, live boolean",
        stateStructType="n_images long, live boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
