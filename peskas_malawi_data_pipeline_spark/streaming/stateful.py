"""Custom stateful streaming operators via ``applyInPandasWithState``.

Gap-based sessionization is the canonical aggregation Structured Streaming's
built-in windows cannot express (session extent depends on the data, not the
clock grid), so it runs as an arbitrary-stateful operator: per-user state
carries the OPEN session; every micro-batch emits the current totals of each
session it touched, and a ``foreachBatch`` upsert log resolves to exactly
the batch sessionization (latest batch id wins per session).

Scale/state design:
- Sessions are keyed by ``(user_id, session_start_s)`` — NOT an ordinal
  session number. Ordinals depend on how many sessions preceded, so state
  eviction would reset the counter and a re-appearing user would overwrite
  earlier rows in the sink. Start-epoch keys are stable under eviction.
- State is one fixed-size tuple per user (open session only); closed
  sessions leave the store the moment the gap passes — via event-time
  timeout (``GroupStateTimeout.EventTimeTimeout``): the watermark passing
  ``last_event + gap`` proves no in-order event can ever extend the session
  (a younger event would be late and dropped), so removal is safe AND
  consistent with what the sink already holds.
- Per-group work is vectorized (numpy diff/cumsum + pandas groupby), not a
  Python per-row loop — the group recurrence is sequential only in its
  carried scalars.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = ("user_id long, session_start_s long, "
                         "n_events long, duration_s long")
_STATE_SCHEMA = "start_s long, last_s long, n long"
# transformWithStateInPandas twin additionally tracks the armed timer so it
# can be deleted before re-arming (registerTimer adds, never replaces)
_TWS_STATE_SCHEMA = "start_s long, last_s long, n long, timer_ms long"


def _epoch_s(ts: pd.Series) -> np.ndarray:
    """floor(epoch(ts)) — matches unix_timestamp truncation in the batch
    plan and floor(epoch()) in the oracle."""
    return ts.values.astype("datetime64[ns]").astype("int64") // 1_000_000_000


def _segment_stats(seg: np.ndarray,
                   secs: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]:
    """Per-segment (start, size, max) over a sorted batch — pure numpy.

    ``seg`` is a non-decreasing segment id per event and ``secs`` the
    sorted epoch seconds, so every segment is one contiguous slice: its
    min is its first element, its max its last. Boundary detection + two
    fancy-index reads replace the pandas groupby->iterrows assembly the
    per-batch path used before — the 10× probe showed batches carrying
    hundreds of sessions per user, where the per-session Python loop was
    measurable interpreter time inside the hot stateful operator."""
    if len(seg) == 0:
        # Total on empty input: Spark never emits empty per-key batches
        # today, but the helper should not IndexError if a caller does.
        empty = np.empty(0, dtype="int64")
        return empty, empty.copy(), empty.copy()
    first = np.empty(len(seg), dtype=bool)
    first[0] = True
    np.not_equal(seg[1:], seg[:-1], out=first[1:])
    idx = np.flatnonzero(first)
    ends = np.empty_like(idx)
    ends[:-1] = idx[1:] - 1
    ends[-1] = len(seg) - 1
    return secs[idx].copy(), np.diff(np.append(idx, len(seg))), secs[ends].copy()


def _session_frame(user_id, starts: np.ndarray, sizes: np.ndarray,
                   maxs: np.ndarray) -> pd.DataFrame:
    """Assemble the operator's output batch columnar-ly (matches
    SESSION_OUTPUT_SCHEMA)."""
    return pd.DataFrame({
        "user_id": np.full(len(starts), user_id, dtype="int64"),
        "session_start_s": starts.astype("int64"),
        "n_events": sizes.astype("int64"),
        "duration_s": (maxs - starts).astype("int64"),
    })


def stateful_sessionize(events: DataFrame, gap_s: int = 1800,
                        user_col: str = "user_id",
                        ts_col: str = "ts") -> DataFrame:
    """Streaming sessionization over a watermarked event stream: one output
    row per (user, session) with its running totals; feed through the
    upsert sink for exact batch parity.
    """

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session can never
            # grow again and its totals are already in the sink
            state.remove()
            return
        user_id = key[0]
        start_s, last_s, n = state.get if state.exists else (None, None, 0)

        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values([ts_col, "event_id"], kind="mergesort")
        secs = _epoch_s(pdf[ts_col])

        prev = np.empty_like(secs)
        prev[0] = last_s if last_s is not None else np.iinfo("int64").min // 2
        prev[1:] = secs[:-1]
        if last_s is not None:
            # valid out-of-order arrivals (above the watermark, below the
            # carried last_s) interleave with history: an event's GLOBAL
            # predecessor is max(previous batch event, carried last_s) —
            # without the clamp, an old-but-valid event resets the gap
            # base and the next in-order event falsely opens a new session
            np.maximum(prev, last_s, out=prev)
        new_flag = (secs - prev) > gap_s
        seg = np.cumsum(new_flag)          # 0 = continuation of carried session

        starts, sizes, maxs = _segment_stats(seg, secs)
        if seg[0] == 0:                    # extends the carried open session
            sizes[0] += n
            starts[0] = start_s
            # max(): a valid out-of-order event (above the watermark but
            # below the carried last_s) falls INSIDE the open session —
            # taking the batch max alone would regress last_s, emit a
            # shrunken duration, and re-arm the eviction timer early
            # enough to split the session
            maxs[0] = max(maxs[0], last_s)
        start_s, last_s, n = int(starts[-1]), int(maxs[-1]), int(sizes[-1])

        state.update((start_s, last_s, n))
        # expire the open session the moment the watermark proves it closed
        timeout_ms = (last_s + gap_s + 1) * 1000
        state.setTimeoutTimestamp(max(timeout_ms,
                                      state.getCurrentWatermarkMs() + 1))
        yield _session_frame(user_id, starts, sizes, maxs)

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))


def make_session_processor(gap_s: int = 1800, user_col: str = "user_id",
                           ts_col: str = "ts"):
    """Build the ``StatefulProcessor`` class behind
    :func:`stateful_sessionize_tws`. Exposed at module level (rather than a
    closure inside the plan builder) so the timer/state protocol is
    unit-testable against a fake handle — executing the real operator needs
    google.protobuf, but the eviction correctness argument doesn't.
    """
    from pyspark.sql.streaming import StatefulProcessor

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            # The 4th field records which timer is currently armed so a
            # later batch can delete it before re-arming: without that, a
            # stale timer from an earlier batch would fire while the
            # session is still open (extended by newer events) and split
            # one session in two — applyInPandasWithState avoids this by
            # construction because setTimeoutTimestamp overwrites.
            self._open = handle.getValueState("open_session",
                                              _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            user_id = key[0]
            if self._open.exists():
                start_s, last_s, n, armed_ms = self._open.get()
            else:
                start_s, last_s, n, armed_ms = None, None, 0, 0

            chunks = [c for c in rows if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, "event_id"], kind="mergesort")
            secs = _epoch_s(pdf[ts_col])

            prev = np.empty_like(secs)
            prev[0] = last_s if last_s is not None else np.iinfo("int64").min // 2
            prev[1:] = secs[:-1]
            if last_s is not None:
                # clamp to the carried last_s — see stateful_sessionize
                np.maximum(prev, last_s, out=prev)
            seg = np.cumsum((secs - prev) > gap_s)

            starts, sizes, maxs = _segment_stats(seg, secs)
            if seg[0] == 0:
                sizes[0] += n
                starts[0] = start_s
                # max(): see stateful_sessionize — an out-of-order event
                # inside the open session must not regress last_s
                maxs[0] = max(maxs[0], last_s)
            start_s, last_s, n = int(starts[-1]), int(maxs[-1]), int(sizes[-1])

            # evict when the watermark proves the session closed; delete the
            # previously armed timer first — registerTimer ADDS a timer
            # rather than replacing, and a stale one firing mid-session
            # would clear live state
            timeout_ms = max((last_s + gap_s + 1) * 1000,
                             timer_values.getCurrentWatermarkInMs() + 1)
            if armed_ms and armed_ms != timeout_ms:
                self._handle.deleteTimer(armed_ms)
            self._handle.registerTimer(timeout_ms)
            self._open.update((start_s, last_s, n, int(timeout_ms)))
            yield _session_frame(user_id, starts, sizes, maxs)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            # Only the currently armed timer may evict: a stale timer
            # (deleteTimer raced the firing, or pre-fix checkpoint state)
            # must be ignored while the open session has been extended past
            # its expiry.
            if self._open.exists():
                *_, armed_ms = self._open.get()
                if expired_timer_info.getExpiryTimeInMs() >= armed_ms:
                    self._open.clear()
            return iter(())

        def close(self) -> None:
            pass

    return _SessionProcessor


def stateful_sessionize_tws(events: DataFrame, gap_s: int = 1800,
                            user_col: str = "user_id",
                            ts_col: str = "ts") -> DataFrame:
    """The same sessionization on ``transformWithStateInPandas`` — Spark 4's
    successor to applyInPandasWithState: typed named state variables on a
    processor handle, explicit event-time timers, and composable
    value/list/map state instead of one state tuple. Output and state
    semantics are identical to :func:`stateful_sessionize` (same sink
    contract, same eviction proof), so both implementations are checked
    against the same oracle.
    """
    proc = make_session_processor(gap_s, user_col, ts_col)
    return (events.groupBy(user_col).transformWithStateInPandas(
        proc(), outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="update", timeMode="eventTime"))
