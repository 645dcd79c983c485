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
- State is the list of UNSEALED session summaries per user ((start, last,
  n) each — usually one): an in-watermark event may arrive older than the
  open session's start and extend it backward, bridge two summaries, or
  open an earlier one; summaries are contiguous runs, so their aggregates
  merge exactly, which keeps the operator batch-exact under arbitrary
  disorder within the watermark. A summary is sealed (dropped from state)
  once the watermark passes ``last + gap`` — no valid event can ever
  extend it again — and whole-user state evicts via event-time timeout at
  the LAST summary's horizon. Key migration (a session's start moving)
  retires the old sink key with a TOMBSTONE_N row; resolve the upsert log
  with ``filter("n_events >= 0")``.
- Per-group work is vectorized (numpy diff/cumsum + pandas groupby), not a
  Python per-row loop — the group recurrence is sequential only in its
  carried scalars.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = ("user_id long, session_start_s long, "
                         "n_events long, duration_s long")
# State carries EVERY unsealed session summary (sorted by start), not just
# the latest: an event may arrive older than the open session's start (but
# above the watermark) and either extend it backward or revive/bridge an
# earlier session — summaries, being contiguous runs, merge exactly from
# their (start, last, n) aggregates alone, which is what makes this
# formulation batch-exact under ARBITRARY disorder within the watermark
# with state still bounded (sessions whose last+gap the watermark passed
# are sealed and dropped).
_STATE_SCHEMA = "starts array<long>, lasts array<long>, ns array<long>"
# transformWithStateInPandas twin additionally tracks the armed timer so it
# can be deleted before re-arming (registerTimer adds, never replaces)
_TWS_STATE_SCHEMA = ("starts array<long>, lasts array<long>, "
                     "ns array<long>, timer_ms long")

#: ``n_events`` value of a tombstone row: when a session's start epoch
#: moves (backward extension / merge), the old (user, start) sink key is
#: retired by emitting this marker — resolve with
#: ``read_upsert_result(...).filter("n_events >= 0")``.
TOMBSTONE_N = -1


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


def _advance_sessions(carried, pdf: pd.DataFrame, ts_col: str, id_col: str,
                      gap_s: int, wm_ms: int):
    """The shared per-batch session recurrence: segment the batch
    (vectorized), merge-sweep the segment summaries into the carried
    unsealed summaries (both sorted by start; a summary is a contiguous
    run, so its (start, last, n) aggregates merge exactly), then split
    the result into sealed (watermark passed last+gap — final, droppable)
    and unsealed parts. Returns
    ``(all_summaries, tombstoned_starts, unsealed, timer_ms)`` where
    ``all_summaries``/``unsealed`` are lists of [start, last, n] and
    ``timer_ms`` is None when nothing remains unsealed."""
    pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
    secs = _epoch_s(pdf[ts_col])
    prev = np.empty_like(secs)
    prev[0] = np.iinfo("int64").min // 2
    prev[1:] = secs[:-1]
    seg = np.cumsum((secs - prev) > gap_s)
    b_starts, b_sizes, b_maxs = _segment_stats(seg, secs)

    items = sorted(
        [[int(s), int(l), int(n)] for s, l, n in zip(*carried)]
        + [[int(s), int(l), int(n)]
           for s, n, l in zip(b_starts, b_sizes, b_maxs)])
    merged: list[list[int]] = []
    for s, l, n in items:
        if merged and s - merged[-1][1] <= gap_s:
            merged[-1][1] = max(merged[-1][1], l)
            merged[-1][2] += n
        else:
            merged.append([s, l, n])

    dead = set(int(s) for s in carried[0]) - {s for s, _, _ in merged}
    unsealed = [x for x in merged if (x[1] + gap_s + 1) * 1000 > wm_ms]
    timer_ms = (max(x[1] for x in unsealed) + gap_s + 1) * 1000 \
        if unsealed else None
    return merged, sorted(dead), unsealed, timer_ms


def stateful_sessionize(events: DataFrame, gap_s: int = 1800,
                        user_col: str = "user_id",
                        ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Streaming sessionization over a watermarked event stream: one output
    row per (user, session) with its running totals; feed through the
    upsert sink and filter ``n_events >= 0`` (tombstones — see
    :data:`TOMBSTONE_N`) for exact batch parity under arbitrary disorder
    within the watermark, including events OLDER than every open
    session's start (they extend a summary backward or bridge two — the
    old start's sink key is then retired by a tombstone).

    Rows with a NULL user or NULL timestamp are dropped up front:
    sessionization is keyed event-time analytics — an unkeyed or untimed
    event can belong to no session, and inside the state operator a NULL
    key would poison the micro-batch (crash-replay loop) rather than
    error cleanly. ``id_col`` breaks sort ties deterministically.
    """
    events = events.filter(F.col(user_col).isNotNull()
                           & F.col(ts_col).isNotNull())

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # the timer sits at max(last)+gap: the watermark has passed
            # every unsealed summary's extension horizon — all final,
            # all already in the sink
            state.remove()
            return
        user_id = key[0]
        carried = state.get if state.exists else ([], [], [])

        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        merged, dead, unsealed, timer_ms = _advance_sessions(
            carried, pdf, ts_col, id_col, gap_s,
            state.getCurrentWatermarkMs())

        if unsealed:
            state.update(([x[0] for x in unsealed],
                          [x[1] for x in unsealed],
                          [x[2] for x in unsealed]))
            state.setTimeoutTimestamp(
                max(timer_ms, state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()

        out = _session_frame(
            user_id,
            np.array([x[0] for x in merged], dtype="int64"),
            np.array([x[2] for x in merged], dtype="int64"),
            np.array([x[1] for x in merged], dtype="int64"))
        if dead:
            out = pd.concat([out, pd.DataFrame({
                "user_id": np.full(len(dead), user_id, dtype="int64"),
                "session_start_s": np.array(dead, dtype="int64"),
                "n_events": np.full(len(dead), TOMBSTONE_N, dtype="int64"),
                "duration_s": np.full(len(dead), TOMBSTONE_N,
                                      dtype="int64"),
            })], ignore_index=True)
        yield out

    return (events.groupBy(user_col).applyInPandasWithState(
        fn, outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA, outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout))


def make_session_processor(gap_s: int = 1800, ts_col: str = "ts",
                           id_col: str = "event_id"):
    """Build the ``StatefulProcessor`` class behind
    :func:`stateful_sessionize_tws`. Exposed at module level (rather than a
    closure inside the plan builder) so the timer/state protocol is
    unit-testable against a fake handle — executing the real operator needs
    google.protobuf, but the eviction correctness argument doesn't.
    (``user_col`` is consumed by the plan builder's groupBy, not the
    processor; it is not a parameter here.)
    """
    from pyspark.sql.streaming import StatefulProcessor

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            # The timer_ms field records which timer is currently armed so
            # a later batch can delete it before re-arming: without that, a
            # stale timer from an earlier batch would fire while sessions
            # are still open (extended by newer events) and clear live
            # state — applyInPandasWithState avoids this by construction
            # because setTimeoutTimestamp overwrites.
            self._open = handle.getValueState("open_session",
                                              _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            user_id = key[0]
            if self._open.exists():
                starts, lasts, ns, armed_ms = self._open.get()
                carried = (starts, lasts, ns)
            else:
                carried, armed_ms = ([], [], []), 0

            chunks = [c for c in rows if len(c)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            merged, dead, unsealed, timer_ms = _advance_sessions(
                carried, pdf, ts_col, id_col, gap_s,
                timer_values.getCurrentWatermarkInMs())

            if unsealed:
                timeout_ms = max(timer_ms,
                                 timer_values.getCurrentWatermarkInMs() + 1)
                if armed_ms and armed_ms != timeout_ms:
                    self._handle.deleteTimer(armed_ms)
                self._handle.registerTimer(timeout_ms)
                self._open.update(([x[0] for x in unsealed],
                                   [x[1] for x in unsealed],
                                   [x[2] for x in unsealed],
                                   int(timeout_ms)))
            else:
                if armed_ms:
                    self._handle.deleteTimer(armed_ms)
                self._open.clear()

            out = _session_frame(
                user_id,
                np.array([x[0] for x in merged], dtype="int64"),
                np.array([x[2] for x in merged], dtype="int64"),
                np.array([x[1] for x in merged], dtype="int64"))
            if dead:
                out = pd.concat([out, pd.DataFrame({
                    "user_id": np.full(len(dead), user_id, dtype="int64"),
                    "session_start_s": np.array(dead, dtype="int64"),
                    "n_events": np.full(len(dead), TOMBSTONE_N,
                                        dtype="int64"),
                    "duration_s": np.full(len(dead), TOMBSTONE_N,
                                          dtype="int64"),
                })], ignore_index=True)
            yield out

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
                            ts_col: str = "ts",
                            id_col: str = "event_id") -> DataFrame:
    """The same sessionization on ``transformWithStateInPandas`` — Spark 4's
    successor to applyInPandasWithState: typed named state variables on a
    processor handle, explicit event-time timers, and composable
    value/list/map state instead of one state tuple. Output and state
    semantics are identical to :func:`stateful_sessionize` (same sink
    contract incl. tombstones, same eviction proof, same NULL-row drop),
    so both implementations are checked against the same oracle.
    """
    events = events.filter(F.col(user_col).isNotNull()
                           & F.col(ts_col).isNotNull())
    proc = make_session_processor(gap_s, ts_col, id_col)
    return (events.groupBy(user_col).transformWithStateInPandas(
        proc(), outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="update", timeMode="eventTime"))
