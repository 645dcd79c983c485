"""Pins for the bench/baseline anti-ratchet policy (round-13 verdict #3).

The committed BASELINE.md is the denominator of every later round's
regression ratio, so the rules deciding which session numbers may enter
it are correctness-critical for the measurement loop itself:

- bench._drift_flagged: which rows get an isolated min-of-3 re-measure
  (the (ratio>1.3 AND delta>0.3s) OR ratio>1.5 rule — the pure-ratio arm
  closes the sub-second gap pack_greedy ratcheted through in r13);
- record_baseline._policy_queries: flagged rows record min(session,
  isolated); rows >1.5x their prior committed baseline WITHOUT isolated
  evidence carry the prior number forward;
- record_baseline._load: char-capped bench payloads (top-k "note") are
  rejected — only recording-quality runs may feed the baseline.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from bench import _drift_flagged, _emit_payload, _remeasure_set  # noqa: E402
from record_baseline import _load, _policy_queries  # noqa: E402


def _fake_session(n_queries=215, n_isolated=80):
    """A registry-sized fake session on an elevated box: every isolated
    row 1.4x over baseline (the r14 83-rows-flagged scenario)."""
    timings = {f"query_with_a_realistic_name_{i:03d}": round(9.0 - i * 0.04, 3)
               for i in range(n_queries)}
    names = sorted(timings)[:n_isolated]
    baseline = {n: round(timings[n] / 1.4, 3) for n in names}
    isolated = {n: round(timings[n] * 0.95, 3) for n in names}
    return timings, baseline, isolated


def test_payload_keeps_40_query_rows_under_heavy_drift():
    # round-14 failure mode: 80+ flagged rows crowded the queries dict to
    # ONE entry and PERF manufactured 59 phantom "dropped" queries. Pin
    # the fixed priority: iso rows are capped and shed FIRST; the driver
    # always sees >= 40 per-query rows.
    timings, baseline, isolated = _fake_session()
    payload = _emit_payload(timings, 300.0, "0.1", isolated, baseline,
                            {}, limit=1990, n_flagged=83)
    assert len(payload) <= 1990
    doc = json.loads(payload)
    assert len(doc["queries"]) >= 40
    assert len(doc.get("isolated_remeasure", {})) <= 5
    # the queries dict is the top-k by seconds
    assert doc["queries"] == dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:len(doc["queries"])])


def test_payload_sheds_iso_rows_before_query_floor():
    # a limit tight enough that 40 query rows + 5 iso rows cannot both
    # fit: the iso rows go first, the 40-row floor holds
    timings, baseline, isolated = _fake_session()
    payload = _emit_payload(timings, 300.0, "0.1", isolated, baseline,
                            {}, limit=1800, n_flagged=83)
    doc = json.loads(payload)
    assert len(payload) <= 1800
    assert len(doc["queries"]) >= 40
    assert len(doc.get("isolated_remeasure", {})) < 5


def test_payload_parses_even_below_floor():
    # pathological narrow window: the floor yields to parseability
    timings, baseline, isolated = _fake_session()
    payload = _emit_payload(timings, 300.0, "0.1", isolated, baseline,
                            {}, limit=300, n_flagged=83)
    doc = json.loads(payload)
    assert len(payload) <= 300 and doc["queries"]


def test_payload_uncapped_emits_everything():
    timings, baseline, isolated = _fake_session()
    doc = json.loads(_emit_payload(timings, 300.0, "0.1", isolated,
                                   baseline, {}, limit=0, n_flagged=83))
    assert len(doc["queries"]) == len(timings)
    assert len(doc["isolated_remeasure"]) == len(isolated)
    assert "note" not in doc


def test_remeasure_set_caps_by_largest_delta():
    timings = {"a": 10.0, "b": 5.0, "c": 2.0}
    baseline = {"a": 6.0, "b": 2.0, "c": 1.5}  # deltas 4.0, 3.0, 0.5
    assert _remeasure_set(["a", "b", "c"], timings, baseline, 2) == ["a", "b"]
    assert _remeasure_set(["a", "b", "c"], timings, baseline, -1) \
        == ["a", "b", "c"]
    assert sorted(_remeasure_set(["a", "b", "c"], timings, baseline, 9)) \
        == ["a", "b", "c"]


def test_drift_flag_big_row_needs_ratio_and_delta():
    base = {"q": 10.0}
    # 1.2x on a big row: delta huge but ratio under 1.3 -> not flagged
    assert _drift_flagged({"q": 12.0}, base) == []
    # 1.35x and delta 3.5s -> flagged by the conjunctive arm
    assert _drift_flagged({"q": 13.5}, base) == ["q"]


def test_drift_flag_sub_second_pure_ratio_arm():
    # the r13 hole: 0.42 -> 0.69 is 1.64x but delta 0.27 < 0.3 — the old
    # rule let it into the baseline un-flagged; the pure-ratio arm
    # catches it now
    assert _drift_flagged({"pack_greedy": 0.69}, {"pack_greedy": 0.42}) \
        == ["pack_greedy"]
    # 1.4x sub-second stays inside the documented +-50% noise band
    assert _drift_flagged({"q": 0.59}, {"q": 0.42}) == []


def test_drift_flag_no_baseline_row_never_flags():
    assert _drift_flagged({"new_query": 9.9}, {}) == []


def test_policy_isolated_min_wins():
    payload = {"queries": {"a": 4.0, "b": 1.0},
               "isolated_remeasure": {
                   "a": {"session": 4.0, "isolated": 3.1, "baseline": 3.0}}}
    q, corrected, carried = _policy_queries(payload)
    assert q == {"a": 3.1, "b": 1.0}
    assert corrected == ["a"] and carried == []


def test_policy_carry_forward_without_isolated_evidence():
    # a row >1.5x prior with NO isolated record (re-measure error path)
    # keeps the prior number; a flagged row with isolated evidence may
    # rise (evidence beats the prior)
    payload = {"queries": {"a": 0.69, "b": 6.0},
               "isolated_remeasure": {
                   "b": {"session": 6.0, "isolated": 5.8, "baseline": 3.5}}}
    prior = {"a": 0.42, "b": 3.5}
    q, corrected, carried = _policy_queries(payload, prior)
    assert q["a"] == 0.42 and carried == ["a"]
    assert q["b"] == 5.8 and corrected == ["b"]


def test_policy_carry_forward_threshold_is_1_5x():
    payload = {"queries": {"a": 0.6}}
    assert _policy_queries(payload, {"a": 0.42})[0]["a"] == 0.6  # 1.43x
    payload = {"queries": {"a": 0.64}}
    assert _policy_queries(payload, {"a": 0.42})[0]["a"] == 0.42  # 1.52x


def test_load_rejects_char_capped_payload(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({
        "queries": {"a": 1.0}, "sf": 0.1, "value": 1.0,
        "note": "queries = top 5 of 131 by sec; full set in BASELINE.md"}))
    with pytest.raises(AssertionError, match="recording-quality"):
        _load(str(p))
    p.write_text(json.dumps({"queries": {"a": 1.0}, "sf": 0.1,
                             "value": 1.0}))
    assert _load(str(p))["queries"] == {"a": 1.0}
