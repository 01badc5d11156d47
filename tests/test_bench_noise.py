"""Unit pins for bench.py's round-over-round noise verdict (round 11).

No Spark: the parser and verdict logic are pure functions over the
driver's BENCH_r*.json artifact shape. Pins the artifact-discovery rules
(newest round wins, SF must match, compact line found amid tail noise)
and every verdict branch (ok / regr / impr / new) including the
tolerance composition (both spreads + max(0.15, 20%·prev) slack).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _noise_verdicts, _prev_round_compact


def _artifact(sf, q, calib=0.285):
    compact = json.dumps(
        {
            "q_cols": ["cold", "warm", "spread", "normalized"],
            "q": q,
            "metric": "headline_queries_total_wall_clock",
            "sf": sf,
            "calib_spark_sec": calib,
            "calib_ref": 0.285,
        },
        separators=(",", ":"),
    )
    return {
        "n": 1,
        "sf": sf,
        "tail": "WARN noisy spark line\n{broken json\n" + compact + "\n",
    }


def test_prev_round_compact_picks_newest_matching_sf(tmp_path):
    old = _artifact(0.1, {"q1": [1.0, 0.9, 0.1, 1.0]})
    new = _artifact(0.1, {"q1": [2.0, 1.8, 0.2, 2.0]})
    other_sf = _artifact(0.01, {"q1": [9.0, 9.0, 9.0, 9.0]})
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(old))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(new))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(other_sf))
    obj, name = _prev_round_compact(str(tmp_path), 0.1)
    assert name == "BENCH_r02.json"  # newest artifact at the SAME SF
    assert obj["q"]["q1"][3] == 2.0


def test_prev_round_compact_none_when_no_match(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(_artifact(0.01, {})))
    obj, name = _prev_round_compact(str(tmp_path), 0.1)
    assert obj is None and name is None


def test_noise_verdict_branches():
    prev = _artifact(0.1, {
        "steady": [2.0, 1.8, 0.1, 2.0],
        "shrunk": [4.0, 3.5, 0.1, 4.0],
        "blown": [1.0, 0.9, 0.1, 1.0],
    })
    prev_obj = json.loads(prev["tail"].strip().splitlines()[-1])
    timings = {"steady": 2.1, "shrunk": 1.0, "blown": 3.0, "fresh": 0.5}
    spread = {n: 0.1 for n in timings}
    v = _noise_verdicts(prev_obj, timings, spread, scale=1.0)
    # steady: delta 0.1 <= 0.1 + 0.1 + max(0.15, 0.4) -> ok
    assert v["steady"] == "ok"
    # shrunk: delta -3.0, tol = 0.2 + max(0.15, 0.8) = 1.0 -> improved
    assert v["shrunk"] == "impr"
    # blown: delta +2.0, tol = 0.2 + max(0.15, 0.2) = 0.4 -> regressed
    assert v["blown"] == "regr"
    assert v["fresh"] == "new"


def test_noise_verdict_normalizes_prev_spread_by_prev_calib():
    # previous round ran on a 2x-slow host (calib 0.57): its RAW spread
    # halves after normalization, so a delta just past the naive sum
    # still flags
    prev = _artifact(0.1, {"x": [2.0, 1.8, 1.0, 1.0]}, calib=0.57)
    prev_obj = json.loads(prev["tail"].strip().splitlines()[-1])
    # this run: normalized value 1.8 vs prev 1.0 -> delta 0.8;
    # tol = 0.1 + 1.0*0.5 + max(0.15, 0.2) = 0.8 -> boundary ok
    v = _noise_verdicts(prev_obj, {"x": 1.8}, {"x": 0.1}, scale=1.0)
    assert v["x"] == "ok"
    v = _noise_verdicts(prev_obj, {"x": 1.85}, {"x": 0.1}, scale=1.0)
    assert v["x"] == "regr"


def test_all_new_when_no_prev():
    assert _noise_verdicts(None, {"a": 1.0}, {"a": 0.0}, 1.0) == {"a": "new"}


def test_prev_round_compact_sorts_rounds_numerically(tmp_path):
    """Round-12 (ADVICE r11): artifact recency is the ROUND NUMBER, not
    the filename string — 'BENCH_r100.json' must beat 'BENCH_r99.json'
    even though it sorts lower lexicographically, and an unpadded
    'BENCH_r9.json' must lose to both."""
    (tmp_path / "BENCH_r9.json").write_text(
        json.dumps(_artifact(0.1, {"q1": [9.0, 9.0, 0.1, 9.0]}))
    )
    (tmp_path / "BENCH_r99.json").write_text(
        json.dumps(_artifact(0.1, {"q1": [2.0, 1.8, 0.1, 2.0]}))
    )
    (tmp_path / "BENCH_r100.json").write_text(
        json.dumps(_artifact(0.1, {"q1": [1.0, 0.9, 0.1, 1.0]}))
    )
    obj, name = _prev_round_compact(str(tmp_path), 0.1)
    assert name == "BENCH_r100.json"
    assert obj["q"]["q1"][3] == 1.0
