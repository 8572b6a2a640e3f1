"""bench.py round bookkeeping: detail-file naming and the prior-round
regression diff (must never diff against this round's own re-runs)."""

from __future__ import annotations

import json
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_this_round_is_newest_driver_file_plus_one(tmp_path):
    bench = _bench()
    assert bench._this_round(str(tmp_path)) == 1
    (tmp_path / "BENCH_r1.json").write_text("{}")
    (tmp_path / "BENCH_r4.json").write_text("{}")
    assert bench._this_round(str(tmp_path)) == 5


def test_prior_round_skips_own_round_and_prefers_detail(tmp_path):
    bench = _bench()
    (tmp_path / "BENCH_r1.json").write_text(json.dumps(
        {"parsed": {"queries": {"q": 1.0}}}
    ))
    (tmp_path / "BENCH_DETAIL_r2.json").write_text(json.dumps(
        {"queries": {"q": 2.0}, "calib_sec": 0.12}
    ))
    # this-round detail (an earlier re-run at another SF) must be ignored
    (tmp_path / "BENCH_DETAIL_r3.json").write_text(json.dumps(
        {"queries": {"q": 99.0}}
    ))
    n, timings, calib, _cpar, _cth = bench._prior_round_timings(
        str(tmp_path), this_round=3)
    assert n == 2 and timings == {"q": 2.0} and calib == 0.12
    # with no detail file, fall back to the driver's parsed tail
    (tmp_path / "BENCH_DETAIL_r2.json").unlink()
    n, timings, calib, _cpar, _cth = bench._prior_round_timings(
        str(tmp_path), this_round=3)
    assert n == 1 and timings == {"q": 1.0} and calib is None


def test_unparseable_files_are_skipped(tmp_path):
    bench = _bench()
    (tmp_path / "BENCH_r2.json").write_text("not json{")
    (tmp_path / "BENCH_r1.json").write_text(json.dumps(
        {"parsed": {"queries": {"q": 1.5}}}
    ))
    n, timings, _calib, _cpar, _cth = bench._prior_round_timings(
        str(tmp_path), this_round=3)
    assert n == 1 and timings == {"q": 1.5}


def test_calibration_is_fast_and_repeatable():
    bench = _bench()
    c1 = bench._calibrate()
    c2 = bench._calibrate()
    assert 0.001 < c1 < 10.0 and 0.001 < c2 < 10.0
    # same host, back to back: loose bound only — this test may share the
    # machine with a full Spark suite, and bench.py additionally clamps
    # the host_scale it derives from the calibration to 2x
    assert max(c1, c2) / min(c1, c2) < 10.0
