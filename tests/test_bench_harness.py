"""Bench-harness unit tests — no SparkSession needed.

The bench record is the performance artifact of record, so its
calibration and contention-attribution logic get the same test rigor
as operators: a polluted history (one contended sweep) must not drag
the medians (round-10 verdict item 5), and the /proc/stat bracket math
must read steal correctly.
"""

import json

import bench


def _rec(t, q1, q6, agg, sf="0.1", drift=None):
    rec = {
        "t": t,
        "sf": sf,
        "start": {"tpch_q1": q1, "tpch_q6": q6, "agg_basic": agg},
        "end": {"tpch_q1": q1, "tpch_q6": q6, "agg_basic": agg},
    }
    if drift is not None:
        rec["drift"] = drift
    return rec


class TestLoadCalibration:
    def _write(self, tmp_path, records):
        p = tmp_path / "hist.jsonl"
        with open(p, "w") as fh:
            for r in records:
                fh.write(json.dumps(r) + "\n")
        return str(p)

    def test_polluted_run_excluded_from_medians(self, tmp_path):
        """A drift>2 sweep (the round-10 contamination shape) is dropped;
        the medians come from the quiet runs only."""
        quiet = [_rec(i, 1.0, 0.3, 0.3, drift=1.0) for i in range(5)]
        polluted = [_rec(9, 5.0, 1.5, 1.5, drift=2.6)]
        path = self._write(tmp_path, quiet + polluted)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "history(n=5)"
        assert cal == {"tpch_q1": 1.0, "tpch_q6": 0.3, "agg_basic": 0.3}

    def test_boundary_drift_kept(self, tmp_path):
        """Exactly HISTORY_MAX_DRIFT stays in (exclusion is strict >)."""
        recs = [_rec(i, 1.0, 0.3, 0.3, drift=bench.HISTORY_MAX_DRIFT)
                for i in range(4)]
        path = self._write(tmp_path, recs)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "history(n=4)"

    def test_legacy_records_without_drift_still_count(self, tmp_path):
        recs = [_rec(i, 1.2, 0.32, 0.31) for i in range(4)]
        path = self._write(tmp_path, recs)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "history(n=4)"
        assert cal["tpch_q1"] == 1.2

    def test_falls_back_to_pins_when_all_polluted(self, tmp_path):
        recs = [_rec(i, 5.0, 1.5, 1.5, drift=3.0) for i in range(6)]
        path = self._write(tmp_path, recs)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "pinned"
        assert cal == bench.YARDSTICK_CAL

    def test_sf_keying_unchanged(self, tmp_path):
        """sf0.01 sanity runs never leak into the sf0.1 medians."""
        recs = [_rec(i, 0.1, 0.03, 0.03, sf="0.01", drift=1.0)
                for i in range(6)]
        recs += [_rec(10 + i, 1.0, 0.3, 0.3, drift=1.0) for i in range(3)]
        path = self._write(tmp_path, recs)
        cal, source = bench.load_calibration("0.1", path=path)
        assert cal["tpch_q1"] == 1.0

    def test_legacy_contended_records_dropped_as_outliers(self, tmp_path):
        """Pre-round-11 records carry no drift field; ones whose own
        samples sit far above the window median are contention, not
        box speed — the two-pass estimate drops them."""
        quiet = [_rec(i, 1.0, 0.3, 0.3) for i in range(6)]
        contended = [_rec(10, 5.7, 2.2, 1.6), _rec(11, 3.4, 1.9, 1.2)]
        path = self._write(tmp_path, quiet + contended)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "history(n=6)"
        assert cal == {"tpch_q1": 1.0, "tpch_q6": 0.3, "agg_basic": 0.3}

    def test_outlier_pass_keeps_minimum_history(self, tmp_path):
        """If dropping outliers would leave < MIN_HISTORY runs, keep the
        raw window (median damping) rather than falling back to pins."""
        recs = [_rec(0, 1.0, 0.3, 0.3), _rec(1, 1.0, 0.3, 0.3),
                _rec(2, 9.0, 3.0, 3.0)]
        path = self._write(tmp_path, recs)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == "history(n=3)"
        assert cal["tpch_q1"] == 1.0  # median still damps the outlier

    def test_window_applies_after_pollution_filter(self, tmp_path):
        """Quiet runs older than the raw window still count when newer
        polluted runs are dropped — the window slides over CLEAN runs."""
        quiet = [_rec(i, 1.0, 0.3, 0.3, drift=1.0)
                 for i in range(bench.HISTORY_WINDOW + 2)]
        polluted = [_rec(100 + i, 9.0, 3.0, 3.0, drift=4.0)
                    for i in range(bench.HISTORY_WINDOW)]
        path = self._write(tmp_path, quiet + polluted)
        cal, source = bench.load_calibration("0.1", path=path)
        assert source == f"history(n={bench.HISTORY_WINDOW})"
        assert cal["tpch_q1"] == 1.0


class TestProcStatBracket:
    def test_env_delta_reads_steal_and_iowait(self):
        # user nice system idle iowait irq softirq steal
        before = (1000, 600, 10, 0)
        after = (2000, 1100, 40, 60)  # +1000 total: 500 idle, 30 iowait, 60 steal
        env = bench._env_delta(before, after)
        assert env["steal_pct"] == 6.0
        assert env["iowait_pct"] == 3.0
        assert env["busy_pct"] == 47.0

    def test_env_delta_degenerate_windows(self):
        assert bench._env_delta(None, (10, 1, 0, 0)) == {}
        assert bench._env_delta((10, 1, 0, 0), (10, 1, 0, 0)) == {}

    def test_proc_stat_live(self):
        snap = bench._proc_stat()
        assert snap is not None
        total, idle, iowait, steal = snap
        assert total >= idle + iowait + steal >= 0


class TestEnvelopeAndCreep:
    PINS = {
        "q_fast": {"sec": 1.0},
        "q_slow": {"sec": 1.0},
        "q_edge": {"sec": 1.0},
        "tpch_q6": {"sec": 0.232},
    }

    def test_over_envelope_flags_only_past_factor(self):
        timings = {"q_fast": 1.5, "q_slow": 2.7, "q_edge": 2.0,
                   "q_unpinned": 99.0}
        env = {"q_slow": {"steal_pct": 0.3, "local_drift": 1.1}}
        out = bench.compute_over_envelope(timings, self.PINS, env)
        assert set(out) == {"q_slow"}  # 2.0x exactly is inside
        assert out["q_slow"]["ratio"] == 2.7
        assert out["q_slow"]["pin"] == 1.0
        # the entry's own contention evidence rides along
        assert out["q_slow"]["steal_pct"] == 0.3

    def test_over_envelope_unpinned_entry_never_flags(self):
        out = bench.compute_over_envelope({"new_entry": 50.0}, self.PINS, {})
        assert out == {}

    def test_cal_creep_ratio_vs_round1_pin(self):
        cal = {"tpch_q6": 0.343, "agg_basic": 0.5}
        out = bench.compute_cal_creep(cal, self.PINS,
                                      yardsticks=("tpch_q6", "agg_basic"))
        assert out == {"tpch_q6": round(0.343 / 0.232, 3)}

    def test_load_pins_missing_file_is_empty(self, tmp_path):
        assert bench.load_pins(str(tmp_path)) == {}

    def test_load_pins_repo_file_covers_headline(self):
        pins = bench.load_pins()
        # every headline entry except the known-unpinned newcomer has a pin
        missing = [n for n in bench.HEADLINE
                   if n not in pins and n != "hypertable_rollup"]
        assert missing == ["dsir_select"] or missing == []
        assert "hypertable_rollup_cold" in pins

    def test_load_pins_malformed_file_is_empty(self, tmp_path):
        (tmp_path / "BASELINE_PINS.json").write_text('["not", "a", "dict"]')
        assert bench.load_pins(str(tmp_path)) == {}
        (tmp_path / "BASELINE_PINS.json").write_text('{"pins": 42}')
        assert bench.load_pins(str(tmp_path)) == {}

    def test_yardstick_round1_pins_immune_to_repin(self, tmp_path):
        # a later re-pin row must not move the creep denominator
        (tmp_path / "BASELINE_PINS.json").write_text(json.dumps({
            "pins": {"tpch_q6": {"sec": 0.4}},
            "yardstick_round1_pins": {"tpch_q6": {"sec": 0.232}},
        }))
        r1 = bench.load_yardstick_round1_pins(str(tmp_path))
        assert r1["tpch_q6"]["sec"] == 0.232
        out = bench.compute_cal_creep({"tpch_q6": 0.348}, r1,
                                      yardsticks=("tpch_q6",))
        assert out == {"tpch_q6": 1.5}

    def test_yardstick_round1_pins_fallback_for_old_files(self, tmp_path):
        (tmp_path / "BASELINE_PINS.json").write_text(json.dumps({
            "pins": {"tpch_q6": {"sec": 0.232}},
        }))
        r1 = bench.load_yardstick_round1_pins(str(tmp_path))
        assert r1["tpch_q6"]["sec"] == 0.232

    def test_repo_round1_yardsticks_present(self):
        r1 = bench.load_yardstick_round1_pins()
        assert set(bench.YARDSTICKS) <= set(r1)
        # round-1 values, not any later re-pin
        assert r1["tpch_q6"]["sec"] == 0.232
