"""BENCH_full.json artifact merging: partial runs fold into the committed
record, full runs replace what they produced — and EITHER way, top-level
sections the run did not produce survive (r8 lost the manually-recorded
``heavy_scaling_30x`` because a refresh rewrote the artifact from the run's
own output alone)."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)


PREV = {
    "metric": "total_query_wall_sec",
    "value": 3.0,
    "queries": {"a": 1.0, "b": 2.0},
    "queries_median3": {"a": 0.8, "b": 1.6},
    "value_median3": 2.4,
    "heavy_scaling": {"factor": 10, "median_exponent": 0.35},
    "heavy_scaling_30x": {"factor": 30, "median_exponent": 0.38},
    "cdc_pipeline": {"events_per_sec": 2000},
}


def test_partial_merge_preserves_unknown_top_level_keys():
    out = {"queries": {"b": 1.5}, "queries_median3": {"b": 1.2}}
    merged = bench.merge_artifact(PREV, out, partial=True)
    assert merged["queries"] == {"a": 1.0, "b": 1.5}
    assert merged["value"] == 2.5
    assert merged["queries_median3"] == {"a": 0.8, "b": 1.2}
    assert merged["value_median3"] == 2.0
    assert merged["heavy_scaling_30x"]["median_exponent"] == 0.38
    assert merged["heavy_scaling"]["median_exponent"] == 0.35
    assert merged["cdc_pipeline"] == {"events_per_sec": 2000}


def test_full_run_preserves_unknown_top_level_keys():
    out = {
        "metric": "total_query_wall_sec",
        "value": 2.2,
        "queries": {"a": 1.0, "b": 1.2},
        "heavy_scaling": {"factor": 10, "median_exponent": 0.4},
        "cdc_pipeline": {"events_per_sec": 2100},
    }
    merged = bench.merge_artifact(PREV, out, partial=False)
    assert merged["queries"] == out["queries"]  # replaced, not unioned
    assert merged["heavy_scaling"]["median_exponent"] == 0.4
    # the deep-run section the full 10x run did not produce SURVIVES
    assert merged["heavy_scaling_30x"]["median_exponent"] == 0.38


def test_manual_30x_run_lands_in_its_own_key_and_keeps_10x():
    out = {"queries": {}, "heavy_scaling_30x": {"factor": 30,
                                                "median_exponent": 0.41}}
    merged = bench.merge_artifact(PREV, out, partial=True)
    assert merged["heavy_scaling_30x"]["median_exponent"] == 0.41
    assert merged["heavy_scaling"]["median_exponent"] == 0.35


def test_partial_rerun_clears_stale_error_for_fixed_query():
    prev = dict(PREV, errors={"b": "ValueError: boom", "c": "old"})
    out = {"queries": {"b": 1.5}}
    merged = bench.merge_artifact(prev, out, partial=True)
    assert merged["errors"] == {"c": "old"}
    out2 = {"queries": {}, "errors": {"d": "new"}}
    merged2 = bench.merge_artifact(merged, out2, partial=True)
    assert merged2["errors"] == {"c": "old", "d": "new"}


def test_clean_full_run_clears_old_errors():
    prev = dict(PREV, errors={"b": "ValueError: boom"})
    out = {"queries": {"a": 1.0, "b": 1.2}, "value": 2.2}
    merged = bench.merge_artifact(prev, out, partial=False)
    assert "errors" not in merged


def test_empty_prev_full_run_is_identity():
    out = {"queries": {"a": 1.0}, "value": 1.0}
    assert bench.merge_artifact({}, out, partial=False) == out
    assert bench.merge_artifact({}, out, partial=True) == out


def test_merge_artifact_never_mutates_prev():
    prev = {"queries": {"a": 1.0}, "queries_median3": {"a": 0.9},
            "value": 1.0, "value_median3": 0.9}
    snapshot = {"queries": dict(prev["queries"]),
                "queries_median3": dict(prev["queries_median3"])}
    bench.merge_artifact(prev, {"queries": {"b": 2.0},
                                "queries_median3": {"b": 1.8}}, partial=True)
    assert prev["queries"] == snapshot["queries"]
    assert prev["queries_median3"] == snapshot["queries_median3"]


def test_full_run_without_median3_clears_stale_median_sections():
    prev = dict(PREV)
    out = {"queries": {"a": 1.0}, "value": 1.0}  # BENCH_MEDIAN3=0 run
    merged = bench.merge_artifact(prev, out, partial=False)
    assert "queries_median3" not in merged and "value_median3" not in merged
    # ... but the unknown sections still survive
    assert merged["heavy_scaling_30x"]["median_exponent"] == 0.38


# ---- outlier re-run guard (r9 verdict ask #6) -------------------------------


def test_outlier_guard_triggers_on_injected_noise():
    """A med3 >=2x its committed artifact value re-measures once and keeps
    the min — the injected-noise scenario from the r9 verdict."""
    prev = {"queries_median3": {"left_join": 0.50, "quiet": 1.0}}
    median3 = {"left_join": 2.18, "quiet": 1.05}
    calls = []

    def sample_fn(name):
        calls.append(name)
        return [0.52, 0.49, 0.51]  # clean fresh loop

    reruns = bench.rerun_outliers(prev, median3, sample_fn)
    assert calls == ["left_join"], "only the outlier re-measures"
    assert median3["left_join"] == 0.51  # min(2.18, median(fresh))
    assert median3["quiet"] == 1.05  # untouched
    assert reruns == {
        "left_join": {
            "prev_artifact": 0.50,
            "first_median3": 2.18,
            "remeasured": 0.51,
            "kept": "cleared-as-noise",
        }
    }


def test_outlier_guard_keeps_real_regressions():
    """If the re-measure CONFIRMS the slowdown, the new number stands —
    the guard filters noise, it must not hide a real regression."""
    prev = {"queries_median3": {"q": 1.0}}
    median3 = {"q": 3.0}
    reruns = bench.rerun_outliers(prev, median3, lambda n: [3.1, 2.9, 3.0])
    assert median3["q"] == 3.0
    assert reruns["q"]["remeasured"] == 3.0
    assert reruns["q"]["kept"] == "confirmed-regression"


def test_pipeline_lane_guard_reruns_slow_lane_and_keeps_faster():
    """A lane whose higher-is-better rate fell >=1.5x below the committed
    artifact re-runs once and keeps the faster result (r11 verdict #2)."""
    prev = {"cdc_pipeline": {"scd2_events_per_sec_warm": 3000.0}}
    first = {"scd2_events_per_sec_warm": 1500.0, "n_tx": 10}
    fresh = {"scd2_events_per_sec_warm": 2900.0, "n_tx": 10}
    kept = bench.rerun_pipeline_if_slow(
        prev, "cdc_pipeline", "scd2_events_per_sec_warm", first, lambda: fresh
    )
    assert kept["scd2_events_per_sec_warm"] == 2900.0
    assert kept["outlier_rerun"]["kept"] == "cleared-as-noise"
    assert kept["outlier_rerun"]["prev_artifact"] == 3000.0


def test_pipeline_lane_guard_confirms_real_regression():
    prev = {"replication_pipeline": {"rows_per_sec": 9000.0}}
    first = {"rows_per_sec": 4000.0}
    calls = []

    def lane():
        calls.append(1)
        return {"rows_per_sec": 4100.0}

    kept = bench.rerun_pipeline_if_slow(
        prev, "replication_pipeline", "rows_per_sec", first, lane
    )
    assert calls == [1]
    assert kept["rows_per_sec"] == 4100.0
    assert kept["outlier_rerun"]["kept"] == "confirmed-regression"


def test_pipeline_lane_guard_noops_when_healthy_or_unbaselined():
    healthy = {"rows_per_sec": 8800.0}
    out = bench.rerun_pipeline_if_slow(
        {"replication_pipeline": {"rows_per_sec": 9000.0}},
        "replication_pipeline", "rows_per_sec", healthy, lambda: 1 / 0,
    )
    assert out is healthy and "outlier_rerun" not in out
    out = bench.rerun_pipeline_if_slow(
        {}, "replication_pipeline", "rows_per_sec", healthy, lambda: 1 / 0
    )
    assert out is healthy


def test_outlier_guard_noops_without_prior_artifact():
    median3 = {"q": 5.0}
    assert bench.rerun_outliers({}, median3, lambda n: 1 / 0) == {}
    assert median3 == {"q": 5.0}


def test_full_run_without_reruns_clears_stale_section():
    prev = {"queries": {"a": 1.0}, "outlier_reruns": {"a": {"prev_artifact": 1}}}
    out = {"queries": {"a": 0.9}, "value": 0.9}
    merged = bench.merge_artifact(prev, out, partial=False)
    assert "outlier_reruns" not in merged


def test_partial_run_merges_outlier_reruns_per_query():
    """r10 advisor: a partial run is authoritative per TIMED query only —
    a clean re-time clears that query's stale rerun entry, a triggered
    rerun replaces it, and untouched queries keep theirs."""
    prev = {
        "queries": {"a": 1.0, "b": 2.0, "c": 3.0},
        "outlier_reruns": {
            "a": {"prev_artifact": 0.5, "first_median3": 1.2, "remeasured": 1.0},
            "c": {"prev_artifact": 1.5, "first_median3": 3.2, "remeasured": 3.0},
        },
    }
    # partial run re-times a (cleanly: no rerun) and b (rerun triggered)
    out = {
        "queries": {"a": 0.9, "b": 2.1},
        "outlier_reruns": {
            "b": {"prev_artifact": 1.0, "first_median3": 2.5, "remeasured": 2.1}
        },
    }
    merged = bench.merge_artifact(prev, out, partial=True)
    assert set(merged["outlier_reruns"]) == {"b", "c"}, (
        "a's stale entry cleared by its clean re-time; b's fresh entry"
        " lands; c untouched keeps its entry"
    )
    assert merged["outlier_reruns"]["b"]["remeasured"] == 2.1


def test_partial_clean_run_can_clear_last_rerun_entry():
    prev = {
        "queries": {"a": 1.0},
        "outlier_reruns": {"a": {"prev_artifact": 0.5}},
    }
    merged = bench.merge_artifact(prev, {"queries": {"a": 0.9}}, partial=True)
    assert "outlier_reruns" not in merged
