"""The bench measurement protocol's pure pieces (no Spark session).

Round 11 (VERDICT r10 #4): bench.py reports per-query MEDIANS across
gate-accepted measurement windows plus each query's cross-window spread,
so cross-round deltas read against the instrument's own error bar
instead of the retired ±15% prose band. These tests pin the merge
contract the driver's BENCH_r{N}.json and tools/bench_normalize.py
consume.
"""

import bench


def _window(attempt, qs, cal, cal_end):
    return {
        "bench_attempt": attempt,
        "value": round(sum(qs.values()), 3),
        "queries": dict(qs),
        "tpch_queries": {"q1": 1.0 + attempt / 100},
        "tpch_22_shapes_total_s": 1.0 + attempt / 100,
        "calibration_s": cal,
        "calibration_end_s": cal_end,
        "calibration_drift": round(abs(cal_end - cal) / cal, 4),
        "hfp_transform_rows_per_s": 1_000_000 + attempt,
        "hfp_transform_rows_per_s_band": [900_000 + attempt, 1_100_000 + attempt],
        "hfp_streaming_pipeline_rows_per_s": 800_000 + attempt,
        "hfp_streaming_rows_per_s_band": [700_000, 900_000],
        "timing": "min-of-5, inputs pre-warmed",
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "sf": 0.1,
    }


def test_merge_windows_medians_and_spread():
    """Top-level numbers are per-query medians with (max-min)/median
    spreads; totals re-sum the medians; throughput medians int; bands
    envelope; per-window detail rides under 'windows'."""
    ws = [
        _window(1, {"qa": 1.0, "qb": 2.0}, 0.75, 0.76),
        _window(2, {"qa": 1.2, "qb": 1.8}, 0.74, 0.75),
        _window(3, {"qa": 1.1, "qb": 2.4}, 0.76, 0.77),
    ]
    m = bench.merge_windows(ws)
    assert m["queries"] == {"qa": 1.1, "qb": 2.0}
    assert m["value"] == 3.1
    assert m["queries_spread"]["qa"] == round(0.2 / 1.1, 3)
    assert m["queries_spread"]["qb"] == round(0.6 / 2.0, 3)
    assert m["tpch_queries"] == {"q1": 1.02}
    assert m["tpch_22_shapes_total_s"] == 1.02
    assert m["window_count"] == 3 and len(m["windows"]) == 3
    assert m["calibration_s"] == 0.75
    assert m["hfp_transform_rows_per_s"] == 1_000_002
    assert m["hfp_transform_rows_per_s_band"] == [900_001, 1_100_003]
    assert m["timing"].startswith("median-of-3 gated windows; per-window")
    # the compact stdout line drops the window detail but keeps the keys
    # bench_normalize.py needs at top level
    for k in ("calibration_s", "calibration_end_s", "queries"):
        assert k in m


def test_merge_windows_single_window_degenerates():
    """The noisy-host fallback path merges a single window: medians are
    the window's own numbers, every spread is 0."""
    w = _window(1, {"qa": 1.5}, 0.8, 0.81)
    m = bench.merge_windows([w])
    assert m["queries"] == {"qa": 1.5}
    assert m["queries_spread"] == {"qa": 0.0}
    assert m["window_count"] == 1
    assert m["median_query_spread"] == 0.0


def test_merge_windows_even_count():
    """statistics.median averages the middle pair on an even window
    count (a MAX_BENCH_ATTEMPTS run can accept 2)."""
    ws = [
        _window(1, {"qa": 1.0}, 0.75, 0.76),
        _window(2, {"qa": 2.0}, 0.74, 0.75),
    ]
    m = bench.merge_windows(ws)
    assert m["queries"]["qa"] == 1.5
    assert m["queries_spread"]["qa"] == round(1.0 / 1.5, 3)


def test_write_report_never_elides_queries(tmp_path, capsys):
    """VERDICT r11 #1: the one-line stdout JSON must carry EVERY query
    timing at any plausible length — over-budget lines shed optional
    metadata keys, never `queries` entries (the old elision made the
    driver's PERF comparison mark the fastest queries
    "dropped_from_bench")."""
    import json as _json

    # 60 long-named queries: far past the 44 real entries and past the
    # 1800-char budget with all metadata present
    qs = {f"query_with_a_rather_long_name_{i:02d}": 0.1 + i / 100
          for i in range(60)}
    full = _window(1, qs, 0.75, 0.76)
    full["tpch_22_shapes_count"] = 22
    full["calibration_rows"] = 3_200_000_000
    full["headline_query_count"] = len(qs)
    bench._write_report(full, out_dir=str(tmp_path))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = _json.loads(line)
    assert set(parsed["queries"]) == set(qs)
    assert "queries_elided" not in parsed
    # essentials survive the shedding
    for k in ("metric", "value", "unit", "sf", "queries"):
        assert k in parsed
    # this pathological 60-long-name set can't fit even bare, so every
    # sheddable key must be gone (queries were kept at their expense)
    for k in ("calibration_rows", "hfp_transform_rows_per_s_band",
              "timing", "detail_file", "calibration_s"):
        assert k not in parsed
    # the full-precision file still has everything
    detail = _json.loads((tmp_path / "BENCH.json").read_text())
    assert set(detail["queries"]) == set(qs)
    assert detail["calibration_rows"] == 3_200_000_000


def test_write_report_keeps_metadata_when_it_fits(tmp_path, capsys):
    """Under the budget nothing is shed: bench_normalize.py's keys stay
    on the compact line."""
    import json as _json

    full = _window(1, {"qa": 1.0, "qb": 2.0}, 0.75, 0.76)
    bench._write_report(full, out_dir=str(tmp_path))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = _json.loads(line)
    for k in ("calibration_s", "calibration_end_s", "queries",
              "hfp_transform_rows_per_s", "detail_file"):
        assert k in parsed
