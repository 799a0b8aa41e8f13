"""The bench stdout contract: ONE parseable JSON line, never longer than
the harness's 2000-char stdout capture, slowest queries always present."""

import json

import bench


def _full(n_queries: int, name_len: int = 28) -> dict:
    timings = {
        f"q{'x' * name_len}{i:04d}": round(0.1 + i * 0.01, 3)
        for i in range(n_queries)
    }
    total = sum(timings.values())
    return {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": n_queries,
        "per_query_mean_sec": round(total / n_queries, 3),
        "queries": timings,
    }


def test_line_fits_capture_and_parses_at_any_scale():
    for n in (5, 91, 400):
        line = bench.build_summary_line(_full(n))
        assert len(line) <= 2000, (n, len(line))
        parsed = json.loads(line)
        assert parsed["n_queries"] == n
        assert parsed["queries_file"] == "BENCH_FULL.json"
        assert parsed["queries"], "at least one per-query entry survives"


def test_slowest_queries_kept_first():
    full = _full(400)
    parsed = json.loads(bench.build_summary_line(full))
    kept = parsed["queries"]
    slowest = max(full["queries"], key=full["queries"].get)
    assert slowest in kept
    # everything kept is at least as slow as everything dropped
    floor = min(kept.values())
    dropped = [v for k, v in full["queries"].items() if k not in kept]
    assert all(v <= floor for v in dropped)


def test_small_suite_keeps_every_query():
    full = _full(10)
    parsed = json.loads(bench.build_summary_line(full))
    assert parsed["queries"] == full["queries"]


def test_drift_model_recovers_floor_and_slope():
    # synthetic host: fixed 0.15 s overhead floor + 1.3x slower compute
    timings = {
        n: round(0.15 + 1.3 * v, 4)
        for n, v in bench._CONTROL_REFERENCE.items()
    }
    floor, slope = bench.drift_model(timings)
    assert abs(floor - 0.15) < 0.02, floor
    assert abs(slope - 1.3) < 0.05, slope
    # inverse map sends every control back to its pinned reference
    for n, v in timings.items():
        ref = bench._CONTROL_REFERENCE[n]
        norm = bench.normalize_to_reference(v, (floor, slope))
        assert abs(norm - ref) < 0.03, (n, norm, ref)


def test_drift_model_robust_to_one_outlier():
    timings = {
        n: round(0.1 + 1.0 * v, 4)
        for n, v in bench._CONTROL_REFERENCE.items()
    }
    timings["graph_pagerank"] = 30.0  # one control hit a GC pause
    floor, slope = bench.drift_model(timings)
    assert abs(slope - 1.0) < 0.15, slope
    assert abs(floor - 0.1) < 0.1, floor


def test_drift_model_degenerates_to_none():
    assert bench.drift_model({"q1_pricing_summary": 0.5}) is None


def test_drift_model_floor_never_negative():
    # r7 mis-fit class: controls whose fast cluster ran hot yields a
    # negative Theil-Sen floor; the model must clamp to floor >= 0 and
    # re-fit the slope through the origin (VERDICT r7 what's-wrong #2)
    timings = {}
    for n, v in bench._CONTROL_REFERENCE.items():
        # fast controls 0.5x, slow controls 0.8x: induces negative floor
        f = 0.5 if v < 0.5 else 0.8
        timings[n] = round(f * v, 4)
    model = bench.drift_model(timings)
    assert model is not None
    floor, slope = model
    assert floor >= 0.0, floor
    assert slope > 0, slope
    # inverse map must never inflate a small query ABOVE its raw time
    # by the floor artifact: with floor=0 the map is purely x/slope
    norm = bench.normalize_to_reference(0.1, model)
    assert norm == round(0.1 / slope, 3), (norm, slope)
