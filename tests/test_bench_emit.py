"""BENCH_r{N}.json guard: the headline JSON line bench.py prints must stay
well inside the driver's tail-capture window. Round 5 lost its official
bench artifact (parsed:null) because the line inlined the whole of
BENCH_SF1.json; _emit now attaches sf1 by summary + path only, and this
test pins both the size budget and the schema the driver parses."""

from __future__ import annotations

import contextlib
import io
import json

import bench

# Conservative budget: driver tail capture is far larger, but one line with
# ~130 query timings plus the sf1 summary sits around 2.5 KB — a 4 KB cap
# leaves headroom for registry growth while catching any re-inlining.
LINE_BUDGET_BYTES = 4096


def _emit_line(timings):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(timings, "/root/testdata/sf0.1", mode="isolated")
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert lines, "bench._emit printed nothing"
    return lines[-1]


def test_headline_line_compact_and_parseable():
    # The real emission: exactly the HEADLINE list (what run_suite passes).
    timings = {name: 123.456 for name in bench.HEADLINE}
    line = _emit_line(timings)
    assert len(line.encode()) <= LINE_BUDGET_BYTES, (
        f"headline line is {len(line.encode())} bytes > {LINE_BUDGET_BYTES}; "
        "did something inline a large blob into _emit again, or did the "
        "HEADLINE list outgrow the budget?"
    )
    obj = json.loads(line)
    assert obj["metric"] == "headline_queries_total_sec"
    assert isinstance(obj["value"], float)
    assert obj["queries"] == timings
    assert obj["sf"] == 0.1
    # absolute bound even if someone ever emits the WHOLE registry: stay
    # far inside the driver's tail-capture window
    from pharmacodi_spark.plans import QUERIES

    full = _emit_line({name: 123.456 for name in QUERIES})
    assert len(full.encode()) <= 2 * LINE_BUDGET_BYTES
    json.loads(full)
    # sf1 evidence is attached by summary + path, never inlined.
    if "sf1" in obj:
        sf1 = obj["sf1"]
        assert sf1["file"] == "BENCH_SF1.json"
        assert "queries" not in sf1
        assert len(json.dumps(sf1).encode()) < 512


def test_failed_queries_surface_and_exit_nonzero():
    import pytest

    timings = {"ok_query": 1.0, "bad_query": -1.0}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as exc:
            bench._emit(timings, "/root/testdata/sf0.1", mode="isolated")
    assert exc.value.code == 3
    obj = json.loads([l for l in buf.getvalue().splitlines() if l.strip()][-1])
    assert obj["failed"] == ["bad_query"]
    assert obj["value"] == 1.0
