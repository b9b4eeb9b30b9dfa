"""BENCH_r{N}.json guard: the driver captures only the LAST 2,000 bytes of
bench.py's stdout and parses the final line. Rounds 5 and 6 both recorded
parsed:null because the final line carried the full per-query dict (~3.4 KB
at 68 queries). _emit now prints the COMPLETE results object as the FIRST
line (and writes it to BENCH_FULL.json), then a compact final line that
must fit the driver window with slack even when every registry query is
benchmarked. This test pins that contract by replaying the driver's exact
capture: tail -c 2000 -> last line -> json.loads."""

from __future__ import annotations

import contextlib
import io
import json

import bench
import pytest

DRIVER_TAIL_BYTES = 2000


@pytest.fixture(autouse=True)
def _redirect_sidecar(tmp_path, monkeypatch):
    """Never clobber the committed BENCH_FULL.json with fake timings."""
    monkeypatch.setattr(bench, "BENCH_FULL_PATH", str(tmp_path / "BENCH_FULL.json"))


def _emit_lines(timings):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(timings, "/root/testdata/sf0.1", mode="isolated")
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert lines, "bench._emit printed nothing"
    return buf.getvalue(), lines


def _driver_parse(stdout: str):
    """Replay the driver: keep the last 2,000 BYTES, parse the last line."""
    tail = stdout.encode()[-DRIVER_TAIL_BYTES:].decode(errors="replace")
    last = [l for l in tail.splitlines() if l.strip()][-1]
    return json.loads(last)


def test_final_line_survives_driver_tail_capture():
    # The real emission: exactly the HEADLINE list (what run_suite passes).
    timings = {name: 123.456 for name in bench.HEADLINE}
    stdout, lines = _emit_lines(timings)
    final = lines[-1]
    assert len(final.encode()) <= bench.FINAL_LINE_BUDGET <= DRIVER_TAIL_BYTES - 100, (
        f"final line is {len(final.encode())} bytes > {bench.FINAL_LINE_BUDGET}; "
        "the driver window is 2,000 bytes — keep slack for a partial "
        "previous line sharing the tail"
    )
    obj = _driver_parse(stdout)
    assert obj["metric"] == "headline_queries_total_sec"
    assert isinstance(obj["value"], float)
    assert obj["sf"] == 0.1
    assert obj["n_queries"] == len(timings)
    assert obj["queries_full"] == "BENCH_FULL.json"
    # the compact queries dict is a subset of the real timings
    assert set(obj["queries"]) <= set(timings)
    assert all(obj["queries"][k] == timings[k] for k in obj["queries"])
    # sf1 evidence is attached by summary + path, never inlined.
    if "sf1" in obj:
        sf1 = obj["sf1"]
        assert sf1["file"] == "BENCH_SF1.json"
        assert "queries" not in sf1
        assert len(json.dumps(sf1).encode()) < 512


def test_full_record_on_first_line_and_sidecar():
    timings = {name: 123.456 for name in bench.HEADLINE}
    _, lines = _emit_lines(timings)
    first = json.loads(lines[0])
    assert first["queries"] == timings  # complete, not truncated
    with open(bench.BENCH_FULL_PATH) as fh:
        sidecar = json.load(fh)
    assert sidecar["queries"] == timings


def test_full_registry_still_fits_window():
    # absolute bound even if someone ever benches the WHOLE registry
    from pharmacodi_spark.plans import QUERIES

    timings = {name: 123.456 for name in QUERIES}
    stdout, lines = _emit_lines(timings)
    assert len(lines[-1].encode()) <= bench.FINAL_LINE_BUDGET
    obj = _driver_parse(stdout)
    assert obj["n_queries"] == len(timings)


def test_compact_keeps_slowest_queries():
    # truncation drops the CHEAP queries; the expensive tail stays visible
    timings = {f"q{i:03d}": float(i) for i in range(200)}
    stdout, _ = _emit_lines(timings)
    obj = _driver_parse(stdout)
    kept = obj["queries"]
    assert 0 < len(kept) < len(timings)
    cutoff = min(kept.values())
    dropped_max = max(v for k, v in timings.items() if k not in kept)
    assert cutoff >= dropped_max


def test_failed_queries_surface_and_exit_nonzero():
    timings = {"ok_query": 1.0, "bad_query": -1.0}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as exc:
            bench._emit(timings, "/root/testdata/sf0.1", mode="isolated")
    assert exc.value.code == 3
    obj = _driver_parse(buf.getvalue())
    assert obj["failed"] == ["bad_query"]
    assert obj["n_failed"] == 1
    assert obj["value"] == 1.0


def test_all_failed_run_still_fits_window():
    """The case where tail-parsing matters MOST: every registry query
    failed. The failed list must be capped so the final line stays inside
    the driver window (ADVICE r7 — the old loop printed an over-budget
    line when keep reached 0 with an unbounded failed list)."""
    from pharmacodi_spark.plans import QUERIES

    timings = {name: -1.0 for name in QUERIES}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        with pytest.raises(SystemExit) as exc:
            bench._emit(timings, "/root/testdata/sf0.1", mode="isolated")
    assert exc.value.code == 3
    stdout = buf.getvalue()
    lines = [l for l in stdout.splitlines() if l.strip()]
    assert len(lines[-1].encode()) <= bench.FINAL_LINE_BUDGET
    obj = _driver_parse(stdout)
    assert obj["n_failed"] == len(timings)
    assert len(obj["failed"]) <= len(timings)  # possibly truncated
    assert set(obj["failed"]) <= set(timings)
    assert obj["queries"] == {}


def test_non_sf01_emit_never_clobbers_official_sidecar(tmp_path, monkeypatch):
    """Only the driver-contract scale (sf0.1) owns BENCH_FULL.json — an
    sf1 leg must write its own sidecar (r8 incident: tools/bench_sf1's
    second leg overwrote the committed sf0.1 record with sf1 timings)."""
    official = tmp_path / "BENCH_FULL.json"
    monkeypatch.setattr(bench, "BENCH_FULL_PATH", str(official))
    official.write_text('{"sentinel": true}')
    timings = {"q": 1.0}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(timings, "/tmp/whatever/sf1", mode="isolated")
    assert json.loads(official.read_text()) == {"sentinel": True}
    side = tmp_path / "BENCH_FULL_sf1.0.json"
    assert json.loads(side.read_text())["sf"] == 1.0


# ---------------------------------------------------------------------------
# r13: pipelined isolated-suite protocol (BENCH_r12 rc=124 postmortem).
# Scripted stub children — no JVM — pin the control flow: overlap of the
# next boot with the current query, -1.0 on boot-timeout/crash, partial
# summary line after EVERY query, and every child killed.


class _StubChild:
    """Scripted stand-in for bench._Child. Behaviors by query name:
    'ok' -> READY then a result line; 'boot_hang' -> no lines at all;
    'run_crash' -> READY but no result."""

    events: list = []  # shared log: ("boot"|"go"|"kill", name)
    behaviors: dict = {}

    def __init__(self, name, sf_dir, runs):
        self.name = name
        b = self.behaviors.get(name, "ok")
        if b == "ok":
            self._script = [
                "READY",
                json.dumps(
                    {"metric": "single_query_sec", "query": name, "value": 2.5}
                ),
            ]
        elif b == "run_crash":
            self._script = ["READY"]
        else:  # boot_hang
            self._script = []
        self.err_tail = []
        self.proc = type("P", (), {"poll": staticmethod(lambda: None)})()
        _StubChild.events.append(("boot", name))

    def wait_line(self, pred, timeout):
        while self._script:
            line = self._script.pop(0)
            if pred(line):
                return line
        return None  # timeout / EOF

    def go(self):
        _StubChild.events.append(("go", self.name))
        return True

    def kill(self):
        _StubChild.events.append(("kill", self.name))


def test_isolated_suite_pipeline_protocol(monkeypatch):
    names = ["q_a", "q_b_hang", "q_c_crash", "q_d"]
    _StubChild.events = []
    _StubChild.behaviors = {"q_b_hang": "boot_hang", "q_c_crash": "run_crash"}
    monkeypatch.setattr(bench, "HEADLINE", names)
    monkeypatch.setattr(bench, "_Child", _StubChild)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(io.StringIO()):
        with pytest.raises(SystemExit) as exc:  # failed queries -> exit 3
            bench.run_suite_isolated("/root/testdata/sf0.1", runs=3)
    assert exc.value.code == 3
    stdout = buf.getvalue()
    lines = [l for l in stdout.splitlines() if l.strip()]
    # final full record: ok queries timed, hang and crash recorded as -1.0
    final_full = json.loads(lines[-2])
    assert final_full["queries"] == {
        "q_a": 2.5, "q_b_hang": -1.0, "q_c_crash": -1.0, "q_d": 2.5
    }
    assert final_full["failed"] == ["q_b_hang", "q_c_crash"]
    # a parseable PARTIAL line streamed after every query
    partials = [
        json.loads(l) for l in lines if '"partial": true' in l
    ]
    assert [p["n_done"] for p in partials] == [1, 2, 3, 4]
    assert all(p["n_total"] == 4 for p in partials)
    # pipeline overlap: the NEXT child boots before the CURRENT child's GO
    ev = _StubChild.events
    assert ev.index(("boot", "q_b_hang")) < ev.index(("go", "q_a"))
    # every child is killed exactly once (no leaked JVMs)
    kills = [e for e in ev if e[0] == "kill"]
    assert sorted(k[1] for k in kills) == sorted(names)
