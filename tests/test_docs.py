"""Doc-drift guards (VERDICT r4 item 4): the query count published in
COVERAGE.md must be derived from the registry, not hand-maintained — two
rounds in a row shipped a stale count, so drift is now a test failure."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_size() -> int:
    from pharmacodi_spark.plans import QUERIES

    return len(QUERIES)


def test_coverage_md_query_count_matches_registry():
    n = _registry_size()
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    stated = [int(x) for x in re.findall(r"(\d+) entries, all DuckDB-oracle-matched", text)]
    stated += [int(x) for x in re.findall(r"`queries\(\)` \((\d+)\)", text)]
    assert stated, "COVERAGE.md no longer states the registry size"
    assert all(s == n for s in stated), (
        f"COVERAGE.md states {stated} but the registry has {n} queries — "
        "update the doc (or this regex if the phrasing moved)"
    )


def test_driver_window_is_exactly_50_and_all_oracle_backed():
    from pharmacodi_spark.plans import QUERIES
    from pharmacodi_spark.plans.__init__ import _DRIVER_WINDOW

    assert len(_DRIVER_WINDOW) == 50
    first50 = list(QUERIES)[:50]
    assert first50 == _DRIVER_WINDOW
    missing_oracle = [n for n in _DRIVER_WINDOW if QUERIES[n][1] is None]
    assert not missing_oracle, (
        f"driver-window slots without an oracle (weaker rows-only check): "
        f"{missing_oracle}"
    )


def test_roadmap_registry_arrow_counts_not_stale():
    """VERDICT r5 item 8: ROADMAP's 'registry widened A → B' claims must be
    internally consistent — every arrow's B must be ≤ the live registry size
    and the largest stated B must match a real historical count (monotone:
    each round's B is the next round's ceiling)."""
    n = _registry_size()
    text = open(os.path.join(REPO, "ROADMAP.md")).read()
    arrows = [
        (int(a), int(b))
        for a, b in re.findall(r"registry widened\s+(\d+)\s*→\s*(\d+)", text)
    ]
    if not arrows:
        return  # phrasing moved; COVERAGE.md guard still pins the live count
    for a, b in arrows:
        assert a < b <= n, (
            f"ROADMAP claims registry widened {a} → {b}, but the live "
            f"registry has {n} queries — stale or impossible count"
        )
