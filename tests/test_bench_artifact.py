"""Lockstep gate between the committed full-suite bench artifact and the
query registry (round-5 verdict #3): the newest ``BENCH_FULL_r*.json``
must cover every registered query except the documented O(n^2) exact
anchors, so the artifact can never silently lag behind new operators.
Adding a query therefore requires re-running ``BENCH_FULL=1 python
bench.py`` and committing the refreshed artifact — that is the point.
"""

from __future__ import annotations

import glob
import json
import os
import re

import bench
import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _newest_full_artifact() -> str:
    paths = glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json"))
    assert paths, "no BENCH_FULL_r*.json committed"
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def test_full_bench_artifact_covers_registry():
    path = _newest_full_artifact()
    with open(path) as f:
        artifact = json.load(f)
    benched = set(artifact["queries"])
    expected = set(entry_mod.queries()) - bench.FULL_EXCLUDE
    missing = expected - benched
    assert not missing, (
        f"{os.path.basename(path)} lags the registry: {sorted(missing)} "
        "— rerun BENCH_FULL=1 python bench.py and commit the artifact"
    )
    stale = benched - expected
    assert not stale, (
        f"{os.path.basename(path)} benches unregistered queries: {sorted(stale)}"
    )


def test_full_exclude_is_documented_anchor_set():
    """Every excluded query must still exist in the registry (they are
    oracle anchors, not dead names) and stay a small, deliberate list."""
    qs = set(entry_mod.queries())
    assert bench.FULL_EXCLUDE <= qs
    assert len(bench.FULL_EXCLUDE) <= 5


def test_full_bench_artifact_carries_calibration_fields():
    """Round-12 verdict directive #2's done-criterion, pinned so future
    artifacts keep it: the committed full-suite artifact must carry the
    before/after calibration kernel timings, the quiet-box reference,
    and a normalized row for every raw row — the machinery that lets
    round-over-round deltas be judged net of host-load drift."""
    path = _newest_full_artifact()
    with open(path) as f:
        a = json.load(f)
    for field in ("calibration_before", "calibration_after",
                  "calibration_ref", "calibration_factor",
                  "value_normalized"):
        assert field in a, field
        assert a[field] > 0
    assert a["calibration_ref"] == bench.CALIBRATION_REF_SEC
    assert set(a["queries_normalized"]) == set(a["queries"])
    # the factor is ref / mean(before, after), within rounding
    mean = (a["calibration_before"] + a["calibration_after"]) / 2.0
    assert abs(a["calibration_factor"] - a["calibration_ref"] / mean) < 1e-3


def test_full_bench_artifact_carries_heavy_repeat_fields():
    """Round-13 verdict directive #2's done-criterion, pinned for future
    artifacts: heavy rows (previous full-suite raw above the threshold)
    must be repeat-medians, with the per-row counts recorded so a reader
    can tell which numbers are medians.  Applies from r14 on — earlier
    artifacts predate the mechanism."""
    path = _newest_full_artifact()
    rnd = int(re.search(r"_r(\d+)", path).group(1))
    if rnd < 14:
        import pytest

        pytest.skip("pre-r14 artifact: heavy-repeat fields not yet emitted")
    with open(path) as f:
        a = json.load(f)
    assert a["heavy_repeat"] >= 3
    assert a["heavy_threshold_sec"] == bench.HEAVY_THRESHOLD_SEC
    assert isinstance(a["repeats"], dict)
    # every recorded count differs from the base and is the heavy count
    assert all(
        v == a["heavy_repeat"] and v != a["repeat"]
        for v in a["repeats"].values()
    )
    # each repeat-median row exists in the artifact's query map
    assert set(a["repeats"]) <= set(a["queries"])
