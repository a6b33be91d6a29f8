"""Diff two bench detail files (BENCH_DETAIL.json / BENCH_FULL_r*.json).

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 0.25]
       [--raw]

Prints per-query deltas over the threshold (relative), the shared-set
totals, and adds/removes — the exact readout the round-5 drift
investigation needed (SCALE.md "Bench drift investigation").  Since r13
the artifacts carry CALIBRATION-NORMALIZED rows (`queries_normalized`),
which divide uniform host-load drift out; this tool prefers them on
each side when present (``--raw`` forces raw seconds).  Remember:
normalization corrects the uniform component only — adjudicate any
surviving single-row regression with BENCH_ONLY + BENCH_REPEAT>=3.
"""

from __future__ import annotations

import json
import sys


def _rows(path: str, raw: bool) -> tuple[dict, dict, dict]:
    d = json.load(open(path))
    rows = (
        d["queries_normalized"]
        if not raw and "queries_normalized" in d
        else d["queries"]
    )
    base = d.get("repeat", 1)
    reps = {k: d.get("repeats", {}).get(k, base) for k in rows}
    # r15: build-treatment metadata — rows whose reported median was
    # served from the shared BM25 base-build cache, plus (when the
    # artifact carries it) the build-PAYING rep-1 raw seconds for each.
    norm = 1.0 if raw else d.get("calibration_factor", 1.0)
    served = set(d.get("shared_build_rows", []))
    build = {
        k: round(v * norm, 3)
        for k, v in d.get("build_rep_sec", {}).items()
        if k not in set(d.get("build_rep_served", []))
    }
    return rows, reps, {"served": served, "build": build}


def _match_treatments(old, new, old_t, new_t) -> list[str]:
    """When exactly one side's median was cache-served and that side
    recorded a build-paying rep, substitute it so both sides compare the
    SAME treatment (build-inclusive).  Returns the substituted keys."""
    subbed = []
    for k in set(old) & set(new):
        o_served = k in old_t["served"]
        n_served = k in new_t["served"]
        if o_served == n_served:
            continue
        side_t, side = (old_t, old) if o_served else (new_t, new)
        if k in side_t["build"]:
            side[k] = side_t["build"][k]
            subbed.append(k)
    return subbed


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.25
    raw = "--raw" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    old, old_reps, old_t = _rows(args[0], raw)
    new, new_reps, new_t = _rows(args[1], raw)
    subbed = _match_treatments(old, new, old_t, new_t)
    if subbed:
        print(
            "treatment-matched (build-paying rep substituted):",
            ", ".join(sorted(subbed)),
        )
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(
        f"shared {len(shared)} queries: {t_old:.2f}s -> {t_new:.2f}s "
        f"({100 * (t_new / t_old - 1):+.1f}%)"
    )
    moved = [
        (k, old[k], new[k])
        for k in shared
        if old[k] > 0.05 and abs(new[k] / old[k] - 1) >= thr
    ]
    for k, a, b in sorted(moved, key=lambda x: x[2] / x[1]):
        # a row whose per-row repeat count changed between artifacts
        # compares methodology, not kernels (r14: heavy rows switched to
        # medians-of-3) — flag it so nobody adjudicates it as a kernel
        note = (
            f"  [repeat {old_reps.get(k, 1)}->{new_reps.get(k, 1)}]"
            if old_reps.get(k, 1) != new_reps.get(k, 1)
            else ""
        )
        print(
            f"  {k:40s} {a:7.2f} -> {b:7.2f}  "
            f"({100 * (b / a - 1):+.0f}%){note}"
        )
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}):", ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}):", ", ".join(removed))


if __name__ == "__main__":
    main()
