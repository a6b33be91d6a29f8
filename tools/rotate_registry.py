"""Regenerate the _DRIVER_FIRST rotation list for the next round.

The verify driver checks exactly ``queries()[:50]`` (insertion order) at
sf0.01, so each round the 50-slot window should hold the queries with the
weakest driver evidence.  This tool ranks every registered query by its
LAST driver result across all ``CORRECTNESS_r*.json`` files:

1. never sampled, oracle-backed           (strongest claim on a slot)
2. oracle ADDED since the last sample     (stale no_oracle row to upgrade)
3. last sample was an error / mismatch    (stale red to clear)
4. never sampled, rows-only
5. green                                  (keep behind position 50)

and prints a ready-to-paste ``_DRIVER_FIRST`` literal.  Run it at the
START of a round, paste into ``__spark_entry__.py``, then verify the new
window with ``python tools/driver_sim.py $(window names)`` BEFORE
committing.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry

    qk = list(entry.queries().keys())
    oracle = set(entry.oracle_sql().keys())

    last: dict[str, dict] = {}
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        for k, v in json.load(open(path)).items():
            last[k] = v
            last_round[k] = rnd

    def green(v: dict) -> bool:
        if v.get("err") == "no_oracle":  # rows-only by design: counts as done
            return v.get("spark_rows") is not None
        return bool(v.get("rows_match")) and bool(v.get("schema_match")) and not v.get("err")

    def rank(name: str) -> tuple:
        v = last.get(name)
        if v is None:
            prio = 0 if name in oracle else 3
        elif v.get("err") == "no_oracle" and name in oracle:
            prio = 1  # oracle added since the sample: row is stale rows-only
        elif not green(v):
            prio = 2
        else:
            prio = 4
        # greens re-verify STALEST first (oldest driver row): a query whose
        # kernel changed three rounds after its green row is the weakest
        # evidence in the green pool (round-6 verdict directive #4)
        return (prio, last_round.get(name, 0), qk.index(name))

    ordered = sorted(qk, key=rank)
    window = ordered[:50]
    n_new = sum(1 for n in window if n not in last)
    n_upg = sum(
        1
        for n in window
        if n in last and last[n].get("err") == "no_oracle" and n in oracle
    )
    n_stale = sum(
        1 for n in window if n in last and not green(last[n])
    )
    print(f"# window: {n_new} never-sampled, {n_upg} oracle-upgraded, "
          f"{n_stale} stale, {50 - n_new - n_upg - n_stale} re-verifications")
    print("_DRIVER_FIRST = [")
    for name in window:
        print(f'    "{name}",')
    print("]")


if __name__ == "__main__":
    main()
