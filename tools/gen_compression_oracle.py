"""Regenerate the pinned (md5(text) -> zlib ratio) oracle table for
``text_compression_ratio``.

zlib is not SQL-expressible, but the ratio is a pure deterministic
function of the text bytes (level pinned at 6, rounding pinned at 6 dp
with Python round-half-even — the same kernel the Spark pandas_udf
runs), so the oracle pins the kernel output for every distinct fixture
text and joins by CONTENT HASH.  Keyed by md5(text), not doc_id: the
sf0.001 and sf0.01 fixtures assign different texts to the same ids, and
the pytest rehearsal runs every oracle at sf0.001 while the driver runs
sf0.01 — one text-keyed table serves both.

Usage: python tools/gen_compression_oracle.py
Prints the VALUES body; paste over _COMPRESSION_PINS in
__spark_entry__.py if the fixtures ever change.
"""

from __future__ import annotations

import hashlib
import zlib

import duckdb

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
LEVEL = 6


def pins() -> list[tuple[str, float]]:
    con = duckdb.connect()
    seen: dict[str, float] = {}
    for d in SF_DIRS:
        rows = con.execute(
            f"SELECT text FROM '{d}/documents.parquet' "
            "WHERE text IS NOT NULL AND len(text) > 0"
        ).fetchall()
        for (t,) in rows:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if h not in seen:
                raw = t.encode("utf-8")
                seen[h] = round(len(zlib.compress(raw, LEVEL)) / len(raw), 6)
    return sorted(seen.items())


def values_body() -> str:
    vals = pins()
    lines, chunk = [], []
    for h, r in vals:
        chunk.append(f"('{h}',{r})")
        if len(chunk) == 6:
            lines.append("  " + ",".join(chunk) + ",")
            chunk = []
    if chunk:
        lines.append("  " + ",".join(chunk) + ",")
    lines[-1] = lines[-1].rstrip(",")
    return "\n".join(lines)


if __name__ == "__main__":
    print(values_body())
