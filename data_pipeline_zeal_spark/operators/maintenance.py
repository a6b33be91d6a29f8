"""[EXT] Unified index maintenance — one scheduled entry point for
every persisted structure this engine maintains (r12, round-11 verdict
directive #4; no reference counterpart — the reference has no table
format or indexes).

The 100 TB operational problem: each persisted structure accumulates a
different kind of debt — plain versioned tables fragment and carry
deletion-vector tombstones, BM25 indexes accumulate probe-slowing
segments, ANN indexes drift away from their frozen quantizers — and
each already has its own repair verb (:func:`~..sources.versioned.
maintain_table`, :func:`~.retrieval.optimize_bm25_index`,
:func:`~.ann_index.ivf_rebuild_if_drifted` /
:func:`~.ann_index.ivfadc_rebuild_if_drifted`).  What was missing is
the DISPATCH: a cron job should point at a path and get the right
(and only the right) action, decided from log metadata alone.

``maintain_index`` classifies the table by its companion logs — the
same convention every builder already follows:

* ``<table>_manifest`` (+ ``_df``/``_stats``)  → BM25 inverted index
* ``<table>_codebooks`` (+ ``_centroids``)     → IVFADC (compressed)
* ``<table>_centroids`` alone                  → IVF index
* ``matview`` spec in the head commit's meta   → materialized view
* none of the above                            → plain versioned table

and gates each repair behind a METADATA-ONLY debt check, so the
steady-state cron tick costs log replay, never a data scan:

* BM25: segment count = live ``_stats`` commits since the last rebuild
  (each sink batch appends exactly one stats segment); over
  ``max_segments`` → ``optimize_bm25_index``.
* IVF/IVFADC: append debt = appended commits on the main log since the
  last overwrite (build).  Only when appends exist does the (data-scan)
  drift canary run — it is the gate for the expensive rebuild, and the
  metadata trigger is the gate for the canary.
* matview: freshness debt = base-log commits past the version the view
  reflects (two ``latest_version`` reads) → ``refresh_matview``, which
  itself applies only the delta.
* plain: delegate wholesale to ``maintain_table`` (fragmentation +
  DV-debt triggers, one materializing compact).

Every branch returns a decision dict with ``kind`` and ``action`` so
schedulers log uniformly, matching ``maintain_table``'s contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import versioned as V
from . import ann_index, retrieval


def _is_table(path: str) -> bool:
    return bool(V._list_versions(path))


def _appends_since_rebuild(table: str) -> int:
    """Appended commits after the newest overwrite — pure log replay."""
    n = 0
    for h in V.history(table):
        if h["action"] == "overwrite":
            n = 0
        elif h["action"] == "append":
            n += 1
    return n


def classify_index(table: str) -> str:
    """``"bm25" | "ivfadc" | "ivf" | "matview" | "plain"`` from
    companion logs and commit meta — both metadata-only reads."""
    if _is_table(table + "_manifest"):
        return "bm25"
    if _is_table(table + "_codebooks"):
        return "ivfadc"
    if _is_table(table + "_centroids"):
        return "ivf"
    if _is_table(table) and V.commit_meta(
        table, V.latest_version(table)
    ).get("matview"):
        return "matview"
    return "plain"


def maintain_index(
    spark: SparkSession,
    table: str,
    max_segments: int = 4,
    min_cosine: float = 0.9,
    source: DataFrame | None = None,
    txn: str | None = None,
    **table_opts,
) -> dict:
    """One maintenance tick for any persisted structure at ``table``.
    Reads log metadata to pick (at most) one repair action; returns the
    decision dict either way.  ``source`` supplies full-precision
    embeddings for an IVFADC rebuild (the codes table cannot rebuild
    itself); ``table_opts`` pass through to
    :func:`~..sources.versioned.maintain_table` for plain tables."""
    kind = classify_index(table)
    if kind == "plain":
        rec = V.maintain_table(spark, table, txn=txn, **table_opts)
        return {
            "kind": kind,
            "action": "compact" if rec.get("compacted") else "none",
            **rec,
        }
    if kind == "matview":
        # freshness debt: the base log advanced past the version the
        # view reflects (two latest_version reads — metadata only)
        from ..sources import matview as MV

        spec = V.commit_meta(table, V.latest_version(table))["matview"]
        lag = V.latest_version(spec["base_table"]) - spec["base_version"]
        rec = {"kind": kind, "base_lag_commits": lag}
        if lag <= 0:
            return {"action": "none", **rec}
        r = MV.refresh_matview(spark, table, txn=txn)
        return {"action": "refresh", **rec, **r}
    if kind == "bm25":
        segments = 1 + _appends_since_rebuild(table + "_stats")
        # document deletions (delete_bm25_docs) leave DV tombstones on
        # the postings — a second, independent reason to fold the index
        dv_debt = bool(V.live_dv_dirs(table))
        rec = {"kind": kind, "segments": segments,
               "max_segments": max_segments, "dv_debt": dv_debt}
        if segments <= max_segments and not dv_debt:
            return {"action": "none", **rec}
        retrieval.optimize_bm25_index(spark, table, txn=txn)
        return {"action": "optimize", **rec}
    appends = _appends_since_rebuild(table)
    rec = {"kind": kind, "appends_since_rebuild": appends}
    if appends == 0:
        # frozen-model codes match the build corpus by construction —
        # the drift canary (a data scan) has nothing to measure
        return {"action": "none", **rec}
    if kind == "ivf":
        d = ann_index.ivf_rebuild_if_drifted(
            spark, table, min_cosine=min_cosine, txn=txn
        )
        return {
            "action": "rebuild" if d["rebuilt"] else "none", **rec, **d,
        }
    d = ann_index.ivfadc_rebuild_if_drifted(
        spark, table, source=source, min_cosine=min_cosine, txn=txn
    )
    action = (
        "rebuild"
        if d["rebuilt"]
        else ("rebuild_required" if d["rebuild_required"] else "none")
    )
    return {"action": action, **rec, **d}
