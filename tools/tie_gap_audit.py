"""Tie-distance audit for the r15 Arrow trainer kernels (r14 verdict #2).

The distributed kmeans/PQ trainers' per-iteration assignment argmax moves
from a JVM sequential fold (``aggregate(zip_with(...))``) to a numpy
matmul inside a ``mapInPandas`` partial-aggregation kernel.  The two
compute the same dot products up to float reassociation (~dim * eps of
relative error, ~1e-14 for unit vectors at dim 64).  An assignment can
only flip if, for some row, the best and second-best scores sit within
that reassociation distance.  This audit replays the EXACT training
trajectories of the registered queries (same sample, init, update rule)
on every fixture SF and reports the minimum top1-top2 score gap seen at
any assignment step — training iterations AND the final full-corpus
assignment.  A minimum gap many orders of magnitude above 1e-12 proves
the kernel swap cannot change any assignment, hence cannot change the
pinned integer oracles.

Usage: python tools/tie_gap_audit.py
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

#: conservative bound on |JVM fold - numpy matmul| for unit-ish vectors:
#: dim * machine-eps * max|partial sum|, padded 100x
REASSOC_BOUND = 64 * 2.2e-16 * 100

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _load(sf: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, X


def _xxhash64_spark(ids: np.ndarray) -> np.ndarray:
    """Spark's xxhash64(bigint) with seed 42 — for the hash-ordered
    sample/init (must match F.xxhash64 exactly)."""
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)

    def rotl(x, r):
        r = np.uint64(r)
        return ((x << r) | (x >> (np.uint64(64) - r))) & mask

    def h(v: int) -> int:
        seed = np.uint64(42)
        acc = (seed + np.uint64(0x27D4EB2F165667C5)) & mask
        acc = (acc + np.uint64(8)) & mask
        k1 = np.int64(v).astype(np.uint64)
        k1 = (k1 * P2) & mask
        k1 = rotl(k1, 31)
        k1 = (k1 * P1) & mask
        acc ^= k1
        acc = (rotl(acc, 27) * P1 + np.uint64(0x85EBCA77C2B2AE63)) & mask
        acc ^= acc >> np.uint64(33)
        acc = (acc * P2) & mask
        acc ^= acc >> np.uint64(29)
        acc = (acc * P3) & mask
        acc ^= acc >> np.uint64(32)
        return int(np.int64(acc.astype(np.int64)))

    old = np.seterr(over="ignore")
    try:
        return np.array([h(int(v)) for v in ids], dtype=np.int64)
    finally:
        np.seterr(**old)


def _hash_order(ids: np.ndarray) -> np.ndarray:
    hs = _xxhash64_spark(ids)
    return np.lexsort((ids, hs))


def audit_kmeans(ids, X, n_cells=8, iters=5):
    """Replay train_kmeans_centroids_distributed + the final
    cell_assign populations; return min top1-top2 gap over all steps."""
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Xn = X / nrm
    order = _hash_order(ids)
    C = Xn[order[:n_cells]].copy()
    min_gap = np.inf
    for _ in range(iters):
        S = Xn @ C.T
        Ss = np.sort(S, axis=1)
        min_gap = min(min_gap, float((Ss[:, -1] - Ss[:, -2]).min()))
        a = S.argmax(axis=1)
        for j in range(len(C)):
            pts = Xn[a == j]
            if len(pts):
                c = pts.mean(axis=0)
                n = np.linalg.norm(c)
                C[j] = c / n if n > 0 else c
    # final full-corpus assignment (cosine argmax == unit-normalized dot)
    cn = np.linalg.norm(C, axis=1, keepdims=True)
    cn[cn == 0] = 1.0
    S = X @ (C / cn).T
    Ss = np.sort(S, axis=1)
    min_gap = min(min_gap, float((Ss[:, -1] - Ss[:, -2]).min()))
    return min_gap


def audit_pq(ids, X, m=4, n_codes=8, iters=3):
    """Replay train_pq_codebooks_distributed + the histogram encode."""
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Xn = X / nrm
    order = _hash_order(ids)
    init = Xn[order[:n_codes]]
    dim = X.shape[1]
    d_sub = dim // m
    books = [init[:, j * d_sub:(j + 1) * d_sub].copy() for j in range(m)]
    min_gap = np.inf
    for it in range(iters + 1):  # +1: the final histogram encode
        for j in range(m):
            Mj = Xn[:, j * d_sub:(j + 1) * d_sub]
            S = Mj @ books[j].T - 0.5 * np.einsum("ij,ij->i", books[j], books[j])
            Ss = np.sort(S, axis=1)
            min_gap = min(min_gap, float((Ss[:, -1] - Ss[:, -2]).min()))
            if it == iters:
                continue
            a = S.argmax(axis=1)
            for ci in range(n_codes):
                pts = Mj[a == ci]
                if len(pts):
                    books[j][ci] = pts.mean(axis=0)
    return min_gap


def main() -> None:
    ok = True
    for sf in SFS:
        ids, X = _load(sf)
        gk = audit_kmeans(ids, X)
        gp = audit_pq(ids, X)
        verdict = "OK" if min(gk, gp) > 1000 * REASSOC_BOUND else "TOO CLOSE"
        if verdict != "OK":
            ok = False
        print(
            f"{sf}: kmeans min gap {gk:.3e}, pq min gap {gp:.3e} "
            f"(bound {REASSOC_BOUND:.1e}) -> {verdict}"
        )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
