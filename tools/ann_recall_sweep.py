"""Offline parameter sweep for the raw-ANN recall floors (VERDICT round
1 item 4): replicate each family's math in numpy on the real testdata
embeddings and measure recall@10 vs exact, so defaults are chosen from
measurement instead of guessing. Run: python tools/ann_recall_sweep.py
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, ".")
from vectorsearch_with_hnsw_spark.operators.ann import hyperplane_ints  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
N_QUERIES = 10
K = 10
DIM = 64

t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
ids = np.asarray(t["vec_id"])
order = np.argsort(ids)
ids = ids[order]
X = np.array(list(t["embedding"].to_pylist()), dtype=np.float64)[order]
n = len(ids)
Q = X[:N_QUERIES]

# exact top-10, cosine + l2 (self included, matching bench's oracle)
norms = np.linalg.norm(X, axis=1)
cos = 1.0 - (Q @ X.T) / (norms[:N_QUERIES][:, None] * norms[None, :])
l2 = np.sqrt(((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1))


def topk(d):
    out = []
    for qi in range(N_QUERIES):
        idx = np.lexsort((ids, d[qi]))[:K]
        out.append(set(ids[idx]))
    return out


exact_cos = topk(cos)
exact_l2 = topk(l2)


def recall(cands_sets, dmat, want):
    """rank candidates by dmat, take top-10, recall vs want."""
    tot = hit = 0
    for qi in range(N_QUERIES):
        c = np.array(sorted(cands_sets[qi]))
        if len(c) == 0:
            tot += K
            continue
        pos = np.searchsorted(ids, c)
        dd = dmat[qi][pos]
        idx = np.lexsort((c, dd))[:K]
        got = set(c[idx])
        hit += len(got & want[qi])
        tot += len(want[qi])
    return hit / tot


def buckets(V, band, ppb):
    acc = np.zeros(len(V), dtype=np.int64)
    for p in range(band * ppb, (band + 1) * ppb):
        h = np.array(hyperplane_ints(p, DIM), dtype=np.float64)
        acc = acc * 2 + (V @ h >= 0.0).astype(np.int64)
    return acc


def hamming_ball(b, ppb, radius):
    out = [b]
    if radius >= 1:
        out += [b ^ (1 << i) for i in range(ppb)]
    if radius >= 2:
        out += [b ^ ((1 << i) | (1 << j)) for i in range(ppb) for j in range(i + 1, ppb)]
    if radius >= 3:
        out += [
            b ^ ((1 << i) | (1 << j) | (1 << m))
            for i in range(ppb)
            for j in range(i + 1, ppb)
            for m in range(j + 1, ppb)
        ]
    return set(out)


def lsh_recall(n_bands, ppb, radius):
    cands = [set() for _ in range(N_QUERIES)]
    scanned = 0
    for band in range(n_bands):
        bb = buckets(X, band, ppb)
        qb = buckets(Q, band, ppb)
        by_bucket: dict[int, list[int]] = {}
        for i, b in enumerate(bb):
            by_bucket.setdefault(int(b), []).append(i)
        for qi in range(N_QUERIES):
            probe = hamming_ball(int(qb[qi]), ppb, radius)
            for p in probe:
                for i in by_bucket.get(p, ()):
                    cands[qi].add(ids[i])
    scanned = np.mean([len(c) for c in cands]) / n
    return recall(cands, cos, exact_cos), scanned


print("== LSH (cosine) — current: 1 band x 8 planes, radius 2 ==")
for nb, ppb, r in [(1, 8, 2), (1, 8, 3), (2, 8, 2), (3, 8, 2), (4, 8, 2), (2, 8, 3), (3, 8, 1), (4, 8, 1), (6, 8, 1)]:
    rec, frac = lsh_recall(nb, ppb, r)
    print(f"  bands={nb} ppb={ppb} radius={r}: recall={rec:.3f} scan_frac={frac:.3f}")


# ---- PQ (sampled-anchor codebooks, ADC over L2) ----
def pq_recall(m, n_anchors, expand=None):
    d = DIM // m
    anchors = X[:n_anchors]  # lowest-id rows (ids sorted ascending)
    cands_all = [set(ids) for _ in range(N_QUERIES)]
    # ADC distances
    adc = np.zeros((N_QUERIES, n))
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        cb = anchors[:, s * d : (s + 1) * d]
        d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        code = d2.argmin(1)
        qlut = ((Q[:, s * d : (s + 1) * d][:, None, :] - cb[None, :, :]) ** 2).sum(-1)
        adc += qlut[:, code]
    if expand is None:
        return recall(cands_all, adc, exact_l2)
    # refine: shortlist expand*K by ADC, rescore exact
    cands = []
    for qi in range(N_QUERIES):
        idx = np.lexsort((ids, adc[qi]))[: expand * K]
        cands.append(set(ids[idx]))
    return recall(cands, l2, exact_l2)


print("== PQ-ADC (l2) — current: m=8 anchors=64 (recall 0.31) ==")
for m, na in [(8, 64), (8, 256), (16, 64), (16, 256), (32, 64), (16, 128)]:
    print(f"  m={m} anchors={na}: recall={pq_recall(m, na):.3f}")
print("== PQ-refine — current m=8 anchors=64 expand=20 (0.83) ==")
for m, na, ex in [(8, 64, 20), (16, 256, 10), (16, 64, 10)]:
    print(f"  m={m} anchors={na} expand={ex}: recall={pq_recall(m, na, ex):.3f}")


# ---- binary sign (Hamming vs cosine oracle) ----
def binary_recall(expand=None):
    bits = (X >= 0.0)
    qbits = (Q >= 0.0)
    ham = (bits[None, :, :] != qbits[:, None, :]).sum(-1)
    if expand is None:
        return recall([set(ids) for _ in range(N_QUERIES)], ham.astype(float), exact_cos)
    cands = []
    for qi in range(N_QUERIES):
        idx = np.lexsort((ids, ham[qi]))[: expand * K]
        cands.append(set(ids[idx]))
    return recall(cands, cos, exact_cos)


print("== binary sign (cosine) — current raw 0.21, refine(x10) 0.62 ==")
print(f"  raw: {binary_recall():.3f}")
for ex in [10, 20, 40, 80]:
    print(f"  refine expand={ex}: recall={binary_recall(ex):.3f}")
