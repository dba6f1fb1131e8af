"""Recall/nprobe sweep for the frozen trained IVF codebook (VERDICT r5 #4).

Measures recall@3 vs the exact brute-force cosine top-3 at every probe
width, using a numpy mirror of EXACTLY the engine construction — the frozen
``engine.ann_codebook.TRAINED_CQ`` centroids, floor(x*1000) quantization,
quantized squared-L2 probe ranking with ties -> lowest cid, and cosine
re-ranking with ties -> lowest neighbor id — so the curve describes the real
index (the operating point itself is additionally pinned through the actual
Spark query in tests/test_ann_index.py).

Two evaluations:
- ``heldout``:  the registry construction — queries are vec_id < 10, the
  index holds vec_id >= 10.
- ``incorpus``: every indexed vector queries the index with itself excluded
  (490 queries at sf0.01) — the smoother curve.

Writes BENCH/ivf_recall.json and prints the table. The operating point
(smallest nprobe with heldout recall >= 0.8) must match
``engine.ann.IVF_NPROBE_HIGH_RECALL``.

    python scripts/sweep_ivf_recall.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from engine.ann_codebook import TRAINED_CQ  # noqa: E402

K = 3
NPROBES = list(range(1, 17))


def _quant(e: np.ndarray) -> np.ndarray:
    return np.floor(e * 1000)


def _topk(qv, ids, X, k=K, exclude=None):
    sims = (X @ qv) / (np.linalg.norm(X, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((ids, -sims))  # sim DESC, neighbor_id ASC — engine tie-break
    out = []
    for i in order:
        if exclude is not None and ids[i] == exclude:
            continue
        out.append(ids[i])
        if len(out) == k:
            break
    return set(out)


def sweep(sf_dir: str) -> dict:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vid = np.array(t["vec_id"])
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cq = np.array(TRAINED_CQ, dtype=np.float64)

    corp_ids, corp = vid[vid >= 10], emb[vid >= 10]
    # argmin over quantized L2 returns the FIRST minimum = lowest cid, the
    # training/probing tie-break
    lists = ((_quant(corp)[:, None, :] - cq[None, :, :]) ** 2).sum(-1).argmin(1)

    def probe_order(qv):
        return np.argsort(((_quant(qv) - cq) ** 2).sum(-1), kind="stable")

    out = {"sf": os.path.basename(sf_dir.rstrip("/")), "k": K, "nlists": len(cq)}
    for label, q_ids, qs in (
        ("heldout", vid[vid < 10], emb[vid < 10]),
        ("incorpus", corp_ids, corp),
    ):
        exact = {
            qid: _topk(qv, corp_ids, corp,
                       exclude=qid if label == "incorpus" else None)
            for qid, qv in zip(q_ids, qs)
        }
        curve = {}
        for nprobe in NPROBES:
            hit = tot = 0
            for qid, qv in zip(q_ids, qs):
                m = np.isin(lists, probe_order(qv)[:nprobe])
                if label == "incorpus":
                    m = m & (corp_ids != qid)
                got = _topk(qv, corp_ids[m], corp[m]) if m.sum() else set()
                hit += len(got & exact[qid])
                tot += len(exact[qid])
            curve[nprobe] = round(hit / tot, 4)
        out[label] = {"n_queries": int(len(q_ids)), "recall_at_3": curve}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "ivf_recall.json"))
    args = ap.parse_args()

    result = sweep(args.sf)
    heldout = result["heldout"]["recall_at_3"]
    op = next((n for n in NPROBES if heldout[n] >= 0.8), None)
    result["operating_point"] = {
        "rule": "smallest nprobe with heldout recall@3 >= 0.8",
        "nprobe": op,
        "heldout_recall": heldout.get(op),
        "incorpus_recall": result["incorpus"]["recall_at_3"].get(op),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"{'nprobe':>7} {'heldout':>8} {'incorpus':>9}")
    for n in NPROBES:
        mark = "  <- operating point" if n == op else ""
        print(f"{n:>7} {heldout[n]:>8} "
              f"{result['incorpus']['recall_at_3'][n]:>9}{mark}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
