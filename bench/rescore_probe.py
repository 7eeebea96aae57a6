"""Host-f64 exact rescore tier: recall + latency A/B on the real chip.

Measures the lossy-storage recall story the tier exists for (the
reference stores f32 and ranks exactly, picovdb/pico_vdb.py:683-713;
this framework's int8 storage tier quadruples capacity but ranks from
quantized scores without it):

  * random corpus (the realistic case): device-only vs host-rescore
    recall@10 against the f64 oracle of the ORIGINAL f32 rows
  * clustered near-duplicate corpus (the adversarial case that drove the
    guard/escalation design)
  * latency overhead per query batch for both modes

Writes bench/results/rescore_r3.json.

Usage: python bench/rescore_probe.py [--n 500000] [--dim 1024]
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np

import set_path  # noqa: F401

from picovdb_tpu import PicoVectorDB, K_ID
from picovdb_tpu.utils import normalize_batch


def build(path, data, mode, storage_dtype="int8"):
    db = PicoVectorDB(
        embedding_dim=data.shape[1], storage_file=path,
        storage_dtype=storage_dtype, index="exact", rescore=mode,
    )
    t0 = time.time()
    db.upsert_columnar(
        ids=[str(i) for i in range(len(data))], vectors=data
    )
    return db, time.time() - t0


def recall_and_wall(db, q, s, k=10, iters=3):
    kth = -np.sort(-s, axis=1)[:, k - 1]
    walls = []
    for _ in range(iters):
        t0 = time.time()
        got = db.query(q, top_k=k)
        walls.append(time.time() - t0)
    hits = sum(
        sum(s[i, int(r[K_ID])] >= kth[i] for r in res)
        for i, res in enumerate(got)
    )
    return hits / (len(q) * k), min(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--nq", type=int, default=32)
    ap.add_argument("--storage-dtype", default="int8",
                    help="lossy tier under test (int8 or int4)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    rng = np.random.default_rng(11)
    td = tempfile.mkdtemp()
    out = {"n": args.n, "dim": args.dim, "nq": args.nq,
           "storage_dtype": args.storage_dtype, "cases": {}}

    print("STARTED", flush=True)
    for case in ("random", "clustered"):
        if case == "random":
            data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
        else:
            centers = rng.normal(size=(args.n // 250, args.dim)).astype(
                np.float32
            )
            data = centers[
                rng.integers(0, len(centers), args.n)
            ] + 0.02 * rng.normal(size=(args.n, args.dim)).astype(np.float32)
        data = normalize_batch(data)
        q = (
            data[rng.integers(0, args.n, args.nq)]
            + 0.005 * rng.normal(size=(args.nq, args.dim)).astype(np.float32)
        ).astype(np.float32)
        stored = normalize_batch(data.copy())
        s = (
            normalize_batch(q.copy()).astype(np.float64)
            @ stored.astype(np.float64).T
        )
        res = {}
        for mode in ("device", "host"):
            db, t_build = build(
                os.path.join(td, f"{case}_{mode}"), data, mode,
                args.storage_dtype,
            )
            r, wall = recall_and_wall(db, q, s)
            res[mode] = {
                "recall_at_10": r,
                "batch_wall_ms": round(1000 * wall, 2),
                "per_query_ms": round(1000 * wall / args.nq, 3),
                "escalations": db.stats()["rescore_escalations"],
                "build_s": round(t_build, 1),
            }
            print(f"{case}/{mode}: recall={r:.4f} "
                  f"wall={1000*wall:.1f} ms "
                  f"esc={res[mode]['escalations']}", flush=True)
            del db
        out["cases"][case] = res

    path = args.out or os.path.join(
        os.path.dirname(__file__), "results", "rescore_r3.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
