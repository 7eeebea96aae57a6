"""Bulk-upsert benchmark: insert N x dim random vectors, then save.

Counterpart of the reference's bench/upserts.py (100k x 1024-d bulk insert
+ save timing; README.md:69/81 numbers).
"""

import argparse
import os
import time

import numpy as np

import set_path  # noqa: F401
from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--db", default="bench_upserts_db")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    items = [{K_ID: str(i), K_VECTOR: data[i]} for i in range(args.n)]

    db = PicoVectorDB(embedding_dim=args.dim, storage_file=args.db)
    t0 = time.perf_counter()
    report = db.upsert(items)
    t1 = time.perf_counter()
    db.save()
    t2 = time.perf_counter()
    print(f"insert {args.n}x{args.dim}: {t1 - t0:.3f} s "
          f"({args.n / (t1 - t0):.0f} vec/s), save: {t2 - t1:.3f} s")
    assert len(report["insert"]) == args.n
    for suffix in (".ids.json", ".vecs.npy", ".meta.json"):
        path = args.db + suffix
        if os.path.exists(path):
            print(f"  {path}: {os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
