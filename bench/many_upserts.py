"""Per-call upsert overhead: N single-item upsert calls.

Counterpart of the reference's bench/many_upserts.py (10k one-at-a-time
upserts).
"""

import argparse
import time

import numpy as np

import set_path  # noqa: F401
from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--db", default="bench_many_upserts_db")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=args.dim, storage_file=args.db)

    t0 = time.perf_counter()
    for i in range(args.n):
        db.upsert([{K_ID: str(i), K_VECTOR: data[i]}])
    dt = time.perf_counter() - t0
    print(f"{args.n} single upserts: {dt:.3f} s "
          f"({dt / args.n * 1e6:.1f} us/call, {args.n / dt:.0f} vec/s)")


if __name__ == "__main__":
    main()
