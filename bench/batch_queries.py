"""Batched query throughput.

Counterpart of the reference's bench/batch_queries.py (20 batches x 50
queries over 100k x 1024-d; README.md:71/83 numbers), plus this framework's
throughput modes (query_batched / query_columnar).
"""

import argparse
import time

import numpy as np

import set_path  # noqa: F401
from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--topk", type=int, default=10)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    data = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=args.dim, storage_file="bench_batch_db")
    db.upsert([{K_ID: str(i), K_VECTOR: data[i]} for i in range(args.n)])

    total_q = args.batches * args.batch
    qs = rng.normal(size=(total_q, args.dim)).astype(np.float32)
    db.query(qs[:args.batch], top_k=args.topk)  # warm

    t0 = time.perf_counter()
    for b in range(args.batches):
        db.query(qs[b * args.batch : (b + 1) * args.batch], top_k=args.topk)
    dt = time.perf_counter() - t0
    print(f"reference mode ({args.batches}x{args.batch} query calls): "
          f"{dt:.3f} s -> {total_q/dt:.0f} QPS")

    t0 = time.perf_counter()
    db.query_batched(qs, top_k=args.topk)
    dt = time.perf_counter() - t0
    print(f"query_batched (pipelined dicts): {dt:.3f} s -> {total_q/dt:.0f} QPS")

    t0 = time.perf_counter()
    db.query_columnar(qs, top_k=args.topk)
    dt = time.perf_counter() - t0
    print(f"query_columnar (serving): {dt:.3f} s -> {total_q/dt:.0f} QPS")


if __name__ == "__main__":
    main()
