"""Anatomy of the e2e host->dicts lane: where does the wall go?

Splits the bench.py e2e lane (32768 host f32 queries -> list-of-dicts)
into its phases on the real chip: wire encode, dispatch (device_put +
compute launch, async), transfer drain (block on last chunk), and host
assembly — so the relay-CPU vs link-bytes vs Python-assembly split is
measured, not guessed. The phases overlap in the real lane; this probe
serializes them to bound each one.

Usage: python bench/e2e_anatomy.py [--n 100000] [--queries 32768]
"""
import argparse
import sys
import time

import numpy as np

import set_path  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--queries", type=int, default=32768)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=2048)
    args = p.parse_args()
    print("STARTED", file=sys.stderr, flush=True)

    import tempfile

    from picovdb_tpu import PicoVectorDB

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    ids = [f"r{i}" for i in range(args.n)]
    with tempfile.TemporaryDirectory() as td:
        db = PicoVectorDB(
            embedding_dim=args.dim, storage_file=f"{td}/s",
            capacity=args.n,
        )
        db.upsert_columnar(vecs, ids=ids, copy=False)
        q = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
        # warm every executable
        db.query_batched(q[:4096], top_k=args.topk,
                         batch_size=args.batch_size)

        # full lane (what bench.py times)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = db.query_batched(q, top_k=args.topk,
                                   batch_size=args.batch_size)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        print(f"full lane: {wall*1e3:.0f} ms -> {args.queries/wall:.0f} QPS")

        # phase 1: wire encode
        t0 = time.perf_counter()
        wp = db._wire_encode(q, args.queries)
        t_enc = time.perf_counter() - t0
        print(f"encode ({wp.dtype}, {wp.nbytes/1e6:.0f} MB): "
              f"{t_enc*1e3:.0f} ms")

        # phase 2: upload only (device_put all chunks, block)
        import jax
        for _ in range(2):
            t0 = time.perf_counter()
            devs = [jax.device_put(wp[i:i + args.batch_size])
                    for i in range(0, args.queries, args.batch_size)]
            for d in devs:
                d.block_until_ready()
            t_up = time.perf_counter() - t0
        print(f"upload {wp.nbytes/1e6:.0f} MB chunked: {t_up*1e3:.0f} ms "
              f"-> {wp.nbytes/1e6/t_up:.1f} MB/s")
        del devs

        # phase 3: device compute+fetch with device-resident queries
        qd = jax.device_put(q)
        jax.block_until_ready(qd)
        t0 = time.perf_counter()
        cols = db.query_columnar(qd, top_k=args.topk)
        t_dev = time.perf_counter() - t0
        print(f"device compute + columnar fetch: {t_dev*1e3:.0f} ms")

        # phase 4: dict assembly from device-resident queries
        t0 = time.perf_counter()
        res2 = db.query_batched(qd, top_k=args.topk,
                                batch_size=args.batch_size)
        t_dict = time.perf_counter() - t0
        print(f"device->dicts (compute + fetch + assembly): "
              f"{t_dict*1e3:.0f} ms")
        sys.stdout.flush()
        assert res[0][0]["_id_"] == res2[0][0]["_id_"]
    return 0


if __name__ == "__main__":
    sys.exit(main())
