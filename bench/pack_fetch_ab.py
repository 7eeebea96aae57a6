"""Interleaved A/B of the packed result fetch (PICOVDB_PACK_FETCH).

r3 added `DeviceIndex.pack_results`: the serving lanes fetch ONE
(Q, 2k) int32 buffer per chunk (scores bitcast into the first k columns)
instead of separate score/index arrays, halving the per-transfer fixed
cost the dev-harness relay charges. The TPU outage blocked the planned
hardware measurement (NOTES_r4.md #1); this probe interleaves
packed/unpacked `query_columnar` rounds in one process (the env is read
per call) so relay drift hits both arms.

Usage: python bench/pack_fetch_ab.py [--n 100000] [--queries 32768]
Writes bench/results/pack_fetch_ab_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--queries", type=int, default=32_768)
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--out", default="bench/results/pack_fetch_ab_r3.json")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import tempfile

    from picovdb_tpu import PicoVectorDB

    rng = np.random.default_rng(0)
    data = rng.standard_normal((args.n, args.dim), dtype=np.float32)
    queries = rng.standard_normal((args.queries, args.dim), dtype=np.float32)

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim, storage_file=f"{tmp}/ab", index="exact"
        )
        db.upsert_columnar(data, ids=[str(i) for i in range(args.n)],
                           copy=False)
        q_dev = jax.device_put(queries)

        def run(pack: bool) -> float:
            os.environ["PICOVDB_PACK_FETCH"] = "1" if pack else "0"
            t0 = time.perf_counter()
            db.query_columnar(q_dev, top_k=args.topk,
                              batch_size=args.batch_size)
            return time.perf_counter() - t0

        run(True), run(False)  # warm both arms (compiles + pipe)
        packed, unpacked = [], []
        for _ in range(args.rounds):
            packed.append(run(True))
            unpacked.append(run(False))
        os.environ.pop("PICOVDB_PACK_FETCH", None)

        out = {
            "packed_ms": round(min(packed) * 1000, 1),
            "unpacked_ms": round(min(unpacked) * 1000, 1),
            "packed_qps": round(args.queries / min(packed), 0),
            "unpacked_qps": round(args.queries / min(unpacked), 0),
            "speedup_packed": round(min(unpacked) / min(packed), 3),
            "rounds_packed_ms": [round(t * 1000, 1) for t in packed],
            "rounds_unpacked_ms": [round(t * 1000, 1) for t in unpacked],
        }
        print(json.dumps(out))
        for k2, v in out.items():
            print(f"# {k2}: {v}", file=sys.stderr)
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
