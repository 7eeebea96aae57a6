"""A/B: the pipelined serving lanes with vs without the ANN tier (TPU).

The fifth-session change routes `query_batched`/`query_columnar` chunks
through the IVF tier under the same rule as `query` (reference role:
FAISS serves its batch queries too, picovdb/pico_vdb.py:716-751). This
measures that end-to-end on one chip at 2M x 1024 bf16: per-call wall of
`query_batched` at small Q through the probe scan vs the exact sweep on
the SAME store (whitebox index-kind flip between arms; the store and
mirrors are identical). The dev-harness relay adds a common-mode
~27-35 ms RTT to both arms, so report medians and the device-side delta.

Usage: python bench/lane_ivf_ab.py [--n 2000000] [--qs 1,8] [--iters 48]
"""

import argparse
import json
import sys
import time

import numpy as np

import set_path  # noqa: F401


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--qs", default="1,8")
    p.add_argument("--nprobe", type=int, default=128)
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="bench/results/lane_ivf_ab_r3.json")
    args = p.parse_args()
    qs = [int(x) for x in args.qs.split(",")]

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ivf_scale import make_mixture_device
    from picovdb_tpu import PicoVectorDB

    print("STARTED", flush=True)
    key = jax.random.PRNGKey(args.seed)
    kc, kd, kq = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (args.centers, args.dim), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
    t0 = time.perf_counter()
    corpus = make_mixture_device(args.n, args.dim, centers, kd,
                                 out_dtype=jnp.bfloat16, normalize=True)
    corpus.block_until_ready()
    qmax = max(qs)
    q_dev = make_mixture_device(max(qmax, 8), args.dim, centers, kq)
    queries = np.array(q_dev)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    del q_dev, centers
    print(f"# datagen (device): {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)

    import tempfile

    out = {"n": args.n, "dim": args.dim, "nprobe": args.nprobe,
           "topk": args.topk}
    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim, storage_file=f"{tmp}/db",
            storage_dtype="bfloat16", index="ivf", ivf_nprobe=args.nprobe,
        )
        ids = [str(i) for i in range(args.n)]
        t0 = time.perf_counter()
        db.ingest_device(corpus, ids=ids, normalize=False)
        print(f"# ingest: {time.perf_counter()-t0:.1f} s", file=sys.stderr)
        t0 = time.perf_counter()
        db.rebuild_index()
        print(f"# ivf build: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
        assert db._ivf is not None

        def arm(kind, q):
            db._index_kind = kind
            res = db.query_batched(q, top_k=args.topk)  # warm/compile
            walls = []
            for _ in range(args.iters):
                t = time.perf_counter()
                db.query_batched(q, top_k=args.topk)
                walls.append(time.perf_counter() - t)
            return res, float(np.median(walls) * 1000)

        for nq in qs:
            q = np.ascontiguousarray(queries[:nq])
            res_i, ms_i = arm("ivf", q)
            assert db._last_topk_strategy.startswith("ivf"), (
                db._last_topk_strategy
            )
            res_e, ms_e = arm("exact", q)
            assert not db._last_topk_strategy.startswith("ivf")
            overlap = np.mean([
                len({h["_id_"] for h in a} & {h["_id_"] for h in b})
                / args.topk
                for a, b in zip(res_i, res_e)
            ])
            out[f"q{nq}_ivf_wall_ms"] = round(ms_i, 2)
            out[f"q{nq}_exact_wall_ms"] = round(ms_e, 2)
            out[f"q{nq}_delta_ms"] = round(ms_e - ms_i, 2)
            out[f"q{nq}_overlap"] = round(float(overlap), 4)
            print(f"# Q={nq}: ivf {ms_i:.1f} ms vs exact {ms_e:.1f} ms "
                  f"(delta {ms_e-ms_i:+.1f} ms, common-mode relay RTT "
                  f"included); hit overlap {overlap:.3f}", file=sys.stderr)
        db._index_kind = "ivf"

    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
