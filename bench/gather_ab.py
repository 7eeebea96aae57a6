"""A/B the batched include_vector gather on a device-born store.

VERDICT r4 #5: `get`/`get_all(include_vector=True)` on a lazy store used
to fetch ONE device row per record (engine `_host_row`) — a get_all over
a multi-million-row device-born store was thousands of relay round
trips. The batched path (DeviceIndex.fetch_rows via _host_rows_batch)
gathers the requested rows in one device program + one transfer per
chunk. This probe measures both on the same store:

  * batched: get_all(include_vector=True) over the full store
  * per-row: the legacy path emulated by calling _host_row per slot on a
    sample, scaled to the full store (running it in full would take
    hours through the relay — the point of the fix)

Usage:
  python bench/gather_ab.py --n 100000 --dim 1024 --storage-dtype int4 \
      [--sample 512] [--out bench/results/gather_ab_r5.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import set_path  # noqa: F401


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--storage-dtype", default="int4",
                   choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--sample", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="bench/results/gather_ab_r5.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    print("STARTED", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu import K_VECTOR, PicoVectorDB

    key = jax.random.PRNGKey(args.seed)
    vecs = jax.random.normal(key, (args.n, args.dim), dtype=jnp.float32)
    vecs = vecs / jnp.linalg.norm(vecs, axis=1, keepdims=True)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim, storage_file=f"{tmp}/gather_ab",
            storage_dtype=args.storage_dtype,
        )
        db.ingest_device(vecs, ids=[str(i) for i in range(args.n)],
                         normalize=False)
        assert db._host_lazy
        vecs = None

        # batched lane: one pass over the whole store
        t0 = time.perf_counter()
        rows = db.get_all(include_vector=True)
        batched_s = time.perf_counter() - t0
        assert len(rows) == args.n
        v7 = np.asarray(rows[7][K_VECTOR], dtype=np.float32)
        print(f"# batched get_all(include_vector=True) over {args.n}: "
              f"{batched_s:.2f} s", file=sys.stderr, flush=True)

        # legacy per-row lane on a sample, scaled
        rng = np.random.default_rng(args.seed + 1)
        sample = rng.integers(0, args.n, args.sample)
        t0 = time.perf_counter()
        for s in sample:
            db._host_row(int(s))
        per_row_sample_s = time.perf_counter() - t0
        per_row_full_s = per_row_sample_s / args.sample * args.n
        print(f"# per-row _host_row x{args.sample}: {per_row_sample_s:.2f} s "
              f"-> {per_row_full_s:.0f} s extrapolated over {args.n}",
              file=sys.stderr, flush=True)

        # correctness: batched row == per-row row
        r7 = np.asarray(db._host_row(7), dtype=np.float32)
        row_match = bool(np.allclose(v7, r7, atol=1e-6))

        out = {
            "metric": f"gather_ab_{args.n}x{args.dim}_{args.storage_dtype}",
            "batched_get_all_s": round(batched_s, 2),
            "per_row_sample_s": round(per_row_sample_s, 2),
            "per_row_sample": args.sample,
            "per_row_extrapolated_s": round(per_row_full_s, 0),
            "speedup_vs_per_row": round(per_row_full_s / batched_s, 1),
            "row_parity": row_match,
        }
        print(json.dumps(out))
        out_path = args.out
        if not os.path.isabs(out_path):
            out_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                out_path,
            )
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
