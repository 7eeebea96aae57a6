"""Quantized persistence at the capacity tier: walls + bounded host RAM.

VERDICT r4 #2: `save()` used to materialize the full f32 host matrix
(~32.8 GB at 8M x 1024 int4) — the framework's capacity story had
outgrown its checkpoint story. The quantized checkpoint
(persistence.save_quantized_atomic) streams the packed device plane +
per-row scales to disk chunk by chunk instead. This probe publishes:

  * save wall + peak-RSS delta across the save (bounded-host-RAM claim)
  * on-disk bytes (packed plane + scales + ids/meta [+ ANN sidecar])
  * reload wall (memmapped plane streamed host->HBM)
  * top-k parity original vs reloaded store (+ recall vs the original)

Usage:
  python bench/qsave_probe.py --n 8000000 --dim 1024 --storage-dtype int4 \
      [--index ivf] [--out bench/results/qsave_8m_i4_r5.json]
"""

import argparse
import gc
import json
import os
import resource
import sys
import time

import numpy as np

import set_path  # noqa: F401

from ivf_scale import (  # noqa: E402
    make_mixture,
    make_mixture_device_i4,
    make_mixture_device_i8,
)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--storage-dtype", default="int4",
                   choices=["int8", "int4"])
    p.add_argument("--index", default="ivf", choices=["exact", "ivf"])
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dir", default="/root/qsave_probe")
    p.add_argument("--out", default="bench/results/qsave_8m_i4_r5.json")
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

    from picovdb_tpu import K_ID, PicoVectorDB

    key = jax.random.PRNGKey(args.seed)
    kc, kd = jax.random.split(key)
    centers_dev = jax.random.normal(kc, (args.centers, args.dim),
                                    dtype=jnp.float32)
    centers_dev = centers_dev / jnp.linalg.norm(centers_dev, axis=1,
                                                keepdims=True)
    gen = (make_mixture_device_i4 if args.storage_dtype == "int4"
           else make_mixture_device_i8)
    t0 = time.perf_counter()
    corpus, scales = gen(args.n, args.dim, centers_dev, kd)
    corpus.block_until_ready()
    centers_host = np.array(centers_dev)
    del centers_dev
    print(f"# datagen (device): {time.perf_counter()-t0:.1f} s",
          file=sys.stderr, flush=True)

    os.makedirs(args.dir, exist_ok=True)
    base = os.path.join(args.dir, "qsave_probe")
    db = PicoVectorDB(
        embedding_dim=args.dim, storage_file=base,
        index=args.index, storage_dtype=args.storage_dtype,
    )
    db.ingest_device(corpus, ids=[str(i) for i in range(args.n)],
                     normalize=False, scales=scales)
    corpus = scales = None
    if args.index == "ivf":
        t0 = time.perf_counter()
        db.rebuild_index()
        print(f"# ivf build: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr, flush=True)

    queries = make_mixture(16, args.dim, centers_host,
                           np.random.default_rng(args.seed + 7))
    res0 = db.query(queries, top_k=args.topk)
    ids0 = [[h[K_ID] for h in r] for r in res0]

    rss_before = rss_gb()
    t0 = time.perf_counter()
    # the auto policy engages this path on lazy capacity stores past
    # PICOVDB_QSAVE_AUTO_GB; explicit here so small smoke runs take the
    # same lane as the 8M chip run
    db.save(quantized=True)
    save_s = time.perf_counter() - t0
    rss_after = rss_gb()
    files = {}
    for f in sorted(os.listdir(args.dir)):
        files[f] = os.path.getsize(os.path.join(args.dir, f))
    disk_gb = sum(files.values()) / 2**30
    print(f"# save: {save_s:.1f} s | peak-RSS delta "
          f"{rss_after - rss_before:.2f} GiB (before {rss_before:.2f}) | "
          f"disk {disk_gb:.2f} GiB", file=sys.stderr, flush=True)

    was_lazy = db._host_lazy
    del db
    gc.collect()

    t0 = time.perf_counter()
    db2 = PicoVectorDB(embedding_dim=args.dim, storage_file=base,
                       index=args.index, storage_dtype=args.storage_dtype)
    load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res1 = db2.query(queries, top_k=args.topk)
    q_s = time.perf_counter() - t0
    ids1 = [[h[K_ID] for h in r] for r in res1]
    parity = float(np.mean([
        len(set(a) & set(b)) / max(1, len(a))
        for a, b in zip(ids0, ids1)
    ]))
    print(f"# reload: {load_s:.1f} s | first query {q_s*1000:.0f} ms | "
          f"top-{args.topk} parity vs original {parity:.4f}",
          file=sys.stderr, flush=True)

    out = {
        "metric": f"qsave_{args.n}x{args.dim}_{args.storage_dtype}"
                  f"_{args.index}",
        "save_s": round(save_s, 1),
        "save_rss_delta_gib": round(rss_after - rss_before, 2),
        "rss_before_gib": round(rss_before, 2),
        "disk_gib": round(disk_gb, 2),
        "f32_matrix_would_be_gib": round(args.n * args.dim * 4 / 2**30, 1),
        "reload_s": round(load_s, 1),
        "first_query_ms": round(q_s * 1000, 0),
        "topk_parity_vs_original": parity,
        "store_was_lazy": bool(was_lazy),
        "files": files,
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
