"""Dissect the dirty-epoch maintenance cost of the quantized IVF tier.

Round-4 finding (bench/results/ivf8m_i4_incr_r4c.log): a 1000-row epoch on
the 8M x 1024 int4+IVF store cost 35.7 s — 1.25x the full warm rebuild, not
the O(changed) the virtual-mesh A/B promises. This probe separates the
suspects by running SEVERAL epochs with per-phase walls:

  * epoch 1 pays any first-time XLA specializations (scatter jits at the
    capacity shapes, probe kernel rebuilds) — if later epochs are fast the
    cost is compilation, not copies;
  * `jax_log_compiles` + warning capture attribute each slow phase to a
    compile or a failed-donation copy;
  * phases: upsert (host bookkeeping) / sync (device scatter + IVF update,
    via a bare `rebuild-less` query) / steady query.

Usage:
  python bench/incr_probe.py --n 2000000 --storage-dtype int4 --epochs 3
"""

import argparse
import json
import logging
import sys
import time
import warnings

import numpy as np

import set_path  # noqa: F401

from ivf_scale import (  # noqa: E402
    make_mixture,
    make_mixture_device,
    make_mixture_device_i4,
    make_mixture_device_i8,
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--storage-dtype", default="int4",
                   choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--rows", type=int, default=1000)
    p.add_argument("--nlist", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-compiles", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    if args.log_compiles:
        jax.config.update("jax_log_compiles", True)
        logging.basicConfig(level=logging.WARNING)
        logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
        logging.getLogger("jax._src.interpreters.pxla").setLevel(
            logging.WARNING)

    from picovdb_tpu import K_ID, PicoVectorDB

    key = jax.random.PRNGKey(args.seed)
    kc, kd, kq = jax.random.split(key, 3)
    centers_dev = jax.random.normal(kc, (args.centers, args.dim),
                                    dtype=jnp.float32)
    centers_dev = centers_dev / jnp.linalg.norm(centers_dev, axis=1,
                                                keepdims=True)
    t0 = time.perf_counter()
    scales = None
    if args.storage_dtype == "int8":
        corpus, scales = make_mixture_device_i8(args.n, args.dim,
                                                centers_dev, kd)
    elif args.storage_dtype == "int4":
        corpus, scales = make_mixture_device_i4(args.n, args.dim,
                                                centers_dev, kd)
    else:
        sdt = jnp.bfloat16 if args.storage_dtype == "bfloat16" else None
        corpus = make_mixture_device(args.n, args.dim, centers_dev, kd,
                                     out_dtype=sdt, normalize=True)
    corpus.block_until_ready()
    q_dev = make_mixture_device(8, args.dim, centers_dev, kq)
    queries = np.array(q_dev)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    centers_host = np.array(centers_dev)
    del q_dev, centers_dev
    print(f"# datagen (device): {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim,
            storage_file=f"{tmp}/incr_probe",
            index="ivf",
            ivf_nlist=args.nlist or None,
            storage_dtype=args.storage_dtype,
        )
        t0 = time.perf_counter()
        db.ingest_device(corpus, ids=[str(i) for i in range(args.n)],
                         normalize=False, scales=scales)
        corpus = scales = None
        print(f"# insert: {time.perf_counter()-t0:.2f} s", file=sys.stderr)
        t0 = time.perf_counter()
        db.rebuild_index()
        t_build = time.perf_counter() - t0
        print(f"# build: {t_build:.1f} s (nlist={db._ivf.nlist})",
              file=sys.stderr)

        k = 10
        db.query(queries[0], top_k=k)  # settle/warm
        t0 = time.perf_counter()
        db.query(queries[1], top_k=k)
        t_clean = time.perf_counter() - t0
        print(f"# clean query: {t_clean*1000:.1f} ms", file=sys.stderr)

        rng = np.random.default_rng(args.seed + 1)
        epochs = []
        for e in range(args.epochs):
            new_rows = make_mixture(args.rows, args.dim, centers_host, rng)
            ids = [f"e{e}_{i}" for i in range(args.rows)]
            t0 = time.perf_counter()
            db.upsert_columnar(new_rows.copy(), ids=ids)
            t_up = time.perf_counter() - t0
            with warnings.catch_warnings(record=True) as wlog:
                warnings.simplefilter("always")
                t0 = time.perf_counter()
                # isolate the sync itself (scatter + IVF update): this is
                # the maintenance the first dirty query pays
                with db._rwlock.write_lock():
                    db._sync_device_locked()
                t_sync = time.perf_counter() - t0
            donate_warns = [str(w.message) for w in wlog
                            if "donated" in str(w.message)]
            t0 = time.perf_counter()
            db.query(queries[2], top_k=k)
            t_q = time.perf_counter() - t0
            mode = db._last_ann_rebuild_mode
            hit = db.query(new_rows[0], top_k=1)[0][K_ID] == ids[0]
            print(f"# epoch {e}: upsert {t_up:.3f} s | sync {t_sync:.3f} s "
                  f"({mode}) | query {t_q*1000:.1f} ms | self-top1 {hit} | "
                  f"donate-warns {len(donate_warns)}", file=sys.stderr)
            for w in donate_warns:
                print(f"#   {w}", file=sys.stderr)
            epochs.append({"upsert_s": round(t_up, 3),
                           "sync_s": round(t_sync, 3),
                           "query_ms": round(t_q * 1000, 2),
                           "mode": mode, "self_top1": bool(hit),
                           "donate_warnings": donate_warns})
        print(json.dumps({
            "metric": f"incr_probe_{args.n}x{args.dim}_{args.storage_dtype}",
            "build_s": round(t_build, 1),
            "clean_query_ms": round(t_clean * 1000, 2),
            "epochs": epochs,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
