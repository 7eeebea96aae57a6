"""Measure the clip-guard worst case on a device-born quantized store.

VERDICT r4 #8: the int8-only IVF layout requantizes appends against FROZEN
build-time scales; appends outside the built dynamic range trip the clip
guard (PICOVDB_IVF_I8_CLIP_MAX) and the engine falls back to a full
rebuild. On a single-device device-born store that rebuild runs from the
RESIDENT corpus (no host materialization — `_rebuild_ann` passes
dev_vectors); this probe publishes the wall of each lane:

  * in-distribution epoch  — in-place maintenance (the O(changed) path)
  * drifted epoch          — guard refusal -> full rebuild from device

Usage:
  python bench/clip_guard_probe.py --n 4000000 --dim 1024 \
      --storage-dtype int8 [--out bench/results/clip_guard_r5.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import set_path  # noqa: F401

from ivf_scale import (  # noqa: E402
    make_mixture,
    make_mixture_device,
    make_mixture_device_i8,
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--rows", type=int, default=1000)
    p.add_argument("--storage-dtype", default="int8", choices=["int8"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="bench/results/clip_guard_r5.json")
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
    centers_dev = centers_dev / jnp.linalg.norm(
        centers_dev, axis=1, keepdims=True
    )
    t0 = time.perf_counter()
    corpus, scales = make_mixture_device_i8(args.n, args.dim, centers_dev, kd)
    corpus.block_until_ready()
    centers_host = np.array(centers_dev)
    del centers_dev
    print(f"# datagen (device): {time.perf_counter()-t0:.1f} s",
          file=sys.stderr, flush=True)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim, storage_file=f"{tmp}/clip_probe",
            index="ivf", storage_dtype=args.storage_dtype,
        )
        db.ingest_device(corpus, ids=[str(i) for i in range(args.n)],
                         normalize=False, scales=scales)
        corpus = scales = None
        t0 = time.perf_counter()
        db.rebuild_index()
        t_build = time.perf_counter() - t0
        assert db._ivf is not None
        print(f"# build: {t_build:.1f} s (nlist={db._ivf.nlist})",
              file=sys.stderr, flush=True)
        q = make_mixture(8, args.dim, centers_host,
                         np.random.default_rng(5))
        db.query(q[0], top_k=10)  # settle

        rng = np.random.default_rng(args.seed + 1)

        # lane 1: in-distribution epoch -> in-place maintenance
        rows = make_mixture(args.rows, args.dim, centers_host, rng)
        db.upsert_columnar(rows.copy(), ids=[f"in{i}" for i in
                                             range(args.rows)])
        t0 = time.perf_counter()
        with db._rwlock.write_lock():
            db._sync_device_locked()
        t_inplace = time.perf_counter() - t0
        mode_in = db._last_ann_rebuild_mode
        clip_in = db._ivf.last_update_clip_fraction
        hit = db.query(rows[0], top_k=1)[0][K_ID] == "in0"
        print(f"# in-distribution epoch: {t_inplace:.3f} s ({mode_in}), "
              f"clip {clip_in}, self-top1 {hit}", file=sys.stderr,
              flush=True)

        # lane 2: drifted epoch — one-hot rows concentrate all mass in a
        # single component, far past the mixture-tuned column scales ->
        # guard refusal -> full rebuild from the RESIDENT device corpus
        drift = np.zeros((args.rows, args.dim), np.float32)
        drift[np.arange(args.rows),
              rng.integers(0, args.dim, args.rows)] = 1.0
        db.upsert_columnar(drift.copy(),
                           ids=[f"dr{i}" for i in range(args.rows)])
        was_lazy = db._host_lazy
        t0 = time.perf_counter()
        with db._rwlock.write_lock():
            db._sync_device_locked()
        t_drift = time.perf_counter() - t0
        mode_dr = db._last_ann_rebuild_mode
        still_lazy = db._host_lazy
        hit2 = db.query(drift[0], top_k=1)[0][K_ID] == "dr0"
        hit3 = db.query(rows[1], top_k=1)[0][K_ID] == "in1"
        print(f"# drifted epoch: {t_drift:.1f} s ({mode_dr}), lazy "
              f"{was_lazy}->{still_lazy}, self-top1 drift {hit2} / "
              f"pre-drift {hit3}", file=sys.stderr, flush=True)

        out = {
            "metric": f"clip_guard_{args.n}x{args.dim}_"
                      f"{args.storage_dtype}",
            "build_s": round(t_build, 1),
            "inplace_epoch_s": round(t_inplace, 3),
            "inplace_mode": mode_in,
            "inplace_clip_fraction": clip_in,
            "drift_epoch_s": round(t_drift, 1),
            "drift_mode": mode_dr,
            "host_stayed_lazy": bool(still_lazy),
            "self_top1": bool(hit and hit2 and hit3),
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
