"""Tile-shape sweep for the segmax corpus scan at 8192 x 100k x 1024.

The raw key sweep measures ~19 ms (bench/results/segmax_sweep_r3.json) vs
a ~10 ms HBM+MXU floor for bf16 at qt=256/bn=1024; this sweeps (qt, bn)
and grid order to find how much is per-grid-step overhead vs VPU segment
extraction, using on-device datagen and the dependency-chained slope
timer (the axon relay under-reports block_until_ready and uploads at
~30 MB/s). Writes bench/results/segmax_tile_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("PICOVDB_COMPILE_CACHE", "/tmp/picovdb_xla_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["PICOVDB_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

Q, CAP, DIM = 8192, 102400, 1024


def slope_ms(fn, q0, rest):
    """Per-call ms via 8-vs-32 dependency-chained device loops."""
    def chain(iters):
        eps = jnp.float32(0.0)
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(q0 + eps, *rest)
            eps = (out[0, 0] % jnp.int32(3)).astype(jnp.float32) * 1e-12
        float(np.asarray(out[0, 0]))
        return time.perf_counter() - t0

    jax.block_until_ready(fn(q0, *rest))
    chain(1)
    t8 = chain(8)
    t32 = chain(32)
    return round((t32 - t8) / 24 * 1e3, 2)


def main():
    print("STARTED", flush=True)
    from picovdb_tpu.ops import pallas_scan as ps
    from picovdb_tpu.ops.exact import normalize_on_device

    kq, kv = jax.random.split(jax.random.PRNGKey(0))
    q = normalize_on_device(
        jax.random.normal(kq, (Q, DIM), jnp.float32)
    ).astype(jnp.bfloat16)
    v = normalize_on_device(
        jax.random.normal(kv, (CAP, DIM), jnp.float32)
    ).astype(jnp.bfloat16)
    mask = jnp.ones((CAP,), dtype=bool)
    jax.block_until_ready((q, v))

    res = {}
    for qt, bn, stream in (
        (256, 1024, False),   # production default pick
        (256, 1024, True),
        (512, 1024, False),
        (256, 2048, False),   # needs the raised budget below
        (512, 2048, False),
        (128, 1024, False),
    ):
        tag = f"qt{qt}_bn{bn}" + ("_s" if stream else "")

        def fn(qq, vv, mm, _qt=qt, _bn=bn, _st=stream):
            keys, _ = ps.segmax_scan(qq, vv, mm, None, qt=_qt, bn=_bn,
                                     raw_t=True, stream=_st)
            return keys

        j = jax.jit(fn)
        # larger tiles than the 9 MB model allows: raise the budget for
        # this trace only (read at trace time inside segmax_scan)
        os.environ["PICOVDB_SEGMAX_BUDGET_MB"] = "14" if bn > 1024 else "9"
        try:
            res[tag] = slope_ms(j, q, (v, mask))
        except Exception as e:  # noqa: BLE001
            res[tag] = f"ERR {type(e).__name__}: {str(e)[:80]}"
        print(tag, res[tag], flush=True)

    with open("bench/results/segmax_tile_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
