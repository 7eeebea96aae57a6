"""Stage-by-stage timing of the batch segmax serving path at 8192 x 100k.

bench/segmax_sweep_probe.py measured the raw key sweep at ~19 ms while the
full batch runs ~40 ms — this breaks the remainder into lax.top_k on the
packed-key slab, the rescore row gather, the rescore einsum, and the final
sort, so optimization lands on the measured sink rather than a guess.
Writes bench/results/segmax_stage_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import json
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

os.environ.setdefault("PICOVDB_COMPILE_CACHE", "/tmp/picovdb_xla_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["PICOVDB_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

Q, CAP, DIM, K = 8192, 102400, 1024, 10
ITERS = 8


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return round((time.perf_counter() - t0) / ITERS * 1e3, 2)


def main():
    print("STARTED", flush=True)
    from picovdb_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(Q, DIM)).astype(np.float32))
    qh = q.astype(jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(CAP, DIM)).astype(np.float32))
    v = vf.astype(jnp.bfloat16)
    mask = jnp.ones((CAP,), dtype=bool)

    res = {}

    sweep = jax.jit(lambda: ps.segmax_scan(qh, v, mask, None, raw=True)[0])
    keys = sweep()
    res["sweep_raw"] = timeit(sweep); print("sweep", res["sweep_raw"], flush=True)
    ns = 8  # bn=1024 pick at dim=1024 bf16
    k_sel = K + 6

    topk = jax.jit(lambda kk: jax.lax.top_k(kk, k_sel))
    tk, ti = topk(keys)
    res["lax_top_k_slab"] = timeit(topk, keys); print("topk", res["lax_top_k_slab"], flush=True)

    def decode(tk, ti):
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * ps.SEG + (tk & jnp.int32(ps.SEG - 1))
        return jnp.where(tk == jnp.int32(ps.KEY_MIN), 0, gidx)

    dj = jax.jit(decode)
    gidx = dj(tk, ti)
    res["decode"] = timeit(dj, tk, ti); print("decode", res["decode"], flush=True)

    take = jax.jit(lambda g: jnp.take(vf, g, axis=0))
    res["take_rows"] = timeit(take, gidx); print("take", res["take_rows"], flush=True)

    def rescore(g):
        gathered = jnp.take(vf, g, axis=0)
        return jnp.einsum("qd,qkd->qk", q, gathered.astype(jnp.float32),
                          preferred_element_type=jnp.float32)

    rj = jax.jit(rescore)
    res["take_plus_einsum"] = timeit(rj, gidx); print("take+einsum", res["take_plus_einsum"], flush=True)

    def final(ex, g):
        order = jnp.argsort(-ex, axis=1)
        vals = jnp.take_along_axis(ex, order, axis=1)[:, :K]
        idx = jnp.take_along_axis(g, order, axis=1)[:, :K]
        return vals, idx

    ex = rj(gidx)
    fj = jax.jit(final)
    res["final_sort"] = timeit(fj, ex, gidx); print("final", res["final_sort"], flush=True)

    full = ps.make_segmax_topk(K, None)
    res["full_impl"] = timeit(full, q, v, vf, mask)

    with open("bench/results/segmax_stage_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
