"""Stage-by-stage anatomy of the batch segmax serving path on TPU.

Times cumulative prefixes of make_segmax_topk's pipeline at 8192 x 100k x
1024 so the expensive stage is unambiguous:

  sweep        raw segmax keys only
  topk         + lax.top_k over the (Q, C) candidate slab
  decode       + winner decode to global rows
  gather       + rescore-row gather
  rescore      + einsum + argsort + final slice (the full pipeline)

Each prefix is jitted separately and timed by the min-of-rounds amortized
protocol (6 dispatches + trailing fetch), interleaved across rounds so
relay drift cancels.

Usage: python bench/batch_anatomy.py [--out bench/results/batch_anatomy_r3.json]
"""

import set_path  # noqa: F401  (source-checkout import path)

import argparse
import json
import os
import sys
import time

import numpy as np


def amortize(fn, m, rounds):
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(m):
            out = fn()
        jax_block(out)
        best = min(best, (time.perf_counter() - t0) / m)
    return best


def jax_block(out):
    import jax

    jax.block_until_ready(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu.device import DeviceIndex
    from picovdb_tpu.utils import normalize_batch
    from picovdb_tpu.ops.pallas_scan import SEG, KEY_MIN, segmax_scan, \
        _from_sortable
    from picovdb_tpu.ops.exact import normalize_on_device

    rng = np.random.default_rng(0)
    data = normalize_batch(
        rng.standard_normal((args.n, args.dim), dtype=np.float32)
    )
    dev = DeviceIndex(args.dim, mixed_precision=True, int8_tier=False)
    dev.full_upload(data, np.ones(args.n, dtype=bool))
    f32, lp, mask = dev.vectors, dev.vectors_lp, dev.active
    qb = jax.device_put(
        rng.standard_normal((args.batch, args.dim), dtype=np.float32)
    )

    k, guard = args.topk, 6

    def stage_sweep(queries):
        q = normalize_on_device(queries)
        keys, ns = segmax_scan(q, lp, mask, None, raw=True)
        return keys

    def upto_topk(queries):
        q = normalize_on_device(queries)
        keys, ns = segmax_scan(q, lp, mask, None, raw=True)
        k_sel = min(k + guard, keys.shape[1])
        tk, ti = jax.lax.top_k(keys, k_sel)
        return tk, ti

    def upto_decode(queries):
        q = normalize_on_device(queries)
        keys, ns = segmax_scan(q, lp, mask, None, raw=True)
        k_sel = min(k + guard, keys.shape[1])
        tk, ti = jax.lax.top_k(keys, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * SEG + (tk & jnp.int32(SEG - 1))
        gidx = jnp.where(tk == jnp.int32(KEY_MIN), 0, gidx)
        return gidx

    def upto_gather(queries):
        gidx = upto_decode(queries)
        return jnp.take(f32, gidx, axis=0)

    def full(queries):
        q = normalize_on_device(queries)
        keys, ns = segmax_scan(q, lp, mask, None, raw=True)
        k_sel = min(k + guard, keys.shape[1])
        tk, ti = jax.lax.top_k(keys, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * SEG + (tk & jnp.int32(SEG - 1))
        empty = tk == jnp.int32(KEY_MIN)
        gidx = jnp.where(empty, 0, gidx)
        gathered = jnp.take(f32, gidx, axis=0)
        exact = jnp.einsum("qd,qkd->qk", q, gathered.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        exact = jnp.where(empty, -jnp.inf, exact)
        order = jnp.argsort(-exact, axis=1)
        vals = jnp.take_along_axis(exact, order, axis=1)[:, :k]
        idx = jnp.take_along_axis(gidx, order, axis=1)[:, :k]
        return vals, idx.astype(jnp.int32)

    cases = {
        "sweep": jax.jit(stage_sweep),
        "topk": jax.jit(upto_topk),
        "decode": jax.jit(upto_decode),
        "gather": jax.jit(upto_gather),
        "full": jax.jit(full),
    }
    for name, fn in cases.items():  # warm
        jax_block(fn(qb))

    results = {name: [] for name in cases}
    for _ in range(args.rounds):
        for name, fn in cases.items():
            results[name].append(amortize(lambda f=fn: f(qb), 4, 1))
    out = {}
    prev = 0.0
    for name in cases:
        ms = min(results[name]) * 1000
        out[name] = round(ms, 2)
        print(f"# {name:7s}: {ms:8.2f} ms  (+{ms - prev:7.2f})",
              file=sys.stderr)
        prev = ms
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
