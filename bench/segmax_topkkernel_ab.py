"""A/B the serving batch path after the Pallas slab top-k swap.

Times the full `make_segmax_topk` (sweep -> slab top-k -> rescore) and a
variant forced onto the old `lax.top_k` slab path, at the headline shape
(8192 x 100k x 1024, bf16 mirror + f32 rescore). Data is generated on
device (the dev-harness relay moves ~30 MB/s — uploading a 400 MB corpus
dominates wall time otherwise). Also checks selection parity between the
two paths. Writes bench/results/segmax_topkkernel_ab_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import json
import os
import time

import jax
import jax.numpy as jnp

os.environ.setdefault("PICOVDB_COMPILE_CACHE", "/tmp/picovdb_xla_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["PICOVDB_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

Q, CAP, DIM, K = 8192, 102400, 1024, 10
ITERS = 8


def _chained(fn, q0, rest, iters):
    """Serialize `iters` dependent calls on device; return wall seconds.

    block_until_ready under-reports through the axon relay, so each call
    feeds a scalar from the previous result back into the query matrix
    (forcing device-side sequencing) and the clock stops on a single
    scalar fetch."""
    import numpy as np

    eps = jnp.float32(0.0)
    t0 = time.perf_counter()
    vals = None
    for _ in range(iters):
        vals, _ = fn(q0 + eps, *rest)
        eps = vals[0, 0] * jnp.float32(1e-12)
    float(np.asarray(vals[0, 0]))
    return time.perf_counter() - t0


def timeit(fn, *args):
    """Per-call ms from the slope between 8- and 32-iteration chains
    (cancels the one-off relay RTT on the closing scalar fetch)."""
    out = fn(*args)
    jax.block_until_ready(out)
    _chained(fn, args[0], args[1:], 1)  # compile the chained (q+eps) graph
    t8 = _chained(fn, args[0], args[1:], 8)
    t32 = _chained(fn, args[0], args[1:], 32)
    return round((t32 - t8) / 24 * 1e3, 2)


def main():
    print("STARTED", flush=True)
    from picovdb_tpu.ops import pallas_scan as ps
    from picovdb_tpu.ops.exact import normalize_on_device

    kq, kv = jax.random.split(jax.random.PRNGKey(0))
    q = normalize_on_device(jax.random.normal(kq, (Q, DIM), jnp.float32))
    vf = normalize_on_device(jax.random.normal(kv, (CAP, DIM), jnp.float32))
    v = vf.astype(jnp.bfloat16)
    mask = jnp.ones((CAP,), dtype=bool)
    jax.block_until_ready((q, vf, v))

    res = {}

    new = ps.make_segmax_topk(K, None, normalize=False)
    vals_n, idx_n = new(q, v, vf, mask)
    res["full_new_kernel_ms"] = timeit(new, q, v, vf, mask)
    print("new", res["full_new_kernel_ms"], flush=True)

    # old path: same pipeline but slab top-k through lax.top_k
    def old_impl(queries, scan_vectors, rescore_vectors, m):
        keys_t, ns = ps.segmax_scan(queries.astype(jnp.bfloat16)
                                    if scan_vectors.dtype == jnp.bfloat16
                                    else queries,
                                    scan_vectors, m, None, raw_t=True)
        k_sel = min(K + 6, keys_t.shape[0])
        tk, ti = jax.lax.top_k(keys_t.T, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * ps.SEG + (tk & jnp.int32(ps.SEG - 1))
        empty = tk == jnp.int32(ps.KEY_MIN)
        gidx = jnp.where(empty, 0, gidx)
        gathered = jnp.take(rescore_vectors, gidx, axis=0)
        exact = jnp.einsum("qd,qkd->qk", queries,
                           gathered.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        exact = jnp.where(empty, -jnp.inf, exact)
        order = jnp.argsort(-exact, axis=1)
        vals = jnp.take_along_axis(exact, order, axis=1)[:, :K]
        idx = jnp.take_along_axis(gidx, order, axis=1)[:, :K]
        return vals, idx.astype(jnp.int32)

    old = jax.jit(old_impl)
    vals_o, idx_o = old(q, v, vf, mask)
    res["full_old_laxtopk_ms"] = timeit(old, q, v, vf, mask)
    print("old", res["full_old_laxtopk_ms"], flush=True)

    agree = float(jnp.mean((idx_n == idx_o).all(axis=1).astype(jnp.float32)))
    res["row_agreement"] = round(agree, 5)
    res["max_val_diff"] = float(jnp.max(jnp.abs(vals_n - vals_o)))

    with open("bench/results/segmax_topkkernel_ab_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
