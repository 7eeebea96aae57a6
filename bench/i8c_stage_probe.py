"""Stage-level timing of the column-scaled int8 batch segmax pipeline.

The r3b A/B measured the full i8c batch path at 42.9 ms vs bf16's 32.6 at
8192 x 100k x 1024 — yet the corrected dot-floor probe (same slope-timing
methodology) shows the s8 dot at 4.5-5.6 ms vs bf16's 8.3-10, and bf16's
whole key sweep at 13.0 ms. This probe times each i8c stage in isolation
to find where the >10 ms goes:

  * fold_queries_i8 (normalize + column-fold + per-row quantize of the
    8192 x 1024 query batch)
  * segmax_scan_i8c raw key sweep, pre-quantized queries
  * segmax_scan (bf16) raw key sweep — the incumbent
  * topk_packed_keys on the emitted slab
  * full make_segmax_topk_i8c vs make_segmax_topk(bf16)

Writes bench/results/i8c_stage_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

Q, CAP, DIM, K = 8192, 102400, 1024, 10
ITERS = 8


def slope(fn, *args):
    """Per-iteration device ms by dispatch slope + tiny-slice fetch."""
    def run(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf[:1, :1])
        return time.perf_counter() - t0

    run(2)
    best = float("inf")
    for _ in range(3):
        lo, hi = run(2), run(2 + ITERS)
        best = min(best, (hi - lo) / ITERS)
    return best * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu.ops import pallas_scan as ps
    from picovdb_tpu.utils import normalize_batch

    rng = np.random.default_rng(0)
    data = normalize_batch(
        rng.standard_normal((CAP, DIM), dtype=np.float32))
    v = jnp.asarray(data)
    lp = v.astype(jnp.bfloat16)
    v8, cs = ps.quantize_cols_i8(v)
    mask = jnp.ones((CAP,), dtype=bool)
    q = jnp.asarray(
        rng.standard_normal((Q, DIM), dtype=np.float32))
    qh = q.astype(jnp.bfloat16)
    q8 = ps.fold_queries_i8(q, cs)

    res = {}

    fold = jax.jit(ps.fold_queries_i8)
    res["fold_queries_i8"] = round(slope(fold, q, cs), 2)
    print("fold_queries_i8", res["fold_queries_i8"], flush=True)

    seg_i8c = jax.jit(
        lambda qq: ps.segmax_scan_i8c(qq, v8, mask, raw_t=True)[0])
    res["keys_i8c"] = round(slope(seg_i8c, q8), 2)
    print("keys_i8c", res["keys_i8c"], flush=True)

    seg_bf = jax.jit(
        lambda qq: ps.segmax_scan(qq, lp, mask, None, raw_t=True)[0])
    res["keys_bf16"] = round(slope(seg_bf, qh), 2)
    print("keys_bf16", res["keys_bf16"], flush=True)

    keys_t = seg_i8c(q8)
    topk = jax.jit(lambda kt: ps.topk_packed_keys(kt, K + 8))
    res["topk_packed"] = round(slope(topk, keys_t), 2)
    print("topk_packed", res["topk_packed"], flush=True)

    full_i8c = ps.make_segmax_topk_i8c(K)
    res["full_i8c"] = round(slope(full_i8c, q, v8, cs, v, mask), 2)
    print("full_i8c", res["full_i8c"], flush=True)

    full_bf = ps.make_segmax_topk(K, None)
    res["full_bf16"] = round(slope(full_bf, q, lp, v, mask), 2)
    print("full_bf16", res["full_bf16"], flush=True)

    # guard-width control: is the extra i8c guard (8 vs 6) material?
    full_i8c_g6 = ps.make_segmax_topk_i8c(K, guard=6)
    res["full_i8c_guard6"] = round(slope(full_i8c_g6, q, v8, cs, v, mask), 2)
    print("full_i8c_guard6", res["full_i8c_guard6"], flush=True)

    # ---- kernel variants: where does the int32 extraction tax come from?
    # The s8 MXU's int32 output appears to carry a register layout that
    # makes every subsequent elementwise pass expensive; these variants
    # normalize it before the segment extraction.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    SEG = ps.SEG
    KEY_MIN = ps.KEY_MIN

    def make_variant(body):
        bn = 2048
        qt = 256
        ns = bn // SEG
        n_tiles = CAP // bn

        def kern(q_ref, v_ref, m_ref, out_ref):
            s_i32 = jax.lax.dot_general(
                q_ref[...], v_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            keys = body(s_i32)  # (QT, BN) int32 sortable
            keys = keys.reshape(qt, ns, SEG)
            lane = jax.lax.broadcasted_iota(jnp.int32, (qt, ns, SEG), 2)
            keys = (keys & ~jnp.int32(SEG - 1)) | lane
            keys = jnp.where(
                m_ref[...].reshape(1, ns, SEG) > 0, keys,
                jnp.int32(KEY_MIN))
            m1 = jnp.max(keys, axis=2)
            keys = jnp.where(keys == m1[:, :, None], jnp.int32(KEY_MIN),
                             keys)
            m2 = jnp.max(keys, axis=2)
            out_ref[...] = jnp.concatenate([m1, m2], axis=1).T

        mask2d = np.ones((1, CAP), dtype=np.int32)

        @jax.jit
        def run(qq):
            return pl.pallas_call(
                kern,
                grid=(Q // qt, n_tiles),
                in_specs=[
                    pl.BlockSpec((qt, DIM), lambda i, b: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bn, DIM), lambda i, b: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda i, b: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2 * ns, qt), lambda i, b: (b, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (n_tiles * 2 * ns, Q), jnp.int32),
            )(qq, v8, jnp.asarray(mask2d))

        return run

    variants = {
        # straight int32 keys (the shipped i8c kernel's structure)
        "vk_i32": make_variant(lambda s: s),
        # convert to f32 (exact for |s| < 2^24) -> float sortable keys:
        # normalizes the layout through the VPU convert
        "vk_viaf32": make_variant(
            lambda s: ps._to_sortable(
                pltpu.bitcast(s.astype(jnp.float32), jnp.int32))),
    }
    for name, fn in variants.items():
        try:
            res[name] = round(slope(fn, q8), 2)
        except Exception as e:  # noqa: BLE001
            res[name] = f"ERR {type(e).__name__}: {e}"[:120]
        print(name, res[name], flush=True)

    with open("bench/results/i8c_stage_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
