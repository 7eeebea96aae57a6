"""Isolate where the batch segmax sweep time goes at 8192 x 100k x 1024.

The r3 serve anatomy shows ~40 ms device time per 8192-query batch while
the pure bf16 matmul FLOPs cost ~4-9 ms at MXU peak: this probe A/Bs

  * dot-only kernel (same grid/blocks, no segment extraction) — the
    MXU + HBM floor for the current (qt, bn) tiling,
  * the production `segmax_scan` (raw keys) at the same tiling,
  * both at larger (qt, bn) to amortize per-grid-step overhead,

so the residual can be attributed to VPU segment extraction vs grid-step
overhead vs matmul inefficiency, and the tile defaults re-picked from
measurement. Writes bench/results/segmax_sweep_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q, CAP, DIM = 8192, 102400, 1024
ITERS = 8


def _dot_kernel(q_ref, v_ref, acc_ref):
    scores = jax.lax.dot_general(
        q_ref[...], v_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Tiny reduction so the matmul can't be DCE'd; negligible VPU cost.
    # (128-wide block: Mosaic requires lane-dim blocks divisible by 128,
    # so broadcast the per-row max across one lane register.)
    acc_ref[...] = jnp.broadcast_to(
        jnp.max(scores, axis=1, keepdims=True), acc_ref.shape
    )


def _dot_kernel_i8(q_ref, v_ref, acc_ref):
    """int8 x int8 -> int32 dot at the same tiling: measures whether the
    Mosaic s8 matmul actually runs at the native 2x-bf16 MXU rate (the
    int8 batch tiers lost to bf16 in r3b's A/B despite half the DMA and
    fewer VPU passes — this separates dot cost from extraction cost)."""
    scores = jax.lax.dot_general(
        q_ref[...], v_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[...] = jnp.broadcast_to(
        jnp.max(scores, axis=1, keepdims=True), acc_ref.shape
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dot_only(q, v, qt: int, bn: int, stream: bool):
    n_tiles = CAP // bn
    if stream:
        grid = (n_tiles, Q // qt)
        q_map, v_map = (lambda b, i: (i, 0)), (lambda b, i: (b, 0))
        o_map = lambda b, i: (i, 0)
    else:
        grid = (Q // qt, n_tiles)
        q_map, v_map = (lambda i, b: (i, 0)), (lambda i, b: (b, 0))
        o_map = lambda i, b: (i, 0)
    kernel = _dot_kernel_i8 if q.dtype == jnp.int8 else _dot_kernel
    out_dtype = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, DIM), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, DIM), v_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, 128), o_map, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, 128), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * CAP * DIM,
            bytes_accessed=CAP * DIM * v.dtype.itemsize * (Q // qt),
            transcendentals=0,
        ),
    )(q, v)


def timeit(fn, *args):
    """Per-iteration device time by dispatch slope.

    block_until_ready under-reports through the axon relay (returns before
    device completion — the r3b run of this probe measured 0.03 ms for an
    8 ms matmul); instead, M back-to-back dispatches are chased by one
    tiny-slice fetch (device executes in order, so the fetch completing
    implies the chain completed), and the slope between M=2 and M=2+ITERS
    cancels the fixed fetch/RTT cost exactly."""
    def run(m):
        t0 = time.perf_counter()
        out = None
        for _ in range(m):
            out = fn(*args)
        np.asarray(out[:1, :1])
        return time.perf_counter() - t0

    run(2)  # warm compile + pipe
    best = float("inf")
    for _ in range(3):
        lo, hi = run(2), run(2 + ITERS)
        best = min(best, (hi - lo) / ITERS)
    return best * 1e3


def main():
    from picovdb_tpu.ops import pallas_scan as ps

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(Q, DIM)).astype(np.float32))
    qh = q.astype(jnp.bfloat16)
    v = jnp.asarray(
        rng.normal(size=(CAP, DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mask = jnp.ones((CAP,), dtype=bool)

    from picovdb_tpu.ops.pallas_scan import quantize_cols_i8, fold_queries_i8

    v8, cs = quantize_cols_i8(v)
    q8 = fold_queries_i8(q, cs)

    res = {}
    for qt, bn in ((256, 1024), (256, 2048), (512, 1024), (512, 2048),
                   (1024, 2048), (512, 4096)):
        q_bytes = qt * DIM * 2
        use = q_bytes + 2 * bn * DIM * 2 + 2 * qt * bn * 4
        if use > 14 * 2**20:
            continue
        for stream in (False, True):
            tag = f"dot_qt{qt}_bn{bn}" + ("_s" if stream else "")
            try:
                res[tag] = round(timeit(dot_only, qh, v, qt, bn, stream), 2)
            except Exception as e:  # noqa: BLE001
                res[tag] = f"ERR {type(e).__name__}"
            print(tag, res[tag], flush=True)
            tag8 = f"dot_i8_qt{qt}_bn{bn}" + ("_s" if stream else "")
            try:
                res[tag8] = round(timeit(dot_only, q8, v8, qt, bn, stream), 2)
            except Exception as e:  # noqa: BLE001
                res[tag8] = f"ERR {type(e).__name__}"
            print(tag8, res[tag8], flush=True)

    # production segmax at its own default pick, bf16-precast queries
    def seg(stream):
        keys, ns = ps.segmax_scan(qh, v, mask, None, raw=True, stream=stream)
        return keys

    sj = jax.jit(seg, static_argnums=(0,))
    for stream in (False, True):
        tag = "segmax_default" + ("_s" if stream else "")
        res[tag] = round(timeit(sj, stream), 2)
        print(tag, res[tag], flush=True)

    # segmax at explicit larger tiles (budget raised by calling with bn=,
    # qt= directly — segmax_scan re-picks bn under its own budget, so
    # record what it actually used)
    def seg_t(qt, bn, stream):
        keys, ns = ps.segmax_scan(qh, v, mask, None, qt=qt, bn=bn,
                                  raw=True, stream=stream)
        return keys

    sjt = jax.jit(seg_t, static_argnums=(0, 1, 2))
    for qt, bn in ((512, 1024), (512, 2048), (1024, 1024)):
        tag = f"segmax_qt{qt}_bn{bn}"
        try:
            res[tag] = round(timeit(sjt, qt, bn, False), 2)
        except Exception as e:  # noqa: BLE001
            res[tag] = f"ERR {type(e).__name__}"
        print(tag, res[tag], flush=True)

    with open("bench/results/segmax_sweep_r3.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
