"""Interleaved A/B: int8 vs bf16 kernels on the same mirrors, same process.

The dev harness's TPU relay drifts 20-50% between minutes, swamping the
~25% kernel-level differences when configs run sequentially
(bench/int8_tier.py's three r3 runs each ranked the tiers differently).
Here both mirrors live on one DeviceIndex and the kernels alternate
A/B/A/B within each round, so drift hits both sides equally.

Measures, amortized over M back-to-back dispatches with one trailing fetch:
  - Q=1 ladder: fused_topk_i8(bn=4096) vs mixed_fused(bf16)
  - batch-8192 segmax: segmax_i8 vs segmax bf16

Usage: python bench/int8_ab.py [--n 100000] [--dim 1024] [--out f.json]
"""

import set_path  # noqa: F401  (source-checkout import path)

import argparse
import json
import os
import sys
import time

import numpy as np


def amortize(fn_dispatch, m, rounds):
    """min over rounds of (m dispatches + one trailing fetch)/m seconds."""
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn_dispatch() for _ in range(m)]
        v, ix = outs[-1]
        np.asarray(v), np.asarray(ix)
        best = min(best, (time.perf_counter() - t0) / m)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu.device import DeviceIndex
    from picovdb_tpu.utils import normalize_batch
    from picovdb_tpu.ops.pallas_scan import (
        make_fused_topk_i8,
        make_fused_topk_i8c,
        make_mixed_fused_topk,
        make_segmax_topk,
        make_segmax_topk_i8,
        make_segmax_topk_i8c,
    )

    rng = np.random.default_rng(0)
    data = normalize_batch(
        rng.standard_normal((args.n, args.dim), dtype=np.float32)
    )
    dev = DeviceIndex(args.dim, mixed_precision=True, int8_tier=True)
    dev.full_upload(data, np.ones(args.n, dtype=bool))
    assert dev.vectors_lp is not None and dev.vectors_i8 is not None
    assert dev.vectors_i8c is not None
    f32, lp, v8, vs, mask = (
        dev.vectors, dev.vectors_lp, dev.vectors_i8, dev.vscale, dev.active
    )
    v8c, cs = dev.vectors_i8c, dev.cscale

    q1 = jax.device_put(
        rng.standard_normal((1, args.dim), dtype=np.float32)
    )
    qb = jax.device_put(
        rng.standard_normal((args.batch, args.dim), dtype=np.float32)
    )

    k = args.topk
    i8_q1 = make_fused_topk_i8(k)
    i8c_q1 = make_fused_topk_i8c(k)
    bf_q1 = make_mixed_fused_topk(k)
    i8_seg = make_segmax_topk_i8(k)
    i8c_seg = make_segmax_topk_i8c(k)
    i8c_seg_stream = make_segmax_topk_i8c(k, stream=True)
    bf_seg = make_segmax_topk(k, None)
    bf_seg_stream = make_segmax_topk(k, None, stream=True)

    from picovdb_tpu.ops.exact import make_exact_topk

    xla_q1 = make_exact_topk(k, None)
    cases = {
        "q1_i8": (lambda: i8_q1(q1, v8, vs, f32, mask), 64),
        "q1_i8c": (lambda: i8c_q1(q1, v8c, cs, f32, mask), 64),
        "q1_bf16": (lambda: bf_q1(q1, lp, f32, mask), 64),
        # segmax at Q=1: 2 extraction ranks/tile instead of the ladder's
        # k+guard — tests whether the ladder's serial VPU maxes dominate
        "q1_seg_i8": (lambda: i8_seg(q1, v8, vs, f32, mask), 64),
        "q1_xla": (lambda: xla_q1(q1, f32, mask), 64),
        "batch_i8": (lambda: i8_seg(qb, v8, vs, f32, mask), 6),
        "batch_i8c": (lambda: i8c_seg(qb, v8c, cs, f32, mask), 6),
        "batch_i8c_stream": (
            lambda: i8c_seg_stream(qb, v8c, cs, f32, mask), 6),
        "batch_bf16": (lambda: bf_seg(qb, lp, f32, mask), 6),
        "batch_bf16_stream": (
            lambda: bf_seg_stream(qb, lp, f32, mask), 6),
    }
    # warm every kernel before any timing
    for name, (fn, _) in cases.items():
        v, ix = fn()
        np.asarray(v), np.asarray(ix)

    results = {name: [] for name in cases}
    for r in range(args.rounds):  # interleave: drift hits all cases alike
        for name, (fn, m) in cases.items():
            results[name].append(amortize(fn, m, 1))
    out = {}
    for name, times in results.items():
        ms = min(times) * 1000
        out[name] = round(ms, 4)
        print(f"# {name}: best {ms:.3f} ms  "
              f"(rounds: {['%.3f' % (t*1000) for t in times]})",
              file=sys.stderr)
    out["q1_speedup_i8_vs_bf16"] = round(out["q1_bf16"] / out["q1_i8"], 3)
    out["batch_speedup_i8_vs_bf16"] = round(
        out["batch_bf16"] / out["batch_i8"], 3
    )
    out["q1_speedup_i8c_vs_i8"] = round(out["q1_i8"] / out["q1_i8c"], 3)
    out["batch_speedup_i8c_vs_bf16"] = round(
        out["batch_bf16"] / out["batch_i8c"], 3
    )
    best_batch = min(
        (v for n2, v in out.items() if n2.startswith("batch_")),
    )
    out["best_batch_case"] = [
        n2 for n2, v in out.items()
        if n2.startswith("batch_") and v == best_batch
    ][0]

    # recall@k of the i8c routes vs the f32 oracle on a query sample
    m = 64
    qs = np.asarray(qb)[:m].astype(np.float64)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    oracle_idx = np.argsort(-(qs @ data.astype(np.float64).T), axis=1)[:, :k]
    for name, fn in (("i8c_seg", lambda: i8c_seg(qb, v8c, cs, f32, mask)),
                     ("i8c_q1", lambda: i8c_q1(qb[:8], v8c, cs, f32, mask))):
        _, ix = fn()
        ix = np.asarray(ix)
        mm = min(m, ix.shape[0])
        rec = np.mean([
            len(set(ix[i, :k].tolist()) & set(oracle_idx[i].tolist())) / k
            for i in range(mm)
        ])
        out[f"recall_{name}"] = round(float(rec), 4)
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
