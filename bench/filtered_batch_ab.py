"""Interleaved A/B: filtered-batch sweep over bf16 mirror vs f32 corpus.

Filtered batches can't use segmax (per-segment truncation is unsafe under
clustered filters) and historically swept the f32 corpus through the exact
ladder. The new `mixed_fused_batch` route runs the SAME ladder over the
bf16 mirror (half the DMA) + exact f32 rescore. Two DeviceIndex instances
(mirror on/off) share one process and alternate rounds, so relay drift
hits both arms — the profiler rerun was inconclusive (its untouched
bs=1 cells drifted 34% between runs).

Usage: python bench/filtered_batch_ab.py [--n 1000000]
Writes bench/results/filtered_ab_r3.json.
"""
from __future__ import annotations

import set_path  # noqa: F401  (source-checkout import path)

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--keep", type=float, default=0.5,
                   help="fraction of rows the filter keeps")
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--m", type=int, default=8,
                   help="dispatches per timing sample")
    p.add_argument("--out", default="bench/results/filtered_ab_r3.json")
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

    rng = np.random.default_rng(0)
    data = normalize_batch(
        rng.standard_normal((args.n, args.dim), dtype=np.float32))
    mask = np.ones(args.n, dtype=bool)
    fmask = rng.random(args.n) < args.keep

    dev_mixed = DeviceIndex(args.dim, mixed_precision=True, int8_tier=False)
    dev_mixed.full_upload(data, mask)
    dev_f32 = DeviceIndex(args.dim, mixed_precision=False, int8_tier=False)
    dev_f32.vectors = dev_mixed.vectors  # share the corpus (immutable)
    dev_f32.active = dev_mixed.active
    dev_f32.cap = dev_mixed.cap
    assert dev_mixed.vectors_lp is not None and dev_f32.vectors_lp is None

    qb = jax.device_put(
        rng.standard_normal((args.batch, args.dim), dtype=np.float32))

    def run(dev):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.m):
            vd, xd, nq, ke = dev.query_async(qb, args.topk, fmask,
                                             mask_key=("ab", args.keep))
            out = dev.pack_results(vd, xd)
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / args.m

    run(dev_mixed), run(dev_f32)  # warm compiles + mask cache + pipe
    mixed_t, f32_t = [], []
    strategies = {}
    for _ in range(args.rounds):
        mixed_t.append(run(dev_mixed))
        strategies["mixed"] = dev_mixed.last_strategy
        f32_t.append(run(dev_f32))
        strategies["f32"] = dev_f32.last_strategy

    out = {
        "strategy_mixed": strategies["mixed"],
        "strategy_f32": strategies["f32"],
        "mixed_ms": round(min(mixed_t) * 1000, 2),
        "f32_ms": round(min(f32_t) * 1000, 2),
        "speedup_mixed": round(min(f32_t) / min(mixed_t), 3),
        "rounds_mixed_ms": [round(t * 1000, 2) for t in mixed_t],
        "rounds_f32_ms": [round(t * 1000, 2) for t in f32_t],
    }
    # recall of the mixed route vs the f32 route on the same filter
    vd, xd, nq, ke = dev_mixed.query_async(qb, args.topk, fmask,
                                           mask_key=("ab", args.keep))
    i_mixed = np.asarray(xd)[:nq, :ke]
    vd, xd, nq, ke = dev_f32.query_async(qb, args.topk, fmask,
                                         mask_key=("ab", args.keep))
    i_f32 = np.asarray(xd)[:nq, :ke]
    out["selection_agreement"] = round(float(np.mean([
        len(set(i_mixed[i]) & set(i_f32[i])) / args.topk
        for i in range(args.batch)
    ])), 4)
    print(json.dumps(out))
    for k2, v in out.items():
        print(f"# {k2}: {v}", file=sys.stderr)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
