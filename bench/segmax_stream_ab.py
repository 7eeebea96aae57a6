"""Interleaved A/B: segmax grid order (classic vs corpus-resident stream).

The classic grid (q_tiles, n_tiles) re-streams the whole corpus once per
256-query tile — 32 corpus sweeps for an 8192 batch (6.4 GB on the bf16
mirror at 100k x 1024). The stream order (n_tiles, q_tiles) keeps each
corpus tile VMEM-resident across the inner query sweep, so the corpus
crosses HBM exactly once and only the small query tiles re-read. This A/B
interleaves all four (mirror x order) variants within each round so relay
drift cancels (same protocol as bench/int8_ab.py).

Also verifies recall@k vs a float64 oracle for every variant — the two
orders compute bit-identical keys (test_pallas_kernel.py), so any recall
delta would indicate a routing bug, not kernel noise.

Usage: python bench/segmax_stream_ab.py [--n 100000] [--dim 1024]
       [--batch 8192] [--out bench/results/segmax_stream_r3.json]
"""

import set_path  # noqa: F401  (source-checkout import path)

import argparse
import json
import os
import sys
import time

import numpy as np


def amortize(fn_dispatch, m, rounds):
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
        make_segmax_topk,
        make_segmax_topk_i8,
    )

    rng = np.random.default_rng(0)
    data = normalize_batch(
        rng.standard_normal((args.n, args.dim), dtype=np.float32)
    )
    dev = DeviceIndex(args.dim, mixed_precision=True, int8_tier=True)
    dev.full_upload(data, np.ones(args.n, dtype=bool))
    assert dev.vectors_lp is not None and dev.vectors_i8 is not None
    f32, lp, v8, vs, mask = (
        dev.vectors, dev.vectors_lp, dev.vectors_i8, dev.vscale, dev.active
    )

    qb_np = normalize_batch(
        rng.standard_normal((args.batch, args.dim), dtype=np.float32)
    )
    qb = jax.device_put(qb_np)

    k = args.topk
    bf_c = make_segmax_topk(k, None)
    bf_s = make_segmax_topk(k, None, stream=True)
    i8_c = make_segmax_topk_i8(k)
    i8_s = make_segmax_topk_i8(k, stream=True)

    cases = {
        "bf16_classic": lambda: bf_c(qb, lp, f32, mask),
        "bf16_stream": lambda: bf_s(qb, lp, f32, mask),
        "i8_classic": lambda: i8_c(qb, v8, vs, f32, mask),
        "i8_stream": lambda: i8_s(qb, v8, vs, f32, mask),
    }

    # f64 oracle over a query subsample for recall@k per variant
    sub = np.arange(0, args.batch, max(1, args.batch // 256))
    oracle_scores = qb_np[sub].astype(np.float64) @ data.T.astype(np.float64)
    oracle_idx = np.argsort(-oracle_scores, axis=1)[:, :k]

    out = {}
    for name, fn in cases.items():  # warm + recall before any timing
        v, ix = fn()
        ix = np.asarray(ix)
        rec = np.mean([
            len(set(ix[q]) & set(oracle_idx[j])) / k
            for j, q in enumerate(sub)
        ])
        out[f"recall_{name}"] = round(float(rec), 4)

    results = {name: [] for name in cases}
    for r in range(args.rounds):
        for name, fn in cases.items():
            results[name].append(amortize(fn, 6, 1))
    for name, times in results.items():
        ms = min(times) * 1000
        out[name] = round(ms, 3)
        print(f"# {name}: best {ms:.2f} ms  recall {out['recall_' + name]}"
              f"  (rounds: {['%.2f' % (t * 1000) for t in times]})",
              file=sys.stderr)
    out["bf16_stream_speedup"] = round(out["bf16_classic"] / out["bf16_stream"], 3)
    out["i8_stream_speedup"] = round(out["i8_classic"] / out["i8_stream"], 3)
    out["best_variant"] = min(cases, key=lambda n: out[n])
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
