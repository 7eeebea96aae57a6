"""int4 ladder kernel floor: dispatch-chain slope at 1M x 1024 on chip.

Times `fused_topk_i4` directly (device-generated corpus, no host
traffic): M dependency-chained Q=1 dispatches, slope = marginal sweep
cost. HBM floor for 1M x 1024 packed nibbles is 512 MB/sweep ~ 0.8 ms at
~630 GB/s; the int8 ladder measures ~1.0 ms on the same geometry (1 GB).

Usage: python bench/i4_kernel_probe.py [--n 1000000] [--dim 1024]
"""

import argparse
import json
import os
import time

import numpy as np

import set_path  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    print("STARTED", flush=True)
    import jax
    import jax.numpy as jnp

    from picovdb_tpu.constants import ROW_PAD
    from picovdb_tpu.ops.pallas_scan import (
        make_fused_topk_i4,
        make_fused_topk_i8,
        quantize_rows_i4,
        quantize_rows_i8,
    )

    cap = -(-args.n // ROW_PAD) * ROW_PAD
    key = jax.random.PRNGKey(0)
    # device-generated corpus in chunks (host page faults crawl at GBs)
    chunks = []
    step = 1 << 18
    for s in range(0, cap, step):
        key, sub = jax.random.split(key)
        chunks.append(jax.random.normal(sub, (min(step, cap - s), args.dim),
                                        dtype=jnp.float32))
    V = jnp.concatenate(chunks)
    V = V / jnp.linalg.norm(V, axis=1, keepdims=True)
    v4, s4 = quantize_rows_i4(V)
    v8, s8 = quantize_rows_i8(V)
    mask = jnp.ones((cap,), bool)
    q = np.asarray(V[:1]).astype(np.float32)
    del V, chunks

    from picovdb_tpu.device import _make_serial_loop

    out = {"n": args.n, "dim": args.dim, "k": args.k}
    qM = jax.device_put(
        jnp.broadcast_to(jnp.asarray(q[0]), (256, args.dim)).copy()
    )
    for name, fn, vv, ss in (
        ("i4", make_fused_topk_i4(args.k), v4, s4),
        ("i8", make_fused_topk_i8(args.k, rescore_dequant=True,
                                  tie_scale=0.0), v8, s8),
    ):
        if name == "i8":
            loop = _make_serial_loop(lambda qq, vvv, sss, m: fn(
                qq, vvv, sss, vvv, m))
        else:
            loop = _make_serial_loop(fn)
        # lax.scan serializes the M sweeps inside ONE device program —
        # the repo's established device-latency methodology (bench.py):
        # slope of wall vs M is the marginal sweep cost, free of host
        # and relay noise.
        times = {}
        for m in (64, 256):
            np.asarray(loop(qM[:m], vv, ss, mask)[0])  # compile + warm
            t0 = time.time()
            np.asarray(loop(qM[:m], vv, ss, mask)[0])
            times[m] = time.time() - t0
        slope_ms = 1000 * (times[256] - times[64]) / 192
        out[f"{name}_sweep_ms"] = round(slope_ms, 3)
        print(f"{name}: {slope_ms:.3f} ms/sweep (serial 64->256)",
              flush=True)

    out["ratio_i4_vs_i8"] = round(out["i4_sweep_ms"] / out["i8_sweep_ms"], 3)
    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "i4_kernel_r3.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
