"""Q=1 latency anatomy: is the ~1 ms floor device compute or dispatch?

Three probes over the int8 ladder kernel (the current Q=1 tier):
  1. dispatch-vs-drain: time the 64-deep dispatch loop separately from the
     final fetch. Dispatch-bound => loop time ~= total; device-bound =>
     loop returns fast and the drain dominates.
  2. corpus scaling: same kernel over 100k / 50k / 25k rows. Sweep-bound
     time scales ~linearly; fixed-overhead time doesn't.
  3. noop scale: a trivial jitted add dispatched 64-deep — the pure
     Python + relay + program-launch floor of this harness.
  4. on-device loop: lax.scan over K distinct queries inside ONE program —
     iterations serialize on the device and each sweeps the full corpus
     from HBM, so elapsed/K is the true per-query device latency with the
     host dispatch floor (probe 3) amortized to nothing.

Usage: python bench/q1_anatomy.py
"""

import set_path  # noqa: F401  (source-checkout import path)

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu.utils import normalize_batch
    from picovdb_tpu.ops.pallas_scan import make_fused_topk_i8, quantize_rows_i8

    rng = np.random.default_rng(0)
    dim, k, M = 1024, 10, 64
    out = {}

    q1 = jax.device_put(
        rng.standard_normal((1, dim), dtype=np.float32)
    )

    # --- probe 3: harness floor (tiny jitted program, 64-deep) ----------
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    y = tiny(q1); np.asarray(y)  # noqa: E702 warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ys = [tiny(q1) for _ in range(M)]
        np.asarray(ys[-1])
        best = min(best, (time.perf_counter() - t0) / M)
    out["noop_ms"] = round(best * 1000, 4)
    print(f"# noop 64-deep: {best*1000:.3f} ms/call", file=sys.stderr)

    fn = make_fused_topk_i8(k)
    for n in (102_400, 51_200, 25_600):
        data = normalize_batch(
            rng.standard_normal((n, dim), dtype=np.float32)
        )
        v = jax.device_put(data)
        v8, vs = quantize_rows_i8(v)
        mask = jnp.ones(n, dtype=bool)
        vals, idx = fn(q1, v8, vs, v, mask)
        np.asarray(vals), np.asarray(idx)  # warm

        best_total, best_disp = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            pend = [fn(q1, v8, vs, v, mask) for _ in range(M)]
            t_disp = time.perf_counter() - t0
            np.asarray(pend[-1][0]), np.asarray(pend[-1][1])
            t_total = time.perf_counter() - t0
            if t_total < best_total:
                best_total, best_disp = t_total, t_disp
        out[f"n{n}_total_ms"] = round(best_total * 1000 / M, 4)
        out[f"n{n}_dispatch_ms"] = round(best_disp * 1000 / M, 4)
        print(f"# n={n}: total {best_total*1000/M:.3f} ms/q, dispatch loop "
              f"{best_disp*1000/M:.3f} ms/q, drain "
              f"{(best_total-best_disp)*1000:.1f} ms", file=sys.stderr)

        # --- probe 4: on-device serial loop (one dispatch, K queries) ---
        qs = jax.device_put(
            rng.standard_normal((M, 1, dim), dtype=np.float32)
        )

        @jax.jit
        def loop(qs, v8, vs, v, mask):
            def body(_, q):
                vals, idx = fn(q, v8, vs, v, mask)
                return 0, (vals, idx)

            _, outs = jax.lax.scan(body, 0, qs)
            return outs

        vals, idx = loop(qs, v8, vs, v, mask)
        np.asarray(vals), np.asarray(idx)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            vals, idx = loop(qs, v8, vs, v, mask)
            np.asarray(vals), np.asarray(idx)
            best = min(best, time.perf_counter() - t0)
        out[f"n{n}_device_loop_ms"] = round(best * 1000 / M, 4)
        print(f"# n={n}: on-device loop {best*1000/M:.3f} ms/q "
              f"({M} serialized corpus sweeps in one program)",
              file=sys.stderr)
        del v, v8, vs, data, qs

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
