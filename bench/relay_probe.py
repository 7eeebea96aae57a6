"""Relay transfer anatomy: is upload bandwidth data-dependent?

The round-4/5 e2e lane swings 3-16k QPS with "relay health", and the
relay_health() probe (utils) measured 80 MB/s while the actual 67 MB
int16 query upload sustained ~16 MB/s in the same run. Hypothesis: the
dev-harness relay compresses its stream, so an all-zeros probe buffer
measures compressible-bandwidth, not the incompressible bandwidth real
query data sees. This probe A/Bs zeros vs random at several sizes and
dtypes, plus sliced-chunk uploads, to pick the honest probe payload and
the fastest upload strategy for query_batched.

Usage: python bench/relay_probe.py
"""
import sys
import time

import numpy as np
import jax


def put_time(buf, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("STARTED", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    noop = jax.jit(lambda x: x + 1.0)
    probe = np.zeros((8, 8), np.float32)
    np.asarray(noop(jax.device_put(probe)))
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(noop(jax.device_put(probe)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt_ms {rtt*1e3:.2f}")

    mb = 16
    n = int(mb * 1e6)
    zeros = np.zeros(n, np.uint8)
    rand = rng.integers(0, 256, n, dtype=np.uint8)
    # int16 wire lookalike: quantized gaussian (what queries actually are)
    g = rng.standard_normal(n // 2).astype(np.float32)
    wire16 = np.clip(g / np.abs(g).max() * 32767, -32767, 32767).astype(
        np.int16
    )
    for name, buf in [("zeros", zeros), ("random_u8", rand),
                      ("wire_int16", wire16)]:
        t = put_time(buf)
        print(f"upload {name:12s} {mb} MB: {t*1e3:8.1f} ms "
              f"-> {mb/t:7.1f} MB/s")

    # chunked vs single for random payload
    big_mb = 64
    big = rng.integers(0, 256, int(big_mb * 1e6), dtype=np.uint8)
    t = put_time(big, reps=2)
    print(f"single {big_mb} MB random: {t*1e3:.1f} ms -> {big_mb/t:.1f} MB/s")
    for chunk_mb in (4, 16):
        c = int(chunk_mb * 1e6)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            devs = [jax.device_put(big[i:i + c])
                    for i in range(0, len(big), c)]
            for d in devs:
                d.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"chunked {chunk_mb} MB x{len(devs)} async: {best*1e3:.1f} ms "
              f"-> {big_mb/best:.1f} MB/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
