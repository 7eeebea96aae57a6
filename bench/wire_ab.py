"""A/B the compact query wire on the e2e host->dicts serving lane.

The last reference-favorable number (VERDICT r3 item 1): e2e host-numpy
queries -> dict results at 100k x 1024 was 5.4k QPS because the 128 MB
f32 query upload dominates on the dev-harness relay (~30 MB/s). This
interleaves wire modes (float32 / int16 / float16 / int8) round-robin so
host load variation hits all arms equally, and checks recall@10 against
a float64 oracle per arm. int16 is the `auto` pick: same 2 B/component
as f16 but per-row fixed point -> ~9x less rounding noise, recall 1.0.

Usage: python bench/wire_ab.py [--n 100000] [--dim 1024] [--queries 32768]
                               [--reps 4] [--out bench/results/wire_ab_r4.json]
"""
import set_path  # noqa: F401

import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--queries", type=int, default=32_768)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=2048)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--recall-sample", type=int, default=64)
    p.add_argument("--out", default="bench/results/wire_ab_r4.json")
    args = p.parse_args()

    import jax

    print("STARTED", flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu import PicoVectorDB, K_ID

    rng = np.random.default_rng(0)
    data = rng.standard_normal((args.n, args.dim), dtype=np.float32)
    queries = rng.standard_normal((args.queries, args.dim), dtype=np.float32)

    db = PicoVectorDB(embedding_dim=args.dim, storage_file="/tmp/wireab_db",
                      index="exact")
    db.upsert_columnar(data, ids=[str(i) for i in range(args.n)], copy=False)

    # f64 oracle on a sample
    m = args.recall_sample
    qn = queries[:m].astype(np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    dn = data.astype(np.float64)
    dn /= np.linalg.norm(dn, axis=1, keepdims=True)
    oracle = np.argsort(-(qn @ dn.T), axis=1)[:, : args.topk]
    del dn

    arms = ["float32", "int16", "float16", "int8", "int8_rescore"]
    walls = {a: [] for a in arms}
    recall = {}

    # relay-health probe (VERDICT r4 #7): the e2e lane swings 3-16k QPS
    # with the tunnel's health; a noop-dispatch RTT and a small-transfer
    # bandwidth sample alongside every wall make rounds comparable.
    from picovdb_tpu.utils import relay_health

    health = relay_health()
    print(f"relay health: rtt {health['relay_rtt_ms']} ms, "
          f"upload {health['relay_upload_mbps']} MB/s", flush=True)

    # warm each arm once (jit cache per wire dtype)
    for arm in arms:
        db._query_wire = arm
        db.query_batched(queries[: args.batch_size], top_k=args.topk,
                         batch_size=args.batch_size)

    for rep in range(args.reps):
        for arm in arms:
            db._query_wire = arm
            t0 = time.perf_counter()
            res = db.query_batched(queries, top_k=args.topk,
                                   batch_size=args.batch_size)
            wall = time.perf_counter() - t0
            walls[arm].append(wall)
            if rep == 0:
                got = [
                    {int(h[K_ID]) for h in res[i]} for i in range(m)
                ]
                recall[arm] = float(np.mean([
                    len(got[i] & set(oracle[i].tolist())) / args.topk
                    for i in range(m)
                ]))
            print(f"rep {rep} {arm:8s}: {wall*1000:8.1f} ms "
                  f"({args.queries/wall:8.0f} QPS)", flush=True)

    out = {
        "shape": f"{args.n}x{args.dim}, Q={args.queries}, "
                 f"top{args.topk}, bs={args.batch_size}",
        "arms": {
            a: {
                "walls_ms": [round(w * 1000, 1) for w in walls[a]],
                "best_qps": round(args.queries / min(walls[a]), 0),
                "recall_at_k": recall[a],
            }
            for a in arms
        },
        "speedup_i16_vs_f32": round(min(walls["float32"]) /
                                    min(walls["int16"]), 2),
        "speedup_f16_vs_f32": round(min(walls["float32"]) /
                                    min(walls["float16"]), 2),
        "speedup_i8_vs_f32": round(min(walls["float32"]) /
                                   min(walls["int8"]), 2),
        "speedup_i8_rescore_vs_f32": round(
            min(walls["float32"]) / min(walls["int8_rescore"]), 2
        ),
        **health,
    }
    print(json.dumps(out, indent=2))
    out_path = args.out
    if not os.path.isabs(out_path):  # cwd-independent (r3 bench rule)
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            out_path,
        )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
