"""Serving-lane wall-time anatomy at 32768 x 100k x 1024.

Times each phase of query_columnar's pipeline by hand:
  dispatch loop | per-chunk result arrival (np.asarray) | id-map/assembly
for chunk sizes 8192 and 2048, device-resident queries.
"""
import set_path  # noqa: F401  (source-checkout import path)

import json
import sys
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu import PicoVectorDB

    rng = np.random.default_rng(0)
    n, dim, Q, k = 100_000, 1024, 32_768, 10
    data = rng.standard_normal((n, dim), dtype=np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file="/tmp/serveprobe_db")
    db.upsert_columnar(data, ids=[str(i) for i in range(n)], copy=False)
    queries = rng.standard_normal((Q, dim), dtype=np.float32)
    q_dev = jax.device_put(queries)
    out = {}

    for bs in (8192, 2048):
        db.query_columnar(q_dev, top_k=k, batch_size=bs)  # warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            with db._synced_read():
                pending = []
                chunks = []
                for s in range(0, Q, bs):
                    c = q_dev[s:s + bs]
                    chunks.append(c)
                    pending.append(db._dev.query_async(c, k, None))
                ids_arr = db._ids_array()
                docs_len = len(db._docs)
            t_dispatch = time.perf_counter() - t0
            from picovdb_tpu.engine import _start_host_copies
            _start_host_copies(pending)
            t_copies = time.perf_counter() - t0
            arrivals = []
            fetched = []
            for vals_dev, idxs_dev, nq, ke in pending:
                vals = np.asarray(vals_dev)[:nq, :ke]
                idxs = np.asarray(idxs_dev)[:nq, :ke]
                arrivals.append(time.perf_counter() - t0)
                fetched.append((vals, idxs, nq, ke))
            t_fetched = time.perf_counter() - t0
            out_ids = np.full((Q, k), None, dtype=object)
            out_scores = np.full((Q, k), -np.inf, dtype=np.float32)
            row = 0
            for vals, idxs, nq, ke in fetched:
                valid = np.isfinite(vals) & (idxs >= 0) & (idxs < docs_len)
                safe = np.where(valid, idxs, 0)
                mapped = ids_arr[safe]
                mapped[~valid] = None
                out_ids[row:row + nq, :ke] = mapped
                out_scores[row:row + nq, :ke] = np.where(
                    valid, vals, -np.inf)
                row += nq
            t_total = time.perf_counter() - t0
            rec = {
                "dispatch_ms": round(t_dispatch * 1000, 1),
                "copies_issued_ms": round(t_copies * 1000, 1),
                "arrivals_ms": [round(a * 1000, 1) for a in arrivals],
                "fetched_ms": round(t_fetched * 1000, 1),
                "total_ms": round(t_total * 1000, 1),
            }
            if best is None or rec["total_ms"] < best["total_ms"]:
                best = rec
        out[f"bs{bs}"] = best
        print(f"# bs={bs}: {best}", file=sys.stderr)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
