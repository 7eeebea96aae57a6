"""IVF tier at target scale: build cost + QPS/latency/recall vs exact scan.

The IVF tier exists for corpora where even the fused exact sweep is too
slow — the role FAISS HNSW plays in the reference (picovdb/pico_vdb.py:
171-212: ~50-110 s build at 100k, then 0.4 ms/query). This bench measures
the trade at multi-million scale on one chip: index build time, per-batch
device latency of the IVF probe scan vs the exact scan at several batch
sizes, and IVF recall@k against the exact scan as oracle.

Data is a unit-sphere Gaussian mixture (real embedding corpora are
clustered; on uniformly random vectors *no* partition-based ANN can beat
an exact scan at high recall — neighbors are near-orthogonal and every
cell looks alike). Queries are fresh samples from the same mixture.

At >=2M x 1024-d use --storage-dtype bfloat16: the engine mirror plus the
IVF mirror then fit a 16 GB v5e chip (4 GB each), the probe scan reads
bf16 at twice the MXU rate, and the exact rescore keeps recall ~0.994+.

Usage:
  python bench/ivf_scale.py --n 2000000 --storage-dtype bfloat16
  python bench/ivf_scale.py --n 100000 --qs 1,8,64
"""

import argparse
import json
import sys
import time

import numpy as np

import set_path  # noqa: F401
from picovdb_tpu import PicoVectorDB


def make_mixture(n, dim, n_centers, rng, noise=0.35, chunk=262_144):
    """Unit-norm Gaussian-mixture rows, generated chunk-wise (host RAM)."""
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out = np.empty((n, dim), dtype=np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        c = rng.integers(0, n_centers, size=e - s)
        block = centers[c] + noise * rng.normal(size=(e - s, dim)).astype(
            np.float32
        )
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        out[s:e] = block
    return out, centers


def time_best(fn, iters=5):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--qs", default="1,8,64,256,2048")
    p.add_argument("--nlist", type=int, default=0, help="0 = auto (~2*sqrt N)")
    p.add_argument("--nprobe", type=int, default=0, help="0 = ef/2 mapping")
    p.add_argument("--ef", type=int, default=32)
    p.add_argument("--storage-dtype", default=None)
    p.add_argument("--recall-queries", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    qs = [int(x) for x in args.qs.split(",")]

    rng = np.random.default_rng(args.seed)
    print(f"# generating {args.n}x{args.dim} mixture ({args.centers} centers)",
          file=sys.stderr)
    t0 = time.perf_counter()
    data, centers = make_mixture(args.n, args.dim, args.centers, rng)
    qmax = max(max(qs), args.recall_queries)
    queries, _ = make_mixture(qmax, args.dim, args.centers, rng)
    # queries from the same mixture: re-sample around the same centers
    queries = centers[rng.integers(0, args.centers, size=qmax)] + \
        0.35 * rng.normal(size=(qmax, args.dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    print(f"# datagen: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim,
            storage_file=f"{tmp}/ivf_scale",
            index="ivf",
            ivf_nlist=args.nlist or None,
            ivf_nprobe=args.nprobe or None,
            storage_dtype=args.storage_dtype,
        )
        t0 = time.perf_counter()
        db.upsert_columnar(data, ids=[str(i) for i in range(args.n)],
                           copy=False)
        t_insert = time.perf_counter() - t0
        print(f"# insert: {t_insert:.2f} s ({args.n/t_insert:.0f} vec/s)",
              file=sys.stderr)

        t0 = time.perf_counter()
        db.rebuild_index()  # device mirror upload + IVF train/layout
        t_build_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        db.rebuild_index()  # warm centroids: refresh-only retrain
        t_build_warm = time.perf_counter() - t0
        ivf = db._ivf
        assert ivf is not None, "IVF tier did not build"
        print(f"# build: cold {t_build_cold:.1f} s / warm {t_build_warm:.1f} s"
              f" (nlist={ivf.nlist}, mirror dtype={ivf.vectors.dtype})",
              file=sys.stderr)

        k = args.topk
        dev = db._dev
        nprobe = args.nprobe or None

        # recall: IVF vs the exact device scan as oracle
        m = args.recall_queries
        qr = queries[:m]
        ev, ei = dev.query(qr, k, None, force_exact=True)
        iv, ii = ivf.search(qr, k, args.ef, dev, nprobe=nprobe)
        recall = np.mean([
            len(set(ii[i].tolist()) & set(ei[i].tolist())) / k
            for i in range(m)
        ])
        print(f"# recall@{k} vs exact scan: {recall:.4f} "
              f"(ef={args.ef}, nprobe={nprobe or 'auto'})", file=sys.stderr)

        rows = []
        for q in qs:
            qq = queries[:q]
            t_ivf = time_best(lambda: ivf.search(qq, k, args.ef, dev,
                                                 nprobe=nprobe))
            t_ex = time_best(lambda: dev.query(qq, k, None))
            rows.append((q, t_ivf, t_ex))
            print(f"# Q={q:5d}: ivf {t_ivf*1000:8.2f} ms ({q/t_ivf:9.0f} QPS)"
                  f" | exact {t_ex*1000:8.2f} ms ({q/t_ex:9.0f} QPS)"
                  f" | speedup {t_ex/t_ivf:5.2f}x", file=sys.stderr)

        best = max(rows, key=lambda r: r[2] / r[1])
        print(json.dumps({
            "metric": f"ivf_speedup_vs_exact_{args.n}x{args.dim}d_Q{best[0]}"
                      f"_recall{recall:.3f}",
            "value": round(best[2] / best[1], 2),
            "unit": "x",
            "build_cold_s": round(t_build_cold, 1),
            "build_warm_s": round(t_build_warm, 1),
            "qps_ivf": round(best[0] / best[1], 0),
            "qps_exact": round(best[0] / best[2], 0),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
