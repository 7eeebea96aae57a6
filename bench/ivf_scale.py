"""IVF tier at target scale: build cost + QPS/latency/recall vs exact scan.

The IVF tier exists for corpora where even the fused exact sweep is too
slow — the role FAISS HNSW plays in the reference (picovdb/pico_vdb.py:
171-212: ~50-110 s build at 100k, then 0.4 ms/query). This bench measures
the trade at scale on one chip: index build time, pipelined per-batch
device latency of the IVF probe scan vs the exact scan at several batch
sizes, and the smallest nprobe whose recall@k against the exact scan
reaches the target (default 0.99).

Data is a unit-sphere Gaussian mixture (real embedding corpora are
clustered; on uniformly random vectors *no* partition-based ANN can beat
an exact scan at high recall — neighbors are near-orthogonal and every
cell looks alike). Queries are fresh samples around the same centers.

At >=2M x 1024-d use --storage-dtype bfloat16: the engine mirror plus the
IVF mirror then fit a 16 GB v5e chip (4 GB each), the probe scan reads
bf16 at twice the MXU rate, and the exact rescore keeps recall high.

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


def make_mixture(n, dim, centers, rng, noise=0.35, chunk=65_536):
    """Unit-norm Gaussian-mixture rows around given centers, chunk-wise.

    `noise` is the noise-vector NORM relative to the unit center (the
    per-dim sigma is noise/sqrt(dim)), so cluster tightness is
    dim-independent: intra-cluster cosine ~ 1/(1+noise^2) ~ 0.89 at the
    default. (The original per-dim sigma of 0.35 made the noise norm
    0.35*sqrt(dim) — ~11x the center at dim 1024, i.e. effectively
    RANDOM data where no partition-based ANN can work; the r3 IVF recall
    sweeps on that data were rescued only by the batched-union artifact
    fixed below.)

    Gaussians are drawn straight into float32 (standard_normal dtype=) —
    the f64-then-cast pattern doubles memory traffic and, on the ballooned
    dev-harness host, turns a minutes-long datagen into an hour of page
    faults.
    """
    sigma = noise / float(np.sqrt(dim))
    out = np.empty((n, dim), dtype=np.float32)
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        c = rng.integers(0, centers.shape[0], size=e - s)
        block = rng.standard_normal(size=(e - s, dim), dtype=np.float32)
        block *= sigma
        block += centers[c]
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        out[s:e] = block
    return out


def make_mixture_device(n, dim, centers_dev, key, noise=0.35, chunk=262_144,
                        out_dtype=None, normalize=False):
    """Unit-sphere Gaussian mixture generated entirely on the TPU.

    Fills a preallocated HBM buffer chunk-by-chunk with donated updates
    (peak HBM = corpus + one chunk). The dev-harness relay moves ~2-6 MB/s,
    so host-side generation + upload of an 8 GB corpus costs the better
    part of an hour; on-device generation costs seconds and feeds
    `PicoVectorDB.ingest_device` with zero host traffic.

    `out_dtype=jnp.bfloat16, normalize=True` builds a pre-normalized
    storage-dtype corpus chunk-wise — the only way a 4M x 1024 corpus
    (8 GB bf16, 16 GB f32) ever fits a 16 GB chip; `ingest_device`
    then adopts it with `normalize=False` at zero extra HBM.
    """
    import functools

    import jax
    import jax.numpy as jnp

    sigma = noise / float(dim) ** 0.5  # noise = noise-vector norm, see
    # make_mixture: dim-independent cluster tightness

    def _rows(centers, k1, k2, m):
        c = jax.random.randint(k1, (m,), 0, centers.shape[0])
        rows = centers[c] + sigma * jax.random.normal(
            k2, (m, dim), dtype=jnp.float32
        )
        if normalize:
            rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        return rows

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, centers, key, start):
        k1, k2 = jax.random.split(key)
        rows = _rows(centers, k1, k2, chunk)
        return jax.lax.dynamic_update_slice(
            buf, rows.astype(buf.dtype), (start, 0)
        )

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def fill_tail(buf, centers, key, start, m):
        k1, k2 = jax.random.split(key)
        rows = _rows(centers, k1, k2, m)
        return jax.lax.dynamic_update_slice(
            buf, rows.astype(buf.dtype), (start, 0)
        )

    buf = jnp.zeros((n, dim), dtype=out_dtype or jnp.float32)
    s = 0
    while s < n:
        m = min(chunk, n - s)
        key, sub = jax.random.split(key)
        if m == chunk:
            buf = fill(buf, centers_dev, sub, s)
        else:
            buf = fill_tail(buf, centers_dev, sub, s, m)
        s += m
    return buf


def make_mixture_device_i8(n, dim, centers_dev, key, noise=0.35,
                           chunk=262_144):
    """int8 variant of `make_mixture_device`: each chunk is normalized
    then per-row int8-quantized straight into a (n, dim) int8 buffer +
    (n,) scale column — the only way a 12M x 1024 corpus (12 GB int8,
    49 GB f32) ever fits a 16 GB chip. Feeds
    `ingest_device(..., normalize=False, scales=...)`."""
    import functools

    import jax
    import jax.numpy as jnp

    from picovdb_tpu.ops.pallas_scan import quantize_rows_i8

    sigma = noise / float(dim) ** 0.5  # see make_mixture

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnums=(5,))
    def fill(buf, sbuf, centers, key, start, m):
        k1, k2 = jax.random.split(key)
        c = jax.random.randint(k1, (m,), 0, centers.shape[0])
        rows = centers[c] + sigma * jax.random.normal(
            k2, (m, dim), dtype=jnp.float32
        )
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        q8, qs = quantize_rows_i8(rows)
        buf = jax.lax.dynamic_update_slice(buf, q8, (start, 0))
        sbuf = jax.lax.dynamic_update_slice(sbuf, qs, (start,))
        return buf, sbuf

    buf = jnp.zeros((n, dim), dtype=jnp.int8)
    sbuf = jnp.zeros((n,), dtype=jnp.float32)
    s = 0
    while s < n:
        m = min(chunk, n - s)
        key, sub = jax.random.split(key)
        buf, sbuf = fill(buf, sbuf, centers_dev, sub, s, m)
        s += m
    return buf, sbuf


def make_mixture_device_i4(n, dim, centers_dev, key, noise=0.35,
                           chunk=262_144):
    """int4 variant of `make_mixture_device_i8`: each chunk is normalized
    then per-row int4-quantized into a PACKED (n, dim//2) byte buffer +
    (n,) scale column (quantize_rows_i4's layout) — 0.5 B/element, the
    capacity-ceiling corpus. Feeds
    `ingest_device(..., normalize=False, scales=...)`."""
    import functools

    import jax
    import jax.numpy as jnp

    from picovdb_tpu.ops.pallas_scan import quantize_rows_i4

    sigma = noise / float(dim) ** 0.5  # see make_mixture

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnums=(5,))
    def fill(buf, sbuf, centers, key, start, m):
        k1, k2 = jax.random.split(key)
        c = jax.random.randint(k1, (m,), 0, centers.shape[0])
        rows = centers[c] + sigma * jax.random.normal(
            k2, (m, dim), dtype=jnp.float32
        )
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        q4, qs = quantize_rows_i4(rows)
        buf = jax.lax.dynamic_update_slice(buf, q4, (start, 0))
        sbuf = jax.lax.dynamic_update_slice(sbuf, qs, (start,))
        return buf, sbuf

    buf = jnp.zeros((n, dim // 2), dtype=jnp.int8)
    sbuf = jnp.zeros((n,), dtype=jnp.float32)
    s = 0
    while s < n:
        m = min(chunk, n - s)
        key, sub = jax.random.split(key)
        buf, sbuf = fill(buf, sbuf, centers_dev, sub, s, m)
        s += m
    return buf, sbuf


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--centers", type=int, default=4096)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--qs", default="1,8,64,256")
    p.add_argument("--nlist", type=int, default=0, help="0 = auto (~2*sqrt N)")
    p.add_argument("--nprobes", default="4,8,16,32,64,128",
                   help="sweep; smallest reaching --recall-target is used")
    p.add_argument("--recall-target", type=float, default=0.99)
    p.add_argument("--storage-dtype", default=None)
    p.add_argument("--recall-queries", type=int, default=128)
    p.add_argument("--pipeline", type=int, default=32,
                   help="back-to-back dispatches per timing sample "
                        "(hides the dev-harness relay RTT)")
    p.add_argument("--gen", choices=["host", "device"], default="host",
                   help="host: numpy datagen + upsert_columnar (exercises "
                        "the host upload path); device: on-TPU datagen + "
                        "ingest_device (zero host traffic — the only viable "
                        "path for >=2M rows over the dev-harness relay)")
    p.add_argument("--index", choices=["ivf", "exact"], default="ivf",
                   help="exact: no ANN tier — measures the exact scan only "
                        "(the 4M x 1024 bf16 config, where corpus + IVF "
                        "mirror can't both fit 16 GB HBM)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--incr-epoch", type=int, default=0,
                   help="after the sweep, append N mixture rows through "
                        "upsert and measure the in-place maintenance the "
                        "next query pays (0 = skip)")
    p.add_argument("--data-cache", default="",
                   help="npz path to save/load the generated corpus "
                        "(datagen at 2M x 1024 costs ~1h of balloon page "
                        "faults on the dev harness host)")
    args = p.parse_args()
    qs = [int(x) for x in args.qs.split(",")]
    nprobes = [int(x) for x in args.nprobes.split(",")]

    import jax

    # Persistent XLA compile cache: build-time compiles amortize across
    # processes (first-ever run pays them once; the driver rerun doesn't).
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/picovdb_tpu_xla")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from picovdb_tpu import PicoVectorDB, K_ID

    rng = np.random.default_rng(args.seed)
    qmax = max(max(qs), args.recall_queries)
    t0 = time.perf_counter()
    import os

    corpus_dev = None
    if args.gen == "device":
        import jax.numpy as jnp

        key = jax.random.PRNGKey(args.seed)
        kc, kd, kq = jax.random.split(key, 3)
        centers_dev = jax.random.normal(
            kc, (args.centers, args.dim), dtype=jnp.float32
        )
        centers_dev = centers_dev / jnp.linalg.norm(
            centers_dev, axis=1, keepdims=True
        )
        print(f"# generating {args.n}x{args.dim} mixture on device "
              f"({args.centers} centers)", file=sys.stderr)
        # Generate pre-normalized rows straight into the storage dtype: at
        # 4M x 1024 the f32 intermediate alone would be 16 GB.
        corpus_scales = None
        if args.storage_dtype == "int8":
            corpus_dev, corpus_scales = make_mixture_device_i8(
                args.n, args.dim, centers_dev, kd
            )
        elif args.storage_dtype == "int4":
            corpus_dev, corpus_scales = make_mixture_device_i4(
                args.n, args.dim, centers_dev, kd
            )
        else:
            sdt = jnp.bfloat16 if args.storage_dtype == "bfloat16" else None
            corpus_dev = make_mixture_device(
                args.n, args.dim, centers_dev, kd, out_dtype=sdt,
                normalize=True
            )
        corpus_dev.block_until_ready()
        q_dev = make_mixture_device(qmax, args.dim, centers_dev, kq)
        queries = np.array(q_dev)  # writable host copy (asarray is RO)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        if args.incr_epoch > 0:  # epoch rows draw from the true mixture
            centers_host = np.array(centers_dev)
        del q_dev, centers_dev
        data = None
        print(f"# datagen (device): {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
    elif args.data_cache and os.path.exists(args.data_cache):
        blob = np.load(args.data_cache)
        data, queries = blob["data"], blob["queries"]
        assert data.shape == (args.n, args.dim), data.shape
        if args.incr_epoch > 0:  # same construction as the else branch
            centers_host = rng.standard_normal(
                size=(args.centers, args.dim), dtype=np.float32
            )
            centers_host /= np.linalg.norm(
                centers_host, axis=1, keepdims=True
            )
        print(f"# data cache hit: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
    else:
        print(f"# generating {args.n}x{args.dim} mixture "
              f"({args.centers} centers)", file=sys.stderr)
        centers = rng.standard_normal(
            size=(args.centers, args.dim), dtype=np.float32
        )
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        centers_host = centers
        data = make_mixture(args.n, args.dim, centers, rng)
        queries = make_mixture(qmax, args.dim, centers, rng)
        print(f"# datagen: {time.perf_counter()-t0:.1f} s", file=sys.stderr)
        if args.data_cache:
            np.savez(args.data_cache, data=data, queries=queries)
            print("# data cache saved", file=sys.stderr)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        db = PicoVectorDB(
            embedding_dim=args.dim,
            storage_file=f"{tmp}/ivf_scale",
            index=args.index,
            ivf_nlist=args.nlist or None,
            storage_dtype=args.storage_dtype,
        )
        t0 = time.perf_counter()
        if corpus_dev is not None:
            db.ingest_device(corpus_dev, ids=[str(i) for i in range(args.n)],
                             normalize=False,  # rows pre-normalized above
                             scales=corpus_scales)
            corpus_dev = corpus_scales = None  # engine owns them now
        else:
            db.upsert_columnar(data, ids=[str(i) for i in range(args.n)],
                               copy=False)
        t_insert = time.perf_counter() - t0
        print(f"# insert: {t_insert:.2f} s ({args.n/t_insert:.0f} vec/s)",
              file=sys.stderr)

        k = args.topk
        dev = db._dev

        if args.index == "exact":
            db.rebuild_index()  # mirror upload only (no ANN tier)
            m = min(args.recall_queries, 32)
            ev, ei = dev.query(queries[:m], k, None, force_exact=True)
            assert np.isfinite(ev[:, 0]).all()
            M = args.pipeline

            def _drain(pend):
                for rec in pend:
                    for arr in rec[:2]:
                        arr.copy_to_host_async()
                for rec in pend:
                    np.asarray(rec[0]), np.asarray(rec[1])

            rows = []
            for q in qs:
                qdevs = [
                    jax.device_put(queries[i * q: (i + 1) * q])
                    for i in range(min(4, qmax // q) or 1)
                ]

                def run_exact():
                    _drain([dev.query_async(qdevs[i % len(qdevs)], k, None)
                            for i in range(M)])

                run_exact()  # warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_exact()
                    best = min(best, time.perf_counter() - t0)
                t_ex = best / M
                rows.append((q, t_ex))
                print(f"# Q={q:5d}: exact {t_ex*1000:8.2f} ms "
                      f"({q/t_ex:9.0f} QPS)", file=sys.stderr)
            best = max(rows, key=lambda r: r[0] / r[1])
            print(json.dumps({
                "metric": f"exact_qps_{args.n}x{args.dim}d_Q{best[0]}"
                          + (f"_{args.storage_dtype}"
                             if args.storage_dtype else ""),
                "value": round(best[0] / best[1], 1),
                "unit": "qps",
                "insert_s": round(t_insert, 2),
                "exact_ms_q1": (round(rows[0][1] * 1000, 3)
                                if qs[0] == 1 else None),
            }))
            return 0

        t0 = time.perf_counter()
        db.rebuild_index()  # device mirror upload + IVF train/layout
        t_build_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        db.rebuild_index()  # warm centroids: refresh-only retrain
        t_build_warm = time.perf_counter() - t0
        ivf = db._ivf
        assert ivf is not None, "IVF tier did not build"
        mirror = ("int8-only" if ivf.vectors is None
                  else str(ivf.vectors.dtype))
        print(f"# build: cold {t_build_cold:.1f} s / warm {t_build_warm:.1f} s"
              f" (nlist={ivf.nlist}, mirror dtype={mirror})",
              file=sys.stderr)

        # ---- recall sweep: smallest nprobe reaching the target -----------
        # Measured at Q=1 DISPATCHES: the probe kernel scans the batch's
        # hot-tile UNION for every query, so a batched sweep measures the
        # union's coverage, not per-query probe quality — at m=128 the
        # union covers ~the whole index and any nprobe "reaches" ~1.0
        # (the inflated-recall artifact behind the original r3 numbers).
        # Q=1 is the serving case the operating point is quoted for;
        # batched recall is >= this by the union effect. Dispatches are
        # pipelined (independent hot unions), fetched after.
        m = args.recall_queries
        qr = queries[:m]
        ev, ei = dev.query(qr, k, None, force_exact=True)  # oracle
        chosen = None
        for npb in nprobes:
            pend = [
                ivf.search_async(qr[i:i + 1], k, 0, dev, nprobe=npb)
                for i in range(m)
            ]
            recall = np.mean([
                len(set(np.asarray(ii)[0, :k].tolist())
                    & set(ei[i].tolist())) / k
                for i, (iv, ii, nq) in enumerate(pend)
            ])
            print(f"# nprobe {npb:4d}: recall@{k} (Q=1 dispatches) = "
                  f"{recall:.4f}", file=sys.stderr)
            if recall >= args.recall_target and chosen is None:
                chosen = (npb, recall)
        if chosen is None:
            chosen = (nprobes[-1], recall)
            print("# WARNING: recall target not reached in sweep",
                  file=sys.stderr)
        nprobe, recall = chosen
        print(f"# operating point: nprobe={nprobe} (recall {recall:.4f})",
              file=sys.stderr)

        # ---- pipelined device latency: ivf vs exact at several Q ----------
        # Queries are pre-placed on device (the serving contract: embeddings
        # from an upstream on-TPU model) and M dispatches run back-to-back
        # before one blocking fetch wave, so the dev harness's host<->TPU
        # relay RTT (~27 ms/hop) is excluded — same methodology as bench.py's
        # single_query_device_ms.
        M = args.pipeline

        def _drain(pend):
            # overlap the tiny (Q, k) result fetches: without the async
            # copies each np.asarray pays a serial relay round trip, which
            # at ~27 ms/hop swamps the device time entirely
            for rec in pend:
                for arr in rec[:2]:
                    arr.copy_to_host_async()
            for rec in pend:
                np.asarray(rec[0]), np.asarray(rec[1])

        def run_ivf(qdevs):
            _drain([ivf.search_async(qdevs[i % len(qdevs)], k, 0, dev,
                                     nprobe=nprobe) for i in range(M)])

        def run_exact(qdevs):
            _drain([dev.query_async(qdevs[i % len(qdevs)], k, None,
                                    force_exact=True) for i in range(M)])

        def best_of(fn, qdevs, iters=3):
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                fn(qdevs)
                best = min(best, time.perf_counter() - t0)
            return best / M

        rows = []
        batched_recalls = {}
        for q in qs:
            qdevs = [
                jax.device_put(queries[i * q: (i + 1) * q])
                for i in range(min(4, qmax // q) or 1)
            ]
            run_ivf(qdevs); run_exact(qdevs)  # warm compiles
            t_ivf = best_of(run_ivf, qdevs)
            t_ex = best_of(run_exact, qdevs)
            # Recall AT THIS BATCH SHAPE: each Q routes through its own
            # kernel style (Q=1 ladder, Q>1 may use segmax), so the Q=1
            # sweep alone can hide a batched-path truncation (the
            # fifth-session segmax/k_sel depth bug). Batched recall is
            # also >= the Q=1 number via the hot-union effect.
            bi, bii, nq_b = ivf.search_async(queries[:q], k, 0, dev,
                                             nprobe=nprobe)
            bii = np.asarray(bii)[:q, :k]
            m_b = min(q, ei.shape[0])
            r_b = np.mean([
                len(set(bii[i].tolist()) & set(ei[i].tolist())) / k
                for i in range(m_b)
            ])
            batched_recalls[q] = round(float(r_b), 4)
            rows.append((q, t_ivf, t_ex))
            print(f"# Q={q:5d}: ivf {t_ivf*1000:8.2f} ms ({q/t_ivf:9.0f} QPS)"
                  f" | exact {t_ex*1000:8.2f} ms ({q/t_ex:9.0f} QPS)"
                  f" | speedup {t_ex/t_ivf:5.2f}x"
                  f" | recall@{k}(batch,{m_b}q) {r_b:.4f}", file=sys.stderr)

        best = max(rows, key=lambda r: r[2] / r[1])

        # ---- optional in-place maintenance epoch (--incr-epoch N) ---------
        # Appends N fresh mixture rows through the public upsert lane and
        # times the dirty-epoch maintenance the NEXT query pays — the
        # real-hardware counterpart of bench/mesh_incr_ab.py's CPU-mesh
        # A/B. The comparator is this same run's warm full rebuild
        # (build_warm_s): the pre-round-4 policy re-entered it every
        # dirty epoch. Parity evidence: each appended row must be its own
        # top-1 through the served (engine) lane, and the pre-mutation
        # operating-point recall must hold on the old oracle queries.
        epoch = None
        if args.incr_epoch > 0:
            n_new = args.incr_epoch
            new_rows = make_mixture(n_new, args.dim, centers_host,
                                    np.random.default_rng(args.seed + 1))
            # clean-query wall at the same shape, pre-mutation
            db.query(queries[0], top_k=k)
            t0 = time.perf_counter()
            db.query(queries[1], top_k=k)
            t_clean = time.perf_counter() - t0
            new_ids = [f"new{i}" for i in range(n_new)]
            db.upsert_columnar(new_rows.copy(), ids=new_ids)
            t0 = time.perf_counter()
            db.query(queries[2], top_k=k)
            t_dirty = time.perf_counter() - t0
            mode = db._last_ann_rebuild_mode
            dbg = db.last_query_debug().get("ann_operating_point") or {}
            # appended rows must be served (exact rescore re-reads the
            # corpus, so a hit proves postings routing, not luck)
            hits = sum(
                1 for i in range(min(32, n_new))
                if db.query(new_rows[i], top_k=1)[0][K_ID] == new_ids[i]
            )
            # operating-point recall post-epoch vs a FRESH exact oracle
            # (the appended rows can legitimately enter true top-k sets,
            # so the pre-epoch oracle would report displacement as loss)
            ev2, ei2 = dev.query(qr, k, None, force_exact=True)
            pend = [ivf.search_async(qr[i:i + 1], k, 0, dev, nprobe=nprobe)
                    for i in range(m)]
            recall_post = np.mean([
                len(set(np.asarray(ii)[0, :k].tolist())
                    & set(ei2[i].tolist())) / k
                for i, (iv, ii, nq) in enumerate(pend)
            ])
            epoch = {
                "changed": n_new,
                "maintenance_s": round(max(t_dirty - t_clean, 0.0), 3),
                "dirty_query_s": round(t_dirty, 3),
                "clean_query_s": round(t_clean, 3),
                "rebuild_mode": mode,
                "vs_full_rebuild_s": round(t_build_warm, 1),
                "self_top1_hits": f"{hits}/{min(32, n_new)}",
                "recall_post_epoch": round(float(recall_post), 4),
                "overflow_fraction": dbg.get("overflow_fraction"),
                "clip_fraction": dbg.get("last_update_clip_fraction"),
            }
            print(f"# incr epoch ({n_new} rows): maintenance "
                  f"{epoch['maintenance_s']} s ({mode}) vs warm rebuild "
                  f"{t_build_warm:.1f} s; self-top1 {epoch['self_top1_hits']},"
                  f" recall(fresh oracle) {recall_post:.4f}", file=sys.stderr)

        out = {
            "metric": f"ivf_speedup_vs_exact_{args.n}x{args.dim}d_Q{best[0]}"
                      f"_recall{recall:.3f}",
            "value": round(best[2] / best[1], 2),
            "unit": "x",
            "nprobe": nprobe,
            "nlist": ivf.nlist,
            "build_cold_s": round(t_build_cold, 1),
            "build_warm_s": round(t_build_warm, 1),
            "qps_ivf": round(best[0] / best[1], 0),
            "qps_exact": round(best[0] / best[2], 0),
            "ivf_ms_q1": round(rows[0][1] * 1000, 3) if qs[0] == 1 else None,
            "exact_ms_q1": round(rows[0][2] * 1000, 3) if qs[0] == 1 else None,
            "batched_recalls": batched_recalls,
        }
        if epoch is not None:
            out["incr_epoch"] = epoch
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
