"""Incremental vs full-rebuild mesh-IVF maintenance A/B (VERDICT r3 #2).

Builds a mesh IVF store on the virtual 8-device CPU mesh, applies an
identical small mutation epoch under two policies, and measures the wall
from "store dirty" to "first query served":

  * incremental (the default): per-shard overflow-region scatters,
    O(changed) device work, no host corpus materialization, no k-means
    (parallel/ivf_mesh.py::ShardedIVF.update);
  * full (forced with faiss_incremental_threshold_ratio=0.0): the
    pre-round-4 policy — host materialization + k-means warm-start +
    full re-quantization/upload per dirty epoch (engine._rebuild_ann).

Both arms then assert oracle parity on the post-mutation corpus (full
probe), so the speedup is not bought with stale results.

Usage:
  python bench/mesh_incr_ab.py [--rows 1000000] [--dim 64] [--changed 1000]
Writes bench/results/mesh_incr_ab_r4.json.
"""

import argparse
import json
import os
import time

import set_path  # noqa: F401

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get(
    "XLA_FLAGS", ""
):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR  # noqa: E402
from picovdb_tpu.parallel.mesh import make_mesh  # noqa: E402
from picovdb_tpu.utils import normalize_batch  # noqa: E402


def _build(path, vectors, mesh, nlist, ratio, storage=None):
    db = PicoVectorDB(
        embedding_dim=vectors.shape[1], storage_file=path, mesh=mesh,
        index="ivf", ivf_nlist=nlist,
        faiss_incremental_threshold_ratio=ratio,
        storage_dtype=storage,
    )
    db.upsert_columnar(
        vectors.copy(), ids=[str(i) for i in range(len(vectors))]
    )
    t0 = time.perf_counter()
    db.query(vectors[0], top_k=10)  # build epoch
    build_s = time.perf_counter() - t0
    assert db._last_ann_rebuild_mode == "full"
    return db, build_s


def _mutate_and_serve(db, new, upd_ids, del_ids, q, k):
    """One mutation epoch + the single query that pays for it (default
    probe width — the serving case); returns (wall_s, rebuild_mode).
    The caller verifies parity separately with an untimed full probe."""
    db.upsert(
        [{K_ID: f"new{j}", K_VECTOR: new[j]} for j in range(len(new))]
        + [{K_ID: i, K_VECTOR: r} for i, r in upd_ids]
    )
    db.delete(del_ids)
    t0 = time.perf_counter()
    db.query(q[0], top_k=k)
    wall = time.perf_counter() - t0
    return wall, db._last_ann_rebuild_mode


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--changed", type=int, default=1000)
    p.add_argument("--nlist", type=int, default=0)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--queries", type=int, default=16)
    p.add_argument("--storage", default=None,
                   help="storage_dtype (int8 exercises the int8-only "
                        "layout's frozen-scale in-place updates)")
    p.add_argument("--out", default="bench/results/mesh_incr_ab_r4.json")
    args = p.parse_args()
    if args.storage == "int8":
        # the int8-only postings layout is the only layout for int8
        # storage; enable it below IVF_I8_MIN_DIM at bench dims
        os.environ.setdefault("PICOVDB_IVF_I8", "1")

    rng = np.random.default_rng(7)
    n, dim, k = args.rows, args.dim, args.topk
    nlist = args.nlist or max(16, int(2 * np.sqrt(n)) // 8 * 8)
    print(f"STARTED mesh_incr_ab rows={n} dim={dim} changed={args.changed} "
          f"nlist={nlist}", flush=True)
    centers = rng.normal(size=(max(64, nlist), dim)).astype(np.float32)
    vectors = normalize_batch(
        centers[rng.integers(0, len(centers), n)]
        + 0.25 * rng.normal(size=(n, dim)).astype(np.float32)
    )
    mesh = make_mesh()

    m = args.changed
    new = normalize_batch(
        rng.normal(size=(m, dim)).astype(np.float32)
    )
    upd = normalize_batch(rng.normal(size=(m // 2, dim)).astype(np.float32))
    upd_pairs = [(str(1000 + j), upd[j]) for j in range(m // 2)]
    del_ids = [str(5000 + j) for j in range(m // 2)]
    q = normalize_batch(
        rng.normal(size=(args.queries, dim)).astype(np.float32)
    )

    out = {"shape": f"{n}x{dim}", "changed": m, "nlist": nlist,
           "storage": args.storage or "float32", "arms": {}}
    ids_by_arm = {}
    for arm, ratio in (("incremental", 0.2), ("full", 0.0)):
        db, build_s = _build(
            f"/tmp/mesh_incr_{arm}", vectors, mesh, nlist, ratio,
            storage=args.storage,
        )
        # WARM epoch (8 rows): compiles the maintenance programs (scatter
        # chain / rebuild pipeline) so the timed epoch measures the
        # steady-state policy cost, not first-touch XLA compiles.
        warm = normalize_batch(
            rng.normal(size=(8, dim)).astype(np.float32)
        )
        _mutate_and_serve(
            db, warm, [], [str(9000 + j) for j in range(4)], q, k
        )
        wall, mode = _mutate_and_serve(db, new, upd_pairs, del_ids, q, k)
        # steady-state single-query wall on the now-clean store (isolates
        # the maintenance cost inside `wall`)
        t0 = time.perf_counter()
        db.query(q[0], top_k=k)
        clean = time.perf_counter() - t0
        expect = "incremental" if ratio else "full"
        assert mode == expect, (arm, mode)
        out["arms"][arm] = {
            "build_s": round(build_s, 3),
            "dirty_epoch_wall_s": round(wall, 3),
            "maintenance_s": round(max(0.0, wall - clean), 3),
            "clean_query_wall_s": round(clean, 3),
            "rebuild_mode": mode,
        }
        # untimed parity evidence: full probe over the mutated store
        ids_by_arm[arm], _ = db.query_columnar(
            q, top_k=k, ef_search=10**6
        )
        print(f"  {arm}: dirty-epoch {wall:.3f}s (clean {clean:.3f}s, "
              f"build was {build_s:.1f}s)", flush=True)

    # parity: both policies must serve the identical post-mutation top-k
    mismatch = int(
        (ids_by_arm["incremental"] != ids_by_arm["full"]).sum()
    )
    out["topk_id_mismatches"] = mismatch
    out["speedup_dirty_epoch"] = round(
        out["arms"]["full"]["dirty_epoch_wall_s"]
        / max(1e-9, out["arms"]["incremental"]["dirty_epoch_wall_s"]), 2
    )
    # The maintenance ratio is only meaningful when the incremental arm's
    # maintenance is resolvable above query-wall noise; at large N on the
    # virtual CPU mesh it rounds to ~0 and the ratio degenerates. Report
    # null then — the full arm's maintenance_s IS the rebuild wall.
    inc_maint = out["arms"]["incremental"]["maintenance_s"]
    out["speedup_maintenance"] = (
        round(out["arms"]["full"]["maintenance_s"] / inc_maint, 1)
        if inc_maint >= 0.05 else None
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    assert mismatch == 0, f"{mismatch} top-k id mismatches between arms"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
