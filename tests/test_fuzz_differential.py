"""Randomized differential test: engine vs a plain-NumPy model.

The targeted suites pin individual behaviors; this fuzz drives random
operation sequences (upsert new/existing/zero vectors, deletes incl.
missing ids, filtered queries in every form, save/reload, vacuum)
against an oracle model and checks every query result — the
property-based complement of the reference's behavior tests
(SURVEY.md §4). Seeded: failures reproduce exactly.
"""

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_METRICS, K_VECTOR
from picovdb_tpu.utils import hash_vec, normalize_batch

DIM = 24


class Model:
    """Reference semantics in plain numpy: id -> (unit vector, doc)."""

    def __init__(self):
        self.rows: dict[str, tuple[np.ndarray, dict]] = {}

    def upsert(self, items):
        for _id, vec, doc in items:
            v = normalize_batch(vec[None, :].astype(np.float32))[0]
            self.rows[_id] = (v, doc)

    def delete(self, ids):
        for _id in ids:
            self.rows.pop(_id, None)

    def query(self, qvec, top_k, better_than=None, where=None, ids=None):
        q = normalize_batch(qvec[None, :].astype(np.float32))[0]
        cand = self.rows
        if ids is not None:
            cand = {i: cand[i] for i in ids if i in cand}
        out = []
        for _id, (v, doc) in cand.items():
            if where is not None:
                if callable(where):
                    if not where(doc):
                        continue
                else:
                    (key, want), = where.items()
                    got = doc.get(key)
                    if isinstance(want, dict):
                        if got not in want["$in"]:
                            continue
                    elif got != want:
                        continue
            s = float(q @ v)
            if better_than is not None and s < better_than:
                continue
            out.append((s, _id))
        out.sort(key=lambda t: -t[0])
        return out[:top_k]


def check(model_full, engine_hits, top_k, tol=1e-4):
    """`model_full` is the FULL ranking over the filtered candidates
    (not just top-k): exact ties at the k boundary — e.g. two zero
    vectors both normalizing to e0 — make either pick legitimate, so the
    id check validates the returned id's true score rather than its
    membership in the model's top-k slice."""
    model_hits = model_full[:top_k]
    assert len(engine_hits) == len(model_hits), (
        engine_hits, model_hits
    )
    id2score = {i: s for s, i in model_full}
    for rank, hit in enumerate(engine_hits):
        m_score = model_hits[rank][0]
        assert abs(hit[K_METRICS] - m_score) < tol, (rank, hit, model_hits)
        # the returned id must exist and truly score what was returned
        assert hit[K_ID] in id2score, (rank, hit)
        assert abs(id2score[hit[K_ID]] - hit[K_METRICS]) < tol, (
            rank, hit, id2score[hit[K_ID]]
        )


# storage tiers: (dtype, score tolerance). The quantized tiers return
# scores at storage precision; `better_than` applies to those scores, so
# floor-adjacent inclusion may legitimately differ from the f32 model -
# for quantized storage such queries check floor compliance + per-id
# score proximity instead of strict hit-set equality.
STORAGE_CASES = [
    (None, 1e-4, {}),
    ("bfloat16", 1.2e-2, {}),
    ("int8", 1.2e-2, {}),
    # memmap + fixed capacity: the pre-allocated store (reference's
    # capacity mode, picovdb/pico_vdb.py:286-300) under the same ops
    (None, 1e-4, {"use_memmap": True, "capacity": 2048}),
    # quantized storage over a pre-allocated memmap host matrix
    ("int8", 1.2e-2, {"use_memmap": True, "capacity": 2048}),
    # rescore="auto" (the default, covered above) serves these small
    # batches through the host-f64 rescore tier; keep the device-ranked
    # path under fuzz too
    ("int8", 1.2e-2, {"rescore": "device"}),
    ("bfloat16", 1.2e-2, {"rescore": "device"}),
    # packed int4 storage: the auto host-f64 rescore makes served scores
    # exact despite 4-bit residency; device-ranked int4 is too noisy for
    # the model's hit-set checks by design (tests/test_int4_storage.py
    # covers that path's contract directly)
    ("int4", 1.2e-2, {}),
    # forced IVF tier at full probe width (nprobe == nlist probes every
    # cluster, so results are exact-equivalent and oracle-comparable):
    # fuzzes the ANN tier's lazy rebuild / incremental maintenance /
    # serving-lane routing under arbitrary mutation sequences
    (None, 1e-4, {"index": "ivf", "ivf_nlist": 8, "ivf_nprobe": 8}),
    # device-born start (`ingest_device`): mutations ride the lazy host
    # overlay (no corpus materialization) — random upsert/delete/save/
    # vacuum interleavings soak the overlay + sync-scatter + merge paths.
    # f32 keeps exact oracle scores; int8 adds the lossy device-ranked arm
    # (host-f64 rescore stands down on device-born lossy stores).
    (None, 1e-4, {"device_born": True}),
    ("int8", 1.2e-2, {"device_born": True}),
]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("sdt,tol,extra", STORAGE_CASES)
def test_fuzz_engine_matches_numpy_model(tmp_path, seed, rng, sdt, tol,
                                         extra):
    r = np.random.default_rng(1000 + seed)
    path = str(tmp_path / f"fuzz{seed}")
    device_born = bool(extra.get("device_born", False))
    ctor = {k: v for k, v in extra.items() if k != "device_born"}
    db = PicoVectorDB(embedding_dim=DIM, storage_file=path,
                      storage_dtype=sdt, **ctor)
    model = Model()
    next_id = 0
    if device_born:
        # Start from a device-born corpus (`ingest_device`): every later
        # mutation rides the lazy host overlay — random interleavings of
        # upsert/delete/save/vacuum against the oracle soak that path.
        import jax.numpy as jnp

        n0 = 40
        rows0 = normalize_batch(
            r.normal(size=(n0, DIM)).astype(np.float32)
        )
        ids0 = [f"id{i}" for i in range(n0)]
        db.ingest_device(jnp.asarray(rows0), ids=ids0,
                         metadata=[{"group": int(i % 4),
                                    "rank": int(i % 100)} for i in range(n0)])
        model.upsert([
            (ids0[i], rows0[i],
             {"group": int(i % 4), "rank": int(i % 100), K_ID: ids0[i]})
            for i in range(n0)
        ])
        next_id = n0
        assert db._host_lazy

    def rand_vec():
        if r.random() < 0.03:
            return np.zeros(DIM, dtype=np.float32)  # zero -> e0 path
        return r.normal(size=DIM).astype(np.float32)

    for step in range(60):
        op = r.random()
        if op < 0.35:  # upsert batch (mix of new and existing ids)
            batch = []
            payload = []
            for _ in range(int(r.integers(1, 12))):
                vec = rand_vec()
                base = {"group": int(r.integers(0, 4)),
                        "rank": int(r.integers(0, 100))}
                if r.random() < 0.1:  # md5 content auto-id (no _id_ given)
                    _id = hash_vec(
                        normalize_batch(vec[None, :].astype(np.float32))[0]
                    )
                    payload.append({**base, K_VECTOR: vec})
                elif model.rows and r.random() < 0.3:
                    _id = str(r.choice(sorted(model.rows)))
                    payload.append({**base, K_ID: _id, K_VECTOR: vec})
                else:
                    _id = f"v{next_id}"
                    next_id += 1
                    payload.append({**base, K_ID: _id, K_VECTOR: vec})
                batch.append((_id, vec, {**base, K_ID: _id}))
            db.upsert(payload)
            model.upsert(batch)
        elif op < 0.5 and model.rows:  # delete (some missing)
            ids = list(r.choice(sorted(model.rows),
                                size=min(3, len(model.rows)),
                                replace=False))
            if r.random() < 0.3:
                ids.append("missing-id")
            db.delete(ids)
            model.delete(ids)
        elif op < 0.6:  # persistence round-trip
            db.save()
            db = PicoVectorDB(embedding_dim=DIM, storage_file=path,
                              storage_dtype=sdt, **ctor)
        elif op < 0.63:
            db.vacuum()
        elif op < 0.64:
            db.rebuild_index()
        elif op < 0.65:
            db.flush()
        elif op < 0.72 and model.rows:  # 2-D batch, all three lanes
            qb = np.stack([rand_vec() for _ in range(int(r.integers(2, 6)))])
            lane = r.random()
            if lane < 0.4:
                outs = db.query(qb, top_k=3)
            elif lane < 0.7:  # throughput lane, chunked dispatch
                outs = db.query_batched(qb, top_k=3, batch_size=2)
            else:  # columnar serving lane -> rebuild dict-like rows
                ids_col, scores_col = db.query_columnar(
                    qb, top_k=3, batch_size=2
                )
                outs = [
                    [{K_ID: i, K_METRICS: float(sc)}
                     for i, sc in zip(ids_col[row], scores_col[row])
                     if i is not None]
                    for row in range(qb.shape[0])
                ]
            assert len(outs) == qb.shape[0]
            for row_q, row_hits in zip(qb, outs):
                check(model.query(row_q, 10**9), row_hits, 3, tol=tol)
        else:  # query, every filter form
            q = rand_vec()
            top_k = int(r.integers(1, 8))
            better = float(r.uniform(-0.2, 0.4)) if r.random() < 0.3 else None
            where = None
            ids = None
            f = r.random()
            if f < 0.2:
                where = {"group": int(r.integers(0, 4))}
            elif f < 0.35:
                where = {"group": {"$in": [0, 2]}}
            elif f < 0.45:
                lim = int(r.integers(0, 100))
                where = (lambda lim: lambda d: d.get("rank", 0) < lim)(lim)
            elif f < 0.6 and model.rows:
                pool = sorted(model.rows)
                ids = list(r.choice(
                    pool, size=min(5, len(pool)), replace=False
                )) + ["missing-id"]
            res = db.query(q, top_k=top_k, better_than=better,
                           where=where, ids=ids)
            if res == [[]]:
                # the reference's empty-result quirk for 1-D queries:
                # empty store, fully-filtering where, or all-missing ids
                # all return [[]] (verified against the actual reference;
                # better_than filtering to zero hits returns [] instead)
                assert not model.query(q, top_k, better, where, ids)
                continue
            if not model.rows:
                assert res == [[]]
                continue
            if better is not None and sdt is not None:
                # quantized scores near the floor may flip inclusion;
                # only check that returned hits respect the floor and
                # score near the model's value for that id
                id2score = {
                    i: sc for sc, i in
                    model.query(q, len(model.rows), None, where, ids)
                }
                for hit in res:
                    assert hit[K_METRICS] >= better
                    assert abs(hit[K_METRICS] - id2score[hit[K_ID]]) < tol
                continue
            check(model.query(q, 10**9, better, where, ids), res, top_k,
                  tol=tol)

    # final full-state comparison
    assert db.count() == len(model.rows)
    got = {rec[K_ID] for rec in db.get_all()}
    assert got == set(model.rows)


def test_fuzz_mesh_int4(tmp_path, rng):
    """One fuzz seed with the packed int4 tier over the 8-device mesh:
    random mutation/query/persistence sequences must match the numpy
    model through the sharded nibble lanes (`local_quant`) + host-f64
    rescore, exactly like the single-device cells above. Single seed —
    mesh dispatch makes each step ~4x a single-device step on CPU."""
    from picovdb_tpu.parallel import make_mesh

    test_fuzz_engine_matches_numpy_model(
        tmp_path, 0, rng, "int4", 1.2e-2, {"mesh": make_mesh()}
    )


def test_fuzz_i8only_ivf(tmp_path, rng, monkeypatch):
    """One fuzz seed with the forced int8-only IVF layout (int8 storage,
    index='ivf' at full probe): soaks the frozen-scale requantize-on-append
    update path, its clip-guard fallback to full rebuilds, and the
    slot-rescore serving lane under arbitrary mutation sequences. Served
    scores are storage-precision (host-f64 rescore over int8-born rows),
    same tolerance as the plain int8 cells."""
    monkeypatch.setenv("PICOVDB_IVF_I8", "1")  # enable below IVF_I8_MIN_DIM
    test_fuzz_engine_matches_numpy_model(
        tmp_path, 0, rng, "int8", 1.2e-2,
        {"index": "ivf", "ivf_nlist": 8, "ivf_nprobe": 8},
    )


def test_fuzz_int4_ivf(tmp_path, rng, monkeypatch):
    """One fuzz seed with int4 storage + forced IVF: the int8-only
    postings select, the slot rescore unpacks the packed int4 corpus, and
    the host-f64 rescore makes served scores exact on host-born rows —
    soaking the int4 ANN routing (build/incremental/clip-guard) under
    random mutation sequences."""
    monkeypatch.setenv("PICOVDB_IVF_I8", "1")  # enable below IVF_I8_MIN_DIM
    test_fuzz_engine_matches_numpy_model(
        tmp_path, 0, rng, "int4", 1.2e-2,
        {"index": "ivf", "ivf_nlist": 8, "ivf_nprobe": 8},
    )
