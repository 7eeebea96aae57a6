"""Persistence: atomic saves, crash safety, memmap mode, capacity ceiling.

Mirrors tests/test_more.py:271-293 (atomic save failure) and
tests/test_memmap_capacity.py of the reference, plus byte-compatibility with
the reference's on-disk format.
"""

import json
import os
from unittest.mock import patch

import numpy as np
import pytest

from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR
from picovdb_tpu.utils import ids_path, meta_path, vecs_path
from conftest import make_items


def test_save_writes_three_files(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    db.save()
    assert os.path.exists(ids_path(db_path))
    assert os.path.exists(vecs_path(db_path))
    assert os.path.exists(meta_path(db_path))
    # no stray tmp files
    d = os.path.dirname(db_path)
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]


def test_save_failure_preserves_old_files(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 5, 8)
    db.upsert(items)
    db.save()
    old_ids = open(ids_path(db_path)).read()

    db.upsert([{K_ID: "extra", K_VECTOR: rng.normal(size=8).astype(np.float32)}])
    with patch("os.replace", side_effect=OSError("disk full")):
        with pytest.raises(OSError):
            db.save()
    # old files intact, tmp files cleaned up
    assert open(ids_path(db_path)).read() == old_ids
    d = os.path.dirname(db_path)
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    # retry succeeds
    db.save()
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db2.count() == 6


def test_on_disk_format_matches_reference_schema(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, _ = make_items(rng, 4, 8, extra=lambda i: {"n": i})
    db.upsert(items)
    db.store_additional_data(k="v")
    db.save()
    ids = json.load(open(ids_path(db_path)))
    assert ids == [f"id{i}" for i in range(4)]
    meta = json.load(open(meta_path(db_path)))
    assert set(meta.keys()) == {"embedding_dim", "data", "additional_data"}
    assert meta["embedding_dim"] == 8
    assert meta["data"][2]["n"] == 2
    assert meta["data"][2][K_ID] == "id2"
    assert meta["additional_data"] == {"k": "v"}
    vecs = np.load(vecs_path(db_path))
    assert vecs.dtype == np.float32
    assert vecs.shape == (4, 8)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-6)


def test_load_reference_written_store(db_path, rng):
    """A store written externally in the reference's format loads directly."""
    ids = ["a", "b", None]
    vecs = rng.normal(size=(3, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[2] = 0
    docs = [{K_ID: "a", "x": 1}, {K_ID: "b", "x": 2}, None]
    with open(ids_path(db_path), "w") as f:
        json.dump(ids, f)
    np.save(vecs_path(db_path)[:-4], vecs)
    with open(meta_path(db_path), "w") as f:
        json.dump({"embedding_dim": 8, "data": docs, "additional_data": {"z": 9}}, f)

    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db.count() == 2
    assert db.capacity() == 3
    assert db._free == [2]
    assert db.get_additional_data() == {"z": 9}
    res = db.query(vecs[0], top_k=1)
    assert res[0][K_ID] == "a"


def test_memmap_capacity_preallocation(db_path, rng):
    db = PicoVectorDB(
        embedding_dim=8, storage_file=db_path, use_memmap=True, capacity=10
    )
    assert db.capacity() == 10
    assert db.count() == 0
    items, vecs = make_items(rng, 10, 8)
    db.upsert(items)
    assert db.count() == 10
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert([{K_ID: "over", K_VECTOR: rng.normal(size=8).astype(np.float32)}])
    # delete frees a slot; insert succeeds again
    db.delete(["id0"])
    db.upsert([{K_ID: "over", K_VECTOR: rng.normal(size=8).astype(np.float32)}])
    assert db.count() == 10


def test_memmap_flush_and_reload(db_path, rng):
    db = PicoVectorDB(
        embedding_dim=8, storage_file=db_path, use_memmap=True, capacity=6
    )
    items, vecs = make_items(rng, 4, 8)
    db.upsert(items)
    db.query(vecs[0])  # force device sync, exercise memmap reads
    db.save()
    db.flush()
    db2 = PicoVectorDB(
        embedding_dim=8, storage_file=db_path, use_memmap=True, capacity=6
    )
    assert db2.count() == 4
    assert db2.capacity() == 6
    res = db2.query(vecs[1], top_k=1)
    assert res[0][K_ID] == "id1"


def test_fixed_capacity_without_memmap(db_path, rng):
    """Deviation from the reference (documented in engine.py): capacity
    without memmap pre-allocates a usable fixed-size store."""
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path, capacity=5)
    items, _ = make_items(rng, 5, 8)
    db.upsert(items)
    assert db.count() == 5
    with pytest.raises(ValueError, match="capacity exceeded"):
        db.upsert([{K_ID: "x", K_VECTOR: np.ones(8, dtype=np.float32)}])


def test_reload_then_mutate_then_query(db_path, rng):
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 8, 8)
    db.upsert(items)
    db.save()
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    v = rng.normal(size=8).astype(np.float32)
    db2.upsert([{K_ID: "late", K_VECTOR: v}])
    res = db2.query(v, top_k=1)
    assert res[0][K_ID] == "late"
    db2.delete(["id7"])
    res2 = db2.query(vecs[7], top_k=8)
    assert all(r[K_ID] != "id7" for r in res2)


def test_sharded_save_and_reload(db_path, rng):
    """New capability: per-shard vector files (multi-host layout)."""
    import glob

    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 25, 8)
    db.upsert(items)
    db.save(shards=4)
    shard_files = sorted(glob.glob(db_path + ".vecs.shard*.npy"))
    assert len(shard_files) == 4
    assert not os.path.exists(db_path + ".vecs.npy")

    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db2.count() == 25
    res = db2.query(vecs[9], top_k=1)
    assert res[0][K_ID] == "id9"

    # switching back to single-file removes stale shards
    db2.save()
    assert os.path.exists(db_path + ".vecs.npy")
    assert not glob.glob(db_path + ".vecs.shard*.npy")
    db3 = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    assert db3.count() == 25


def test_streaming_full_upload(db_path, rng, monkeypatch):
    """Chunked host->HBM upload path returns identical query results."""
    from picovdb_tpu.device import DeviceIndex

    monkeypatch.setattr(DeviceIndex, "STREAM_CHUNK_ROWS", 16)
    db = PicoVectorDB(embedding_dim=8, storage_file=db_path)
    items, vecs = make_items(rng, 100, 8)
    db.upsert(items)
    res = db.query(vecs[37], top_k=3)  # triggers streamed upload (100 > 16)
    assert res[0][K_ID] == "id37"
    assert db._dev.cap >= 100
    # streamed and non-streamed mirrors agree
    monkeypatch.setattr(DeviceIndex, "STREAM_CHUNK_ROWS", 1_000_000)
    db2 = PicoVectorDB(embedding_dim=8, storage_file=db_path + "b")
    db2.upsert(items)
    res2 = db2.query(vecs[37], top_k=3)
    assert [r[K_ID] for r in res] == [r[K_ID] for r in res2]


def test_sharded_save_of_memmap_store_converts_to_ram(db_path, rng):
    """Sharded save must not unlink the live memmap's backing file (ADVICE
    r1, low): the store converts to RAM first and memmap mode ends."""
    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    dim, n = 16, 20
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      use_memmap=True, capacity=n)
    db.upsert([{K_ID: str(i), K_VECTOR: vecs[i]} for i in range(n)])
    db.save(shards=4)
    assert not isinstance(db._host_vectors, np.memmap)
    # flush() after the conversion must be a harmless no-op
    db.flush()
    # post-conversion mutations + queries still work
    db.upsert([{K_ID: "0", K_VECTOR: vecs[1]}])
    res = db.query(vecs[2], top_k=1)
    assert res[0][K_ID] == "2"
    # reload comes back from the shard files
    db2 = PicoVectorDB(embedding_dim=dim, storage_file=db_path)
    assert db2.count() == n
    assert db2.query(vecs[5], top_k=1)[0][K_ID] == "5"


def test_vacuum_keeps_fixed_capacity(db_path, rng):
    """vacuum on a fixed-capacity (memmap) store compacts IN PLACE: the
    pre-allocation survives and inserts keep working until the count
    reaches capacity (found by the fuzz soak: vacuum used to clear the
    free list, so the very next insert raised 'capacity exceeded')."""
    import numpy as np

    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    cap, dim = 64, 8
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                      use_memmap=True, capacity=cap)
    vecs = rng.normal(size=(40, dim)).astype(np.float32)
    db.upsert([{K_ID: f"v{i}", K_VECTOR: vecs[i]} for i in range(40)])
    db.delete([f"v{i}" for i in range(10)])
    db.vacuum()
    assert db.count() == 30 and db.capacity() == cap
    # querying still finds the compacted rows
    r = db.query(vecs[20], top_k=1)
    assert r[0][K_ID] == "v20"
    # inserts work up to capacity, then raise like the reference
    more = rng.normal(size=(cap - 30, dim)).astype(np.float32)
    db.upsert([{K_ID: f"m{i}", K_VECTOR: more[i]}
               for i in range(cap - 30)])
    assert db.count() == cap
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        db.upsert([{K_ID: "over", K_VECTOR: vecs[0]}])
    # persistence round-trip preserves the compacted capacity store
    db.save()
    db2 = PicoVectorDB(embedding_dim=dim, storage_file=db_path,
                       use_memmap=True, capacity=cap)
    assert db2.count() == cap and db2.capacity() == cap
    assert db2.query(vecs[20], top_k=1)[0][K_ID] == "v20"


@pytest.mark.parametrize("cap_kwargs", [{}, {"use_memmap": True,
                                             "capacity": 32}])
def test_vacuum_all_deleted_clears_device_mask(db_path, rng, cap_kwargs):
    """vacuum with ZERO actives must not leave the device mirror's mask
    stale: deletes are lazily synced, and vacuum used to clear the
    pending sets without uploading the cleared mask — a later upsert
    then scattered only its own row, leaving ghost actives that could
    outrank it (review finding)."""
    import numpy as np

    from picovdb_tpu import PicoVectorDB, K_ID, K_VECTOR

    dim = 8
    db = PicoVectorDB(embedding_dim=dim, storage_file=db_path, **cap_kwargs)
    vecs = rng.normal(size=(10, dim)).astype(np.float32)
    db.upsert([{K_ID: f"v{i}", K_VECTOR: vecs[i]} for i in range(10)])
    db.query(vecs[0], top_k=3)  # sync the device mirror (10 actives)
    db.delete([f"v{i}" for i in range(10)])  # lazily pending
    db.vacuum()  # n == 0: must schedule a device mask repair
    assert db.count() == 0
    new = rng.normal(size=dim).astype(np.float32)
    db.upsert([{K_ID: "fresh", K_VECTOR: new}])
    hits = db.query(vecs[3], top_k=5)  # query an OLD vector
    assert [h[K_ID] for h in hits] == ["fresh"], hits


# ------------------------------------------------- quantized persistence

def _device_born_store(db_path, rng, sdt, n=200, dim=32, index="exact"):
    import jax.numpy as jnp

    data = rng.normal(size=(n, dim)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    db = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, storage_dtype=sdt,
        index=index,
    )
    db.ingest_device(
        jnp.asarray(data), ids=[f"q{i}" for i in range(n)],
        metadata=[{"i": i} for i in range(n)], normalize=False,
    )
    return db, data


@pytest.mark.parametrize("sdt", ["int8", "int4"])
def test_quantized_save_reload_roundtrip(db_path, rng, sdt):
    """save(quantized=True) writes the packed plane + scales (no f32
    matrix); reload reconstructs a lazy store with identical query
    results, vectors, and overlay-exact mutated rows (VERDICT r4 #2)."""
    from picovdb_tpu.persistence import (
        overlay_path, qscale_path, qvecs_path,
    )

    db, data = _device_born_store(db_path, rng, sdt)
    n, dim = data.shape
    # mutate while lazy: overlay rows must survive the round trip exactly
    newv = np.zeros(dim, dtype=np.float32)
    newv[0] = 1.0
    db.upsert([{K_ID: "q5", K_VECTOR: newv}])
    db.delete(["q7"])
    assert db._host_lazy
    db.save(quantized=True)
    assert db._host_lazy  # the save itself must not materialize

    assert os.path.exists(qvecs_path(db_path))
    assert os.path.exists(qscale_path(db_path))
    assert os.path.exists(overlay_path(db_path))
    assert not os.path.exists(vecs_path(db_path))
    cols = dim // 2 if sdt == "int4" else dim
    plane = np.load(qvecs_path(db_path))
    assert plane.shape == (n, cols) and plane.dtype == np.int8

    db2 = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, storage_dtype=sdt
    )
    assert db2._host_lazy
    assert db2.count() == n - 1
    # overlay rows restored exactly (normalized form of the upsert)
    got5 = db2.get(["q5"], include_vector=True)[0][K_VECTOR]
    np.testing.assert_array_equal(got5, db._host_row(db._id2idx["q5"]))
    # query parity against the pre-save store
    q = rng.normal(size=(8, dim)).astype(np.float32)
    want = [[h[K_ID] for h in row] for row in db.query(q, top_k=5)]
    got = [[h[K_ID] for h in row] for row in db2.query(q, top_k=5)]
    assert got == want
    # deleted row stays deleted; vectors match tier-exactly
    assert db2.get(["q7"]) == []
    recs = db2.get_all(include_vector=True)
    for rec in recs:
        idx = db._id2idx[rec[K_ID]]
        np.testing.assert_allclose(
            rec[K_VECTOR], db._host_row(idx), atol=0, rtol=0
        )
    # the reloaded store mutates + saves again
    db2.upsert([{K_ID: "fresh", K_VECTOR: rng.normal(size=dim).astype(np.float32)}])
    assert db2.query(db2.get(["fresh"], include_vector=True)[0][K_VECTOR],
                     top_k=1)[0][K_ID] == "fresh"
    db2.save(quantized=True)
    db3 = PicoVectorDB(
        embedding_dim=dim, storage_file=db_path, storage_dtype=sdt
    )
    assert db3.count() == n
    assert db3.get(["fresh"]) != []


def test_quantized_save_validation(db_path, rng):
    """quantized=True demands int8/int4 storage and refuses shards;
    reload demands the matching storage_dtype."""
    items, _ = make_items(rng, 20, 16)
    db = PicoVectorDB(embedding_dim=16, storage_file=db_path)
    db.upsert(items)
    with pytest.raises(ValueError, match="int8/int4"):
        db.save(quantized=True)

    db8, _ = _device_born_store(db_path + "_8", rng, "int8", n=50, dim=16)
    with pytest.raises(ValueError, match="shards"):
        db8.save(shards=2, quantized=True)
    db8.save(quantized=True)
    with pytest.raises(ValueError, match="storage_dtype"):
        PicoVectorDB(embedding_dim=16, storage_file=db_path + "_8")


def test_quantized_auto_engages_on_capacity(db_path, rng, monkeypatch):
    """Default save() on a lazy quantized store auto-picks the quantized
    format once the f32 materialization would exceed the threshold."""
    from picovdb_tpu.persistence import qvecs_path

    monkeypatch.setenv("PICOVDB_QSAVE_AUTO_GB", "0.00001")  # ~10 KB
    db, data = _device_born_store(db_path, rng, "int8", n=300, dim=32)
    db.save()
    assert os.path.exists(qvecs_path(db_path))
    assert not os.path.exists(vecs_path(db_path))
    assert db._host_lazy
    db2 = PicoVectorDB(
        embedding_dim=32, storage_file=db_path, storage_dtype="int8"
    )
    assert db2.count() == 300


def test_quantized_save_failure_preserves_old_files(db_path, rng):
    """A crash mid-save leaves the previous quantized checkpoint intact
    and removes stragglers (same contract as save_atomic)."""
    import glob

    from picovdb_tpu.persistence import qvecs_path

    db, _ = _device_born_store(db_path, rng, "int8", n=60, dim=16)
    db.save(quantized=True)
    before = open(qvecs_path(db_path), "rb").read()
    with patch("os.replace", side_effect=OSError("disk full")):
        with pytest.raises(OSError):
            db.save(quantized=True)
    assert open(qvecs_path(db_path), "rb").read() == before
    assert not glob.glob(f"{db_path}*tmp*")
    db2 = PicoVectorDB(
        embedding_dim=16, storage_file=db_path, storage_dtype="int8"
    )
    assert db2.count() == 60


def test_quantized_ivf_sidecar_reuse(db_path, rng):
    """The ANN sidecar reloads against the device corpus (no f32
    materialization): centroids reused, no retrain, probed results live."""
    db, data = _device_born_store(
        db_path, rng, "int8", n=1200, dim=256, index="ivf"
    )
    db.rebuild_index()
    assert db._ivf is not None
    cents = np.asarray(db._ivf._host_blob["centroids"])
    db.save(quantized=True)
    db2 = PicoVectorDB(
        embedding_dim=256, storage_file=db_path, storage_dtype="int8",
        index="ivf",
    )
    assert db2._ivf is not None
    np.testing.assert_array_equal(
        np.asarray(db2._ivf._host_blob["centroids"]), cents
    )
    assert db2._host_lazy  # sidecar reuse must not materialize
    r = db2.query(data[3], top_k=3)
    assert r[0][K_ID] == "q3"
