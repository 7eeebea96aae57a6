"""Row-sharded exact query with ICI top-k merge.

Each corpus shard computes a local masked top-k with the MXU; the per-shard
(score, global-index) candidate slabs — k entries per shard — are laid out
along a sharded axis and merged by a final small top-k, which XLA lowers to
an allgather of (Q, k*shards) over ICI followed by on-device selection. This
replaces the reference's single-process result assembly
(picovdb/pico_vdb.py:752-775) at multi-chip scale.

The optional `dp` mesh axis additionally shards the *query batch*, so the
merge collective stays intra-`shard`-axis and query throughput scales with
both axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

from ..ops.exact import exact_topk

# Bounded build cache. The key includes id(mesh), and the cached jitted
# fns close over the mesh object — an UNbounded dict would therefore pin
# every mesh ever queried (plus its compiled executables) for the process
# lifetime; a long-lived process that recreates meshes leaks until OOM
# (observed: a 43 x 10-config fuzz soak exhausted host memory through
# exactly this path). FIFO eviction drops the oldest builds; a re-query
# against an evicted (mesh, k, ...) combination just recompiles.
_CACHE = {}
_CACHE_MAX = 64


def make_sharded_topk(mesh, shard_axis: str, k: int, compute_dtype_name=None,
                      dp_axis: str = "dp", use_pallas: bool = False,
                      normalize: bool = True, interpret: bool = False,
                      storage_i8: bool = False, storage_i4: bool = False):
    """Build a jitted sharded masked-top-k for a static k.

    Signature of the returned fn: (queries (Q, dim) [dp-sharded if dp>1],
    vectors (cap, dim) row-sharded, mask (cap,) row-sharded) ->
    (values (Q, k) f32, indices (Q, k) int32 global slot ids).

    `storage_i8=True` serves an int8 STORAGE corpus (per-row-quantized
    rows + scales, see DeviceIndex): the returned fn takes an extra
    `vscale (cap,) f32` row-sharded argument after `vectors`, each shard
    selects over its int8 rows on the MXU and rescores the winners
    dequantized, so the merged scores carry storage precision exactly like
    the single-device int8 lanes.

    `storage_i4=True` serves a packed int4 STORAGE corpus (two-plane
    nibbles, (cap, dim//2) int8 bytes + per-row scales): same extra
    `vscale` argument and the same select-then-dequantizing-rescore shape
    as int8, with queries int8-quantized for the nibble kernel
    (ops/pallas_scan.py int4 section). Merged scores carry 4-bit storage
    precision; host-born stores restore exact ranking via the engine's
    host-f64 rescore tier exactly as on a single device.

    `interpret=True` runs the Pallas kernel in interpret mode inside each
    shard — the CPU-mesh test path for `use_pallas=True` (compiled Mosaic
    is TPU-only).
    """
    key = (id(mesh), mesh.shape_tuple, shard_axis, k, compute_dtype_name,
           dp_axis, use_pallas, normalize, interpret, storage_i8,
           storage_i4)
    fn = _CACHE.get(key)
    if fn is None:
        fn = _build(mesh, shard_axis, k, compute_dtype_name, dp_axis,
                    use_pallas, normalize, interpret, storage_i8,
                    storage_i4)
        while len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)), None)
        _CACHE[key] = fn
    return fn


def _build(mesh, shard_axis, k, compute_dtype_name, dp_axis, use_pallas,
           normalize, interpret=False, storage_i8=False, storage_i4=False):
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None
    has_dp = dp_axis in mesh.shape and mesh.shape[dp_axis] > 1
    q_spec = P(dp_axis, None) if has_dp else P()
    out_q = dp_axis if has_dp else None

    def local(q, v, m):
        rows_local = v.shape[0]
        k_local = min(k, rows_local)
        if use_pallas:
            from ..ops.pallas_scan import fused_topk, rescore_exact

            # guard + exact rescore against local rows, mirroring
            # make_fused_topk: packed-key quantization must not leak into
            # the cross-shard merge.
            k_sel = min(k_local + 4, rows_local)
            vals, idx = fused_topk(q, v, m, k_sel, compute_dtype,
                                   interpret=interpret)
            vals, idx = rescore_exact(q, v, vals, idx)
            vals, idx = vals[:, :k_local], idx[:, :k_local]
        else:
            vals, idx = exact_topk(q, v, m, k_local, compute_dtype)
        base = (jax.lax.axis_index(shard_axis) * rows_local).astype(jnp.int32)
        return vals, idx + base

    def local_quant(q, vq, vs, m):
        # shared int8/int4-STORAGE body: int8-quantized queries select over
        # the quantized (for int4: packed-nibble) rows with a +4 guard,
        # winners dequant-rescored before the slice — one place for the
        # guard width and global-base arithmetic.
        i4 = storage_i4
        rows_local = vq.shape[0]
        k_local = min(k, rows_local)
        if use_pallas:
            from ..ops import pallas_scan as ps

            q_i8, _ = ps.quantize_rows_i8(q)
            k_sel = min(k_local + 4, rows_local)
            select = ps.fused_topk_i4 if i4 else ps.fused_topk_i8
            rescore = ps.rescore_exact_i4r if i4 else ps.rescore_exact_i8r
            vals, idx = select(q_i8, vq, vs, m, k_sel, interpret=interpret)
            vals, idx = rescore(q, vq, vs, vals, idx)
            vals, idx = vals[:, :k_local], idx[:, :k_local]
        else:
            from ..ops.exact import exact_topk_i4r, exact_topk_i8r

            exact = exact_topk_i4r if i4 else exact_topk_i8r
            vals, idx = exact(q, vq, vs, m, k_local)
        base = (jax.lax.axis_index(shard_axis) * rows_local).astype(jnp.int32)
        return vals, idx + base

    if storage_i8 or storage_i4:
        in_specs = (q_spec, P(shard_axis, None), P(shard_axis),
                    P(shard_axis))
        body = local_quant
    else:
        in_specs = (q_spec, P(shard_axis, None), P(shard_axis))
        body = local
    mapped = _shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(out_q, shard_axis), P(out_q, shard_axis)),
        # pallas_call outputs carry no varying-mesh-axes metadata yet; the
        # out_specs above declare the sharding explicitly, so the check is
        # safe to skip on the kernel path.
        check_vma=not use_pallas,
    )

    def merged(q, *arrays):
        if normalize:
            from ..ops.exact import normalize_on_device

            q = normalize_on_device(q)
        vals, idx = mapped(q, *arrays)  # (Q, shards * k_local)
        k_final = min(k, vals.shape[1])
        top_vals, order = jax.lax.top_k(vals, k_final)
        top_idx = jnp.take_along_axis(idx, order, axis=1)
        return top_vals, top_idx

    return jax.jit(merged)
