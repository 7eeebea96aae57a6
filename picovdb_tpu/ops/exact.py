"""Exact masked cosine top-k via XLA (`dot` + `lax.top_k`).

TPU-native replacement for the reference's NumPy GEMM + argpartition/argsort
path (picovdb/pico_vdb.py:670-714): one fused-by-XLA program computing
`scores = Q @ V.T`, masking inactive / filtered-out rows to -inf, and
selecting top-k on device. Static shapes throughout; callers bucket (Q, k)
so the jit cache stays small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def normalize_on_device(q):
    """Zero-safe L2 normalization on device (zero rows -> e0).

    Device-side counterpart of utils.normalize_batch (reference query-side
    normalization: picovdb/pico_vdb.py:583-591); runs fused under jit so
    query batches never need a host normalization pass. Idempotent for
    already-normalized inputs.
    """
    norms = jnp.linalg.norm(q, axis=1, keepdims=True)
    zero = norms == 0.0
    col0 = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1) == 0
    q = jnp.where(zero & col0, 1.0, q)
    norms = jnp.where(zero, 1.0, norms)
    return (q / norms).astype(jnp.float32)


def exact_topk(queries, vectors, mask, k: int, compute_dtype=None):
    """Masked exact top-k.

    Args:
      queries: (Q, dim) normalized query batch.
      vectors: (cap, dim) normalized corpus (padded rows are masked off).
      mask: (cap,) bool — active AND filter mask.
      k: static number of results per query (k <= cap).
      compute_dtype: optional dtype for the GEMM inputs (e.g. bfloat16);
        accumulation stays float32.

    Returns:
      (values, indices): (Q, k) float32 scores and (Q, k) int32 slot indices.
      Masked-off rows never surface unless fewer than k candidates exist, in
      which case padding entries carry -inf scores (host assembly drops them).
    """
    if compute_dtype is not None:
        q = queries.astype(compute_dtype)
        v = vectors.astype(compute_dtype)
    else:
        q = queries
        v = vectors
    scores = jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    values, indices = jax.lax.top_k(scores, k)
    return values, indices.astype(jnp.int32)


def approx_topk_rescored(queries, vectors, mask, k: int, k_sel: int,
                         recall_target: float = 0.95, compute_dtype=None):
    """Masked top-k via the TPU-native aggregate `lax.approx_max_k`, with
    exact f32 rescoring of the k_sel candidates.

    ~2x the fused scan's throughput at large Q on v5e (XLA's partial-
    reduction top-k runs at near peak), at the cost of materializing the
    (Q, cap) score matrix in HBM — callers chunk Q so it fits — and of a
    bounded recall target instead of the exact guarantee (measured
    recall@10 ≈ 0.998 at k_sel=2k, rt=0.95 on 100k x 1024). On CPU
    approx_max_k falls back to exact top_k, so results match the exact
    path there.
    """
    if compute_dtype is not None:
        q = queries.astype(compute_dtype)
        v = vectors.astype(compute_dtype)
    else:
        q, v = queries, vectors
    scores = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    k_sel = min(k_sel, scores.shape[1])
    vals, idx = jax.lax.approx_max_k(scores, k_sel,
                                     recall_target=recall_target)
    gathered = jnp.take(vectors, idx, axis=0)
    exact = jnp.einsum("qd,qkd->qk", queries, gathered,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(jnp.isneginf(vals), -jnp.inf, exact)
    order = jnp.argsort(-exact, axis=1)
    vals = jnp.take_along_axis(exact, order, axis=1)[:, :k]
    idx = jnp.take_along_axis(idx, order, axis=1)[:, :k]
    return vals, idx.astype(jnp.int32)


@functools.lru_cache(maxsize=256)
def make_approx_topk(k: int, compute_dtype_name: str | None = None,
                     normalize: bool = True, recall_target: float = 0.95):
    """Jitted approx-then-rescore top-k closure (k_sel = 2k guard)."""
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None
    k_sel = max(2 * k, k + 16)

    def fn(queries, vectors, mask):
        if normalize:
            queries = normalize_on_device(queries)
        return approx_topk_rescored(
            queries, vectors, mask, k, k_sel, recall_target, compute_dtype
        )

    return jax.jit(fn)


def exact_topk_i8r(queries, v_i8, vscale, mask, k: int, guard: int = 4):
    """Masked top-k over a per-ROW-quantized int8 corpus (storage tier).

    Selection: int8 x int8 MXU matmul, per-row rescale (ranking-faithful:
    the query's own quantization scale is a positive per-query constant);
    ranking: dequantized rescore of the k+guard winners — scores carry the
    storage quantization (~3e-4 absolute at dim 1024, tighter than
    bfloat16 storage's documented ~1e-3). This is the XLA fallback path
    (filtered queries, retries) for `storage_dtype="int8"` stores; the
    serving paths use the Pallas int8 kernels with dequant rescore.
    """
    from .pallas_scan import quantize_rows_i8, rescore_exact_i8r

    q_i8, _ = quantize_rows_i8(queries)
    s_i32 = jax.lax.dot_general(
        q_i8, v_i8, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = s_i32.astype(jnp.float32) * vscale[None, :]
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    k_sel = min(k + guard, scores.shape[1])
    vals, idx = jax.lax.top_k(scores, k_sel)
    vals, idx = rescore_exact_i8r(queries, v_i8, vscale, vals, idx)
    return vals[:, :k], idx[:, :k].astype(jnp.int32)


@functools.lru_cache(maxsize=256)
def make_exact_topk_i8r(k: int, normalize: bool = True):
    """Jitted `exact_topk_i8r` closure for a static k."""

    def fn(queries, v_i8, vscale, mask):
        if normalize:
            queries = normalize_on_device(queries)
        return exact_topk_i8r(queries, v_i8, vscale, mask, k)

    return jax.jit(fn)


def exact_topk_i4r(queries, v_i4, vscale, mask, k: int, guard: int = 4):
    """Masked top-k over a packed int4 corpus (storage tier).

    `exact_topk_i8r` for the two-plane nibble layout
    (ops/pallas_scan.py int4 section): selection unpacks the corpus and
    runs two half-width int8 matmuls with per-row rescale; ranking is the
    dequantizing int4 rescore — scores carry the 4-bit storage
    quantization (~18x int8's; exact ranking on host-born stores comes
    from the engine's host-f64 rescore). This is the XLA fallback
    (CPU, filtered retries, wide k) for `storage_dtype="int4"`; the TPU
    serving path is the Pallas ladder, which never materializes the
    unpacked corpus.
    """
    from .pallas_scan import (
        quantize_rows_i8,
        rescore_exact_i4r,
        unpack_i4,
    )

    q_i8, _ = quantize_rows_i8(queries)
    v = unpack_i4(v_i4)
    s_i32 = jax.lax.dot_general(
        q_i8, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = s_i32.astype(jnp.float32) * vscale[None, :]
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    k_sel = min(k + guard, scores.shape[1])
    vals, idx = jax.lax.top_k(scores, k_sel)
    vals, idx = rescore_exact_i4r(queries, v_i4, vscale, vals, idx)
    return vals[:, :k], idx[:, :k].astype(jnp.int32)


@functools.lru_cache(maxsize=256)
def make_exact_topk_i4r(k: int, normalize: bool = True):
    """Jitted `exact_topk_i4r` closure for a static k."""

    def fn(queries, v_i4, vscale, mask):
        if normalize:
            queries = normalize_on_device(queries)
        return exact_topk_i4r(queries, v_i4, vscale, mask, k)

    return jax.jit(fn)


@functools.lru_cache(maxsize=256)
def make_exact_topk(k: int, compute_dtype_name: str | None = None,
                    normalize: bool = True):
    """Build a jitted exact-top-k closure for a static k / compute dtype.

    Queries are L2-normalized on device by default (idempotent for
    pre-normalized inputs). Device placement follows the (committed) input
    arrays, so the same closure serves CPU tests and TPU production.
    """
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None

    def fn(queries, vectors, mask):
        if normalize:
            queries = normalize_on_device(queries)
        return exact_topk(queries, vectors, mask, k, compute_dtype)

    return jax.jit(fn)
