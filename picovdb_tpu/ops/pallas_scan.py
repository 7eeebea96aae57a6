"""Fused Pallas scan: blocked MXU scoring + on-chip running top-k selection.

This kernel is the first-party TPU-native replacement for the reference's
two search engines at once (SURVEY.md §2 "Native components"):

  * the NumPy GEMM + argpartition path (picovdb/pico_vdb.py:683-713), and
  * the FAISS HNSW C++ index (picovdb/pico_vdb.py:171-212, 716-751),

with exact (recall 1.0) results. It never materializes the (Q, N) score
matrix in HBM: the corpus streams through VMEM in (BLOCK_N, dim) tiles, each
tile is scored against the resident query tile on the MXU, masked
(active ∧ filter) on the VPU, and merged into a running per-query top-k that
lives in the VMEM-resident output block for the whole corpus sweep — the
classic Pallas reduction pattern (output block constant along the inner grid
dimension). Only (Q, k) values + indices ever travel back to HBM.

Grid layout: (q_tiles, n_tiles) with the corpus dimension innermost, so the
query tile stays resident across the sweep and each corpus tile is DMA'd
exactly once per query tile (Pallas double-buffers the stream).

HBM traffic per query tile ≈ corpus bytes — the speed-of-light floor for an
exact scan. The select-max merge ladder costs ~3·k passes over
(QT, k+BLOCK_N) per tile against 2·QT·BLOCK_N·dim MXU FLOPs (≈2% overhead
at dim=1024, k=16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)  # in-kernel sentinel

# Tile sizes: QT queries x BN corpus rows per grid step. For dim=1024 f32:
# QT*dim*4 (Q tile) + 2*BN*dim*4 (double-buffered V tile) + QT*BN*4 (scores)
# ≈ 1 MB + 4 MB + 0.5 MB — comfortably inside ~16 MB VMEM.
DEFAULT_QT = 256
DEFAULT_BN = 512


def _scan_kernel(q_ref, v_ref, m_ref, vals_ref, idx_ref, *, k: int, bn: int,
                 compute_dtype):
    """One grid step: score a corpus tile and merge into the running top-k."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        vals_ref[...] = jnp.full(vals_ref.shape, NEG_INF, dtype=jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    q = q_ref[...]
    v = v_ref[...]
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        v = v.astype(compute_dtype)
    scores = jax.lax.dot_general(
        q,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QT, BN)
    mask = m_ref[...]  # (1, BN) int32: 1 = candidate
    scores = jnp.where(mask > 0, scores, NEG_INF)

    qt = scores.shape[0]
    base = b * bn
    tile_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base

    # Candidate pool: running top-k ++ this tile's scores.
    work = jnp.concatenate([vals_ref[...], scores], axis=1)  # (QT, k+BN)
    idx_mat = jnp.concatenate([idx_ref[...], tile_idx], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    # Select-max ladder: k rounds of (rowmax, argmax, mask-out); round j's
    # winner is placed into column j via vectorized selects (no dynamic lane
    # stores, which Mosaic does not support).
    def body(j, carry):
        work, vals, idx = carry
        mx = jnp.max(work, axis=1)
        amx = jnp.argmax(work, axis=1).astype(jnp.int32)
        at_max = col == amx[:, None]
        sel = jnp.sum(jnp.where(at_max, idx_mat, 0), axis=1).astype(jnp.int32)
        here = col_k == j
        vals = jnp.where(here, mx[:, None], vals)
        idx = jnp.where(here, sel[:, None], idx)
        work = jnp.where(at_max, NEG_INF, work)
        return work, vals, idx

    init = (
        work,
        jnp.full((qt, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((qt, k), dtype=jnp.int32),
    )
    # Mosaic only supports unroll=1 or full unroll in kernel fori_loops;
    # fully unroll for small k (better ILP), loop for large k.
    _, vals, idx = jax.lax.fori_loop(0, k, body, init,
                                     unroll=(k if k <= 32 else 1))
    vals_ref[...] = vals
    idx_ref[...] = idx


def fused_topk(queries, vectors, mask, k: int, compute_dtype=None,
               qt: int = DEFAULT_QT, bn: int = DEFAULT_BN):
    """Exact masked cosine top-k over the corpus, fused in one Pallas kernel.

    Args:
      queries: (Q, dim) f32, Q a multiple of 8 (callers pad).
      vectors: (cap, dim) f32, cap a multiple of 512 (callers pad to ROW_PAD).
      mask: (cap,) bool — active AND filter mask.
      k: static k (<= cap).
    Returns (values (Q, k) f32, indices (Q, k) int32); padding entries carry
    -inf values (callers treat them as misses).
    """
    num_q, dim = queries.shape
    cap = vectors.shape[0]
    qt = min(qt, num_q)
    bn = min(bn, cap)
    assert cap % bn == 0, (cap, bn)
    assert num_q % qt == 0, (num_q, qt)
    n_tiles = cap // bn
    q_tiles = num_q // qt
    k_run = min(k, bn)

    mask2d = mask.reshape(1, cap).astype(jnp.int32)

    grid = (q_tiles, n_tiles)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel, k=k_run, bn=bn,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dim), lambda i, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k_run), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k_run), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_q, k_run), jnp.float32),
            jax.ShapeDtypeStruct((num_q, k_run), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 3 * k_run * num_q * cap,
            bytes_accessed=cap * dim * 4 * q_tiles + num_q * dim * 4,
            transcendentals=0,
        ),
    )(queries, vectors, mask2d)

    # Contract parity with the XLA exact path: padding entries are -inf.
    vals = jnp.where(vals <= NEG_INF, -jnp.inf, vals)
    return vals, idxs


@functools.lru_cache(maxsize=256)
def make_fused_topk(k: int, compute_dtype_name: str | None = None,
                    interpret: bool = False):
    """Jitted fused-top-k closure for a static k (shapes retrace as needed)."""
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None

    def fn(queries, vectors, mask):
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                return fused_topk(queries, vectors, mask, k, compute_dtype)
        return fused_topk(queries, vectors, mask, k, compute_dtype)

    return jax.jit(fn)
