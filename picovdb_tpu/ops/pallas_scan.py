"""Fused Pallas scan: blocked MXU scoring + on-chip packed-key top-k.

This kernel is the first-party TPU-native replacement for the reference's
two search engines at once (SURVEY.md §2 "Native components"):

  * the NumPy GEMM + argpartition path (picovdb/pico_vdb.py:683-713), and
  * the FAISS HNSW C++ index (picovdb/pico_vdb.py:171-212, 716-751),

at exact-scan recall. It never materializes the (Q, N) score matrix in HBM:
the corpus streams through VMEM in (BLOCK_N, dim) tiles, each tile is scored
against the resident query tile on the MXU, masked (active ∧ filter) on the
VPU, and reduced to a per-tile top-k which is merged into a running top-k
living in the VMEM-resident output blocks for the whole corpus sweep (the
classic Pallas reduction pattern — outputs constant along the inner grid
dim). Only (Q, k) values + indices ever travel back to HBM.

Top-k selection uses a *packed sortable key*: the score's float32 bits are
transformed to a monotonic int32 ordering key, the low `lane_bits` are
replaced by the lane index, and each selection round is then a single
max-reduction (value and index recovered from the same key) plus one
mask-out pass — 2 VPU passes per round instead of the 4-5 a naive
max/argmax/gather ladder needs. Replacing mantissa low bits quantizes
scores by ~2^-13 relative (≈1e-4, below the MXU's own f32 matmul noise);
callers that need exact scores re-score the k winners outside the kernel
(`rescore_exact`), which `make_fused_topk` does by default.

Grid layout: (q_tiles, n_tiles) with the corpus dimension innermost, so the
query tile stays resident across the sweep and each corpus tile is DMA'd
exactly once per query tile (Pallas double-buffers the stream). HBM traffic
per query tile ≈ corpus bytes — the speed-of-light floor for an exact scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# In-kernel masked-score sentinel: the FINITE float32 minimum (true -inf
# breaks the packed-key int bitcast trick). NOT the same constant as
# ops/exact.py's NEG_INF (a true -inf) — every kernel/fallback exit must
# convert `vals <= SCORE_SENTINEL` to -inf before returning, because
# callers pin underfilled slots with jnp.isneginf (a finite sentinel
# slips past and resurrects masked rows in the rescore).
SCORE_SENTINEL = float(np.finfo(np.float32).min)
KEY_MIN = -(2**31)  # packed-key sentinel (below any real key); plain int so
# importing this module never touches a JAX backend.

# Tile sizes: QT queries x BN corpus rows per grid step. BN is a ceiling;
# the actual block is chosen per (dim, dtype, k) by `_pick_bn`'s VMEM budget
# model — e.g. dim=1024 f32 lands on 1024 (measured 35% over 512 on v5e),
# bf16 storage or smaller dims unlock 2048.
DEFAULT_QT = 256
DEFAULT_BN = 2048


def _to_sortable(bits_i32):
    """float32 bits -> int32 whose integer order matches float order."""
    return jnp.where(bits_i32 >= 0, bits_i32, bits_i32 ^ jnp.int32(0x7FFFFFFF))


def _from_sortable(key_i32):
    """Inverse of `_to_sortable` (low index bits must be cleared first)."""
    return jnp.where(key_i32 >= 0, key_i32, key_i32 ^ jnp.int32(0x7FFFFFFF))


def _small_merge(run_vals, run_idx, new_vals, new_idx, k):
    """Merge two (qt, k) candidate sets into the top-k (small select ladder)."""
    vals = jnp.concatenate([run_vals, new_vals], axis=1)  # (qt, 2k)
    idx = jnp.concatenate([run_idx, new_idx], axis=1)
    qt = vals.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    def body(j, carry):
        work, ovals, oidx = carry
        mx = jnp.max(work, axis=1)
        amx = jnp.argmax(work, axis=1).astype(jnp.int32)
        at = col == amx[:, None]
        sel = jnp.sum(jnp.where(at, idx, 0), axis=1).astype(jnp.int32)
        here = col_k == j
        ovals = jnp.where(here, mx[:, None], ovals)
        oidx = jnp.where(here, sel[:, None], oidx)
        work = jnp.where(at, SCORE_SENTINEL, work)
        return work, ovals, oidx

    init = (
        vals,
        jnp.full((qt, k), SCORE_SENTINEL, jnp.float32),
        jnp.zeros((qt, k), jnp.int32),
    )
    _, ovals, oidx = jax.lax.fori_loop(0, k, body, init,
                                       unroll=(k if k <= 16 else 1))
    return ovals, oidx


def _scan_kernel(q_ref, v_ref, m_ref, vals_ref, idx_ref, *, k: int, bn: int,
                 lane_bits: int, compute_dtype):
    """One grid step: score a corpus tile, packed-key top-k, running merge."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        vals_ref[...] = jnp.full(vals_ref.shape, SCORE_SENTINEL, dtype=jnp.float32)
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

    qt = scores.shape[0]
    low_mask = jnp.int32((1 << lane_bits) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    bits = pltpu.bitcast(scores, jnp.int32)
    keys = (_to_sortable(bits) & ~low_mask) | lane
    keys = jnp.where(mask > 0, keys, jnp.int32(KEY_MIN))

    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    # Packed-key select ladder: each round, one max-reduction recovers both
    # the (quantized) best score and its lane; one select masks it out.
    def body(j, carry):
        keys, tvals, tidx = carry
        m = jnp.max(keys, axis=1, keepdims=True)  # (QT, 1); 2-D for bitcast
        amx = m & low_mask
        approx = pltpu.bitcast(_from_sortable(m & ~low_mask), jnp.float32)
        # Rounds past the number of unmasked candidates select the KEY_MIN
        # sentinel, whose bit pattern unpacks to NaN — pin those to SCORE_SENTINEL
        # so the running merge stays NaN-free.
        approx = jnp.where(m == jnp.int32(KEY_MIN), SCORE_SENTINEL, approx)
        here = col_k == j
        tvals = jnp.where(here, approx, tvals)
        tidx = jnp.where(here, amx, tidx)
        keys = jnp.where(keys == m, jnp.int32(KEY_MIN), keys)
        return keys, tvals, tidx

    init = (
        keys,
        jnp.full((qt, k), SCORE_SENTINEL, jnp.float32),
        jnp.zeros((qt, k), jnp.int32),
    )
    _, tile_vals, tile_idx = jax.lax.fori_loop(0, k, body, init,
                                               unroll=(k if k <= 16 else 1))
    tile_idx = tile_idx + b * bn  # globalize slot ids

    vals, idx = _small_merge(vals_ref[...], idx_ref[...], tile_vals, tile_idx, k)
    vals_ref[...] = vals
    idx_ref[...] = idx


def _pick_bn(dim: int, qt: int, k: int, v_itemsize: int, cap: int,
             bn_max: int, budget: int = 13 * 2**20) -> int:
    """Largest corpus block fitting the VMEM budget (fewer blocks = fewer
    grid cells and DMA setups; measured +35% at dim=1024 going 512->1024).

    Budget model: query tile + double-buffered corpus tile + scores + packed
    keys, against ~13 MB of the ~16 MB VMEM (headroom for the ladder's loop
    carries — k > 16 ladders additionally cap at 512, where the unrolled
    carry allocations were measured to blow the scoped-vmem stack).
    """
    q_bytes = qt * dim * 4
    # 4096 only ever fits narrow mirrors at tiny query tiles (int8 at
    # qt<=8, dim 1024: 8.4 MB) — exactly the Q=1 latency path, where
    # halving the grid-step count halves the dominant per-step overhead.
    for bn in (4096, 2048, 1024, 512, 256, 128):
        if bn > bn_max or bn > cap or cap % bn:
            continue
        if k > 16 and bn > 512:
            continue
        use = q_bytes + 2 * bn * dim * v_itemsize + 2 * qt * bn * 4
        if use <= budget:
            return bn
    return cap if cap % 128 else 128


def fused_topk(queries, vectors, mask, k: int, compute_dtype=None,
               qt: int = DEFAULT_QT, bn: int = DEFAULT_BN,
               interpret: bool = False):
    """Exact masked cosine top-k over the corpus, fused in one Pallas kernel.

    Args:
      queries: (Q, dim) f32, Q a multiple of 8 (callers pad).
      vectors: (cap, dim) f32, cap a multiple of the block size.
      mask: (cap,) bool — active AND filter mask.
      k: static k (<= cap).
    Returns (values (Q, k) f32, indices (Q, k) int32). Values are quantized
    to ~1e-4 relative by the packed key (see module docstring); use
    `rescore_exact` for exact scores. Padding entries carry -inf.
    """
    num_q, dim = queries.shape
    cap = vectors.shape[0]
    qt = min(qt, num_q)
    bn = _pick_bn(dim, qt, k, vectors.dtype.itemsize, cap, bn)
    if k > bn:
        # The running top-k lives in one (qt, k) VMEM block per tile and the
        # per-tile selection can surface at most bn candidates, so k beyond
        # the block size cannot be served by this kernel — fall back to the
        # exact XLA scan instead of silently truncating to bn results.
        # (All shapes are static, so this is a trace-time decision.)
        from .exact import exact_topk

        return exact_topk(queries, vectors, mask, min(k, cap), compute_dtype)
    assert cap % bn == 0, (cap, bn)
    assert num_q % qt == 0, (num_q, qt)
    n_tiles = cap // bn
    q_tiles = num_q // qt
    k_run = k
    lane_bits = max(1, int(bn - 1).bit_length())

    mask2d = mask.reshape(1, cap).astype(jnp.int32)

    grid = (q_tiles, n_tiles)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel, k=k_run, bn=bn, lane_bits=lane_bits,
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
            flops=2 * num_q * cap * dim + 2 * k_run * num_q * cap,
            bytes_accessed=cap * dim * 4 * q_tiles + num_q * dim * 4,
            transcendentals=0,
        ),
        # Plain pallas interpret mode (not force_tpu_interpret_mode, which
        # deadlocks under shard_map's per-device threads on CPU) — used by
        # the sharded-kernel CPU tests.
        interpret=interpret,
    )(queries, vectors, mask2d)

    vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
    return vals, idxs


def rescore_exact_i8r(queries, v_i8, vscale, vals, idxs):
    """Dequantizing rescore against a per-row int8 STORAGE corpus.

    Like `rescore_exact` but the k winning rows are reconstructed as
    v = v_i8 * vscale[row] — the best available precision when the corpus
    itself is int8 (storage_dtype="int8"); returned scores carry the
    storage quantization (~vscale/2 per element)."""
    gathered = jnp.take(v_i8, idxs, axis=0).astype(jnp.float32)
    exact = jnp.einsum(
        "qd,qkd->qk", queries, gathered,
        preferred_element_type=jnp.float32,
    ) * jnp.take(vscale, idxs)
    exact = jnp.where(jnp.isneginf(vals), -jnp.inf, exact)
    order = jnp.argsort(-exact, axis=1)
    return jnp.take_along_axis(exact, order, axis=1), jnp.take_along_axis(
        idxs, order, axis=1
    )


def rescore_exact(queries, vectors, vals, idxs):
    """Replace quantized kernel scores with exact f32 dot products.

    Gathers the k winning rows per query and recomputes q·v in float32 on
    the VPU (higher precision than the batched MXU matmul), preserving -inf
    padding markers and re-sorting by the exact scores.
    """
    gathered = jnp.take(vectors, idxs, axis=0)  # (Q, k, dim)
    exact = jnp.einsum(
        "qd,qkd->qk", queries, gathered,
        preferred_element_type=jnp.float32,
    )
    exact = jnp.where(jnp.isneginf(vals), -jnp.inf, exact)
    order = jnp.argsort(-exact, axis=1)
    return jnp.take_along_axis(exact, order, axis=1), jnp.take_along_axis(
        idxs, order, axis=1
    )


# --------------------------------------------------------------------------
# Segmented-max scan: the high-throughput selection tier.
#
# The exact ladder above costs 2 VPU passes per rank over every score
# (k=14 -> 28 passes), which dominates large-batch scans (measured ~23 ms of
# the 66 ms Q=8192 sweep at 100k x 1024 on v5e). This kernel instead keeps
# the per-tile selection CONSTANT: each 128-lane segment of the score tile
# surrenders its top-`per_seg` candidates (2 packed-key max passes per
# round), and a cheap global `lax.top_k` over the (Q, per_seg*N/128)
# candidate slab plus an exact f32 rescore finishes the job. Selection can
# only miss when more than `per_seg` of the true top-k land in one 128-row
# segment — P ~ C(k,3) / (N/128)^2 for per_seg=2, i.e. ~2e-4 at k=10,
# N=100k — and the guard band + rescore absorb score quantization, so
# measured recall@10 is 1.000 (BENCHMARKS.md). Pairs with a bfloat16 scan
# mirror (DeviceIndex mixed-precision tier): selection reads bf16 (half the
# HBM sweep, 2x MXU rate), ranking rescores against the float32 corpus.
# --------------------------------------------------------------------------

def _segmax_budget(v_itemsize: int = 4) -> int:
    """Segmax VMEM budget (bytes); PICOVDB_SEGMAX_BUDGET_MB overrides.

    14 MB for <=2-byte mirrors (bf16/int8): unlocks bn=2048 at dim=1024,
    measured 16.1 -> 13.0 ms on the 8192 x 100k key sweep and 209 -> 215k
    QPS end-to-end at recall 1.0000 (bench/results/segmax_tile_r3.json).
    f32 mirrors keep the conservative 9 MB model — the wider corpus tile
    pushed actuals past the model there (older scoped-vmem OOM note above).
    """
    import os as _os

    default = "14" if v_itemsize <= 2 else "9"
    try:
        return int(float(_os.getenv("PICOVDB_SEGMAX_BUDGET_MB", default))
                   * 2**20)
    except ValueError:
        return 9 * 2**20


SEG = 128  # one vector-lane row per segment


def _segmax_kernel(q_ref, v_ref, m_ref, out_ref, *, bn: int, compute_dtype):
    """Score one corpus tile and emit each 128-segment's top-2 packed keys.

    The only output is one int32 block of packed keys — score bits with the
    low 7 bits replaced by the in-segment lane — laid out transposed,
    (2*segments, queries): the block's lane dim is the 128-aligned query
    tile (Mosaic requires 128-divisible last-dim blocks) and one output DMA
    per tile replaces four. `segmax_scan` decodes values, global indices
    and the masked sentinel outside the kernel with cheap XLA ops.
    """
    q = q_ref[...]
    v = v_ref[...]
    if compute_dtype is not None:
        q = q.astype(compute_dtype)
        v = v.astype(compute_dtype)
    elif v.dtype != q.dtype:
        q = q.astype(v.dtype)
    scores = jax.lax.dot_general(
        q, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QT, BN)
    mask = m_ref[...]  # (1, BN)
    qt = scores.shape[0]
    ns = bn // SEG

    bits = pltpu.bitcast(scores, jnp.int32)
    keys = _to_sortable(bits).reshape(qt, ns, SEG)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, ns, SEG), 2)
    keys = (keys & ~jnp.int32(SEG - 1)) | lane
    # mask AFTER packing the lane bits, or masked lanes would get their
    # sentinel ORed back up into a live-looking key
    keys = jnp.where(mask.reshape(1, ns, SEG) > 0, keys, jnp.int32(KEY_MIN))

    m1 = jnp.max(keys, axis=2)  # (QT, NS)
    keys = jnp.where(keys == m1[:, :, None], jnp.int32(KEY_MIN), keys)
    m2 = jnp.max(keys, axis=2)
    out_ref[...] = jnp.concatenate([m1, m2], axis=1).T  # (2*NS, QT)


def segmax_scan(queries, vectors, mask, compute_dtype=None,
                qt: int = DEFAULT_QT, bn: int = DEFAULT_BN,
                interpret: bool = False, raw: bool = False,
                stream: bool = False, raw_t: bool = False):
    """Per-128-segment top-2 candidates over the masked corpus.

    Returns (vals (Q, 2*cap/128) f32 quantized, idx (Q, 2*cap/128) int32):
    candidate slabs for a global top-k + exact rescore. Masked / padding
    segments carry -inf.

    `raw=True` instead returns (keys (Q, C) int32 packed sortable keys,
    ns): callers run `lax.top_k` straight on the keys (monotonic in score)
    and decode ONLY the k winners — the full-slab decode plus the
    (Q, C) -> (Q, k) `take_along_axis` it forces cost ~7 ms at
    8192 x 100k on v5e, pure elementwise math on (Q, k) costs none.
    Column c of the slab holds tile c//(2ns), segment (c%(2ns))%ns, so
    `global_row = ((c//(2ns))*ns + (c%(2ns))%ns)*128 + (key & 127)`;
    `key == KEY_MIN` marks masked/padding entries.

    `stream=True` swaps the grid to (corpus_tiles, q_tiles): the corpus
    tile is the slow axis (Mosaic keeps it resident across the inner query
    sweep, so the corpus streams through HBM exactly ONCE per batch instead
    of once per query tile), and the small query tiles re-stream instead.
    Every (corpus, query) output block is independent — no running state —
    so the two orders compute bit-identical keys; only HBM traffic changes:
    ~cap*dim*itemsize + q_tiles-per-corpus-tile re-reads of the queries,
    vs q_tiles full corpus sweeps. Wins once Q is large enough that query
    re-reads are cheaper than corpus re-reads (large-batch serving); pair
    with queries pre-cast to the scan dtype to halve the inner-loop DMA.
    """
    num_q, dim = queries.shape
    cap = vectors.shape[0]
    qt = min(qt, num_q)
    # Tighter budget than the ladder kernel: the segment extraction keeps
    # scores + packed keys + two functional key updates live (measured
    # 16.13 MB actual at the 13 MB-model bn=2048 pick -> scoped-vmem OOM).
    # PICOVDB_SEGMAX_BUDGET_MB overrides for tile experiments.
    bn = _pick_bn(dim, qt, 2, vectors.dtype.itemsize, cap, bn,
                  budget=_segmax_budget(vectors.dtype.itemsize))
    if bn < 8 * SEG and cap // bn > 1:
        # The transposed (segments, queries) output block needs ns = bn/128
        # on the 8-aligned sublane dim; very large dims can push the VMEM
        # model below that. Signal the caller to use another path.
        raise ValueError(f"segmax needs bn >= {8 * SEG}; got {bn}")
    assert cap % bn == 0 and bn % SEG == 0, (cap, bn)
    assert num_q % qt == 0, (num_q, qt)
    n_tiles = cap // bn
    ns = bn // SEG
    mask2d = mask.reshape(1, cap).astype(jnp.int32)

    if stream:
        grid = (n_tiles, num_q // qt)
        q_map, v_map = (lambda b, i: (i, 0)), (lambda b, i: (b, 0))
        m_map, o_map = (lambda b, i: (0, b)), (lambda b, i: (b, i))
        bytes_est = (cap * dim * vectors.dtype.itemsize
                     + num_q * dim * queries.dtype.itemsize * n_tiles)
    else:
        grid = (num_q // qt, n_tiles)
        q_map, v_map = (lambda i, b: (i, 0)), (lambda i, b: (b, 0))
        m_map, o_map = (lambda i, b: (0, b)), (lambda i, b: (b, i))
        bytes_est = (cap * dim * vectors.dtype.itemsize * (num_q // qt)
                     + num_q * dim * 4)

    keys = pl.pallas_call(
        functools.partial(_segmax_kernel, bn=bn, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dim), v_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), m_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * ns, qt), o_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * ns, num_q), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 4 * num_q * cap,
            bytes_accessed=bytes_est,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, vectors, mask2d)
    if raw_t:
        return keys, ns  # (C, Q) — feed topk_packed_keys, skip the .T
    keys = keys.T  # (Q, n_tiles * 2 * ns)
    if raw:
        return keys, ns
    # decode packed keys -> (quantized value, global row id); row r of the
    # transposed layout holds tile r//(2ns), round (r%(2ns))//ns, segment
    # (r%(2ns))%ns, so the segment base is a pure function of the column.
    col = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    tile = col // (2 * ns)
    s = jax.lax.rem(col, jnp.int32(2 * ns))
    s = jnp.where(s >= ns, s - ns, s)
    base = (tile * ns + s) * SEG
    vals = jax.lax.bitcast_convert_type(
        _from_sortable(keys & ~jnp.int32(SEG - 1)), jnp.float32
    )
    vals = jnp.where(keys == jnp.int32(KEY_MIN), -jnp.inf, vals)
    vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
    idx = base + (keys & jnp.int32(SEG - 1))
    return vals, idx


def _topk_keys_kernel(kt_ref, vals_ref, cols_ref, *, k_sel: int, cc: int):
    """Iterative top-k_sel over one (CC, QT) chunk of the packed-key slab.

    Works on the slab's native pre-transpose layout (candidates on
    sublanes, queries on lanes): each round is one cross-sublane max, one
    argmax via iota, and one single-element mask-out per query — no
    cross-lane shuffles, no 52 MB transpose, no O(C log C) sort. Rounds
    emit in descending order, so the per-chunk output is already sorted.
    Duplicated max values mask out one element per round (largest column
    first), matching `lax.top_k`'s multiplicity semantics.
    """
    kt = kt_ref[...]  # (CC, QT) int32 packed keys
    iota_c = jax.lax.broadcasted_iota(jnp.int32, kt.shape, 0)
    base = pl.program_id(1) * cc  # global slab row of this chunk's row 0
    vrows, crows = [], []
    for _ in range(k_sel):
        m = jnp.max(kt, axis=0)  # (QT,)
        col = jnp.max(
            jnp.where(kt == m[None, :], iota_c, jnp.int32(-1)), axis=0
        )
        kt = jnp.where(iota_c == col[None, :], jnp.int32(KEY_MIN), kt)
        vrows.append(m)
        crows.append(col + base)
    while len(vrows) < vals_ref.shape[0]:  # pad sublane rows to 8-align
        vrows.append(jnp.full_like(vrows[0], jnp.int32(KEY_MIN)))
        crows.append(jnp.zeros_like(crows[0]))
    vals_ref[...] = jnp.stack(vrows, axis=0)
    cols_ref[...] = jnp.stack(crows, axis=0)


def topk_packed_keys(keys_t, k_sel: int, interpret: bool = False):
    """Top-k_sel of a packed-key slab in its (C, Q) pre-transpose layout.

    Drop-in for `jax.lax.top_k(keys_t.T, k_sel)` -> (tk, ti), for the
    monotonic int32 keys emitted by `segmax_scan(raw_t=True)` /
    `segmax_scan_i8(raw_t=True)`. lax.top_k sorts all C candidates per
    query (~8-9 ms at 8192 x 1600 on v5e — a third of the whole serving
    batch); this extracts only the k_sel winners in-VMEM (~0.5 ms).
    Requires Q % 128 == 0 and k_sel <= 32 (callers fall back to lax.top_k
    otherwise). Chunks C when one block would not fit VMEM; per-chunk
    winners then merge through a tiny (Q, nc*k_sel) lax.top_k.
    """
    c, num_q = keys_t.shape
    assert num_q % 128 == 0 and k_sel <= 32, (num_q, k_sel)
    qt = 256 if num_q % 256 == 0 else 128
    cc = c if c <= 2048 else 2048
    if c % cc:
        pad = -(-c // cc) * cc - c
        keys_t = jnp.pad(keys_t, ((0, pad), (0, 0)),
                         constant_values=KEY_MIN)
        c += pad
    nc = c // cc
    k_pad = -(-k_sel // 8) * 8
    vals_t, cols_t = pl.pallas_call(
        functools.partial(_topk_keys_kernel, k_sel=k_sel, cc=cc),
        grid=(num_q // qt, nc),
        in_specs=[
            pl.BlockSpec((cc, qt), lambda i, b: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, qt), lambda i, b: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, qt), lambda i, b: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc * k_pad, num_q), jnp.int32),
            jax.ShapeDtypeStruct((nc * k_pad, num_q), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * k_sel * c * num_q,
            bytes_accessed=c * num_q * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(keys_t)
    if nc == 1:
        # single chunk: rounds already emitted in descending order
        return vals_t[:k_sel].T, cols_t[:k_sel].T
    tk, pos = jax.lax.top_k(vals_t.T, k_sel)  # (Q, nc*k_pad) — tiny
    return tk, jnp.take_along_axis(cols_t.T, pos, axis=1)


def make_segmax_topk(k: int, compute_dtype_name: str | None = None,
                     interpret: bool = False, guard: int = 6,
                     normalize: bool = True, stream: bool = False,
                     tie_scale=None, slot_map: bool = False):
    """Env-resolving wrapper: see `_make_segmax_topk_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_segmax_topk_cached(k, compute_dtype_name, interpret, guard,
                                    normalize, stream, tie_scale, slot_map)


@functools.lru_cache(maxsize=256)
def _make_segmax_topk_cached(k: int, compute_dtype_name: str | None = None,
                     interpret: bool = False, guard: int = 6,
                     normalize: bool = True, stream: bool = False,
                             tie_scale: float = 1.0, slot_map: bool = False):
    """Jitted mixed-precision top-k: segmax candidates -> global top-k ->
    exact f32 rescore.

    Signature of the returned fn: (queries (Q, dim) f32, scan_vectors
    (cap, dim) f32-or-bf16, rescore_vectors (cap, dim) f32, mask (cap,)
    bool) -> ((Q, k) f32 exact scores, (Q, k) int32 slot ids). Pass the
    same array twice for a single-precision corpus.

    `stream=True` selects the corpus-resident grid order and pre-casts the
    normalized queries to the scan mirror's dtype, so the whole batch costs
    one corpus read plus bf16 query re-reads (see `segmax_scan`). The
    rescore still uses the float32 queries.

    `slot_map=True` serves a COMPACTED corpus view (the filtered-batch
    segmax route, DeviceIndex._filter_view): the fn takes a fifth argument
    `slots (cap_view,) int32` mapping view rows to global corpus slots;
    candidate ids translate through it BEFORE the exact rescore, so
    `rescore_vectors` stays the full-capacity corpus (no f32 view copy in
    HBM) and returned ids are global.
    """
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None

    def impl(queries, scan_vectors, rescore_vectors, mask, slots=None):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_scan = queries
        if stream and scan_vectors.dtype != queries.dtype \
                and compute_dtype is None:
            # Cast once outside the kernel: the inner grid re-streams the
            # query tiles n_tiles times, so their width sets the residual
            # HBM traffic after the corpus drops to a single pass.
            q_scan = queries.astype(scan_vectors.dtype)
        try:
            keys_t, ns = segmax_scan(q_scan, scan_vectors, mask,
                                     compute_dtype, interpret=interpret,
                                     raw_t=True, stream=stream)
        except ValueError:  # geometry unservable (huge dim) -> exact scan
            from .exact import exact_topk

            if slots is None:
                return exact_topk(queries, rescore_vectors, mask,
                                  min(k, rescore_vectors.shape[0]),
                                  compute_dtype)
            # compacted-view mode: exact-select over the view, translate
            # to global slots, rescore exactly against the full corpus
            kv = min(k, scan_vectors.shape[0])
            vals_v, idx_v = exact_topk(queries, scan_vectors, mask, kv,
                                       compute_dtype)
            gidx_v = jnp.take(slots, idx_v)
            gath = jnp.take(rescore_vectors, gidx_v, axis=0)
            ex = jnp.einsum("qd,qkd->qk", queries,
                            gath.astype(jnp.float32),
                            preferred_element_type=jnp.float32)
            # underfilled view slots arrived as -inf with arbitrary
            # masked indices — pin them BEFORE the rescore re-ranks
            # them by their true (filtered-out) similarity
            ex = jnp.where(jnp.isneginf(vals_v), -jnp.inf, ex)
            orderv = jnp.argsort(-ex, axis=1)
            return (jnp.take_along_axis(ex, orderv, axis=1),
                    jnp.take_along_axis(gidx_v, orderv,
                                        axis=1).astype(jnp.int32))
        # top_k on the packed int32 keys (monotonic in score), decode only
        # the winners: column -> segment base is pure arithmetic, the lane
        # sits in the key's low bits. Avoids materializing the decoded
        # (Q, C) val/idx slabs and the (Q, C)->(Q, k) gather (~7 ms at
        # 8192 x 100k). The selection itself runs in the Pallas
        # `topk_packed_keys` kernel on the pre-transpose slab (lax.top_k
        # sorts all C candidates per query: measured 8-9 ms of the 40 ms
        # batch at 8192 x 100k, bench/results/segmax_stage_r3.json).
        k_sel = min(k + guard, keys_t.shape[0])
        num_q = keys_t.shape[1]
        if num_q % 128 == 0 and k_sel <= 32:
            tk, ti = topk_packed_keys(keys_t, k_sel, interpret=interpret)
        else:
            tk, ti = jax.lax.top_k(keys_t.T, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * SEG + (tk & jnp.int32(SEG - 1))
        empty = tk == jnp.int32(KEY_MIN)
        gidx = jnp.where(empty, 0, gidx)
        if slots is not None:
            # compacted-view mode: view row -> global corpus slot, so
            # the rescore reads the full-capacity corpus and ids come
            # back global (filtered-batch segmax, _filter_view)
            gidx = jnp.take(slots, gidx)
        gathered = jnp.take(rescore_vectors, gidx, axis=0)
        exact = jnp.einsum("qd,qkd->qk", queries,
                           gathered.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        exact = jnp.where(empty, -jnp.inf, exact)
        order = jnp.argsort(-exact, axis=1)
        vals_full = jnp.take_along_axis(exact, order, axis=1)
        vals = _mark_crowded(
            vals_full[:, :k], vals_full, k,
            _tie_margin("bf16", queries.shape[1], tie_scale))
        idx = jnp.take_along_axis(gidx, order, axis=1)[:, :k]
        return vals, idx.astype(jnp.int32)

    return jax.jit(impl)


# --------------------------------------------------------------------------
# int8 selection tier: quantized mirror + per-row scales.
#
# The corpus mirror stores each row as int8 with its own float32 scale
# (s_r = max_i |v_ri| / 127): for L2-normalized rows at dim=1024 the typical
# |v_ri| is ~0.1, so per-row scaling keeps ~10x more precision than a global
# [-1, 1] -> int8 map. Queries are quantized per row the same way at dispatch
# time. Scoring runs int8 x int8 -> int32 on the MXU (2x the bf16 rate on
# v5e, and the HBM sweep is 1 byte/element — half of bf16, quarter of f32);
# the VPU then converts to float32 and multiplies by the corpus row scale,
# after which the packed-key selection machinery applies unchanged. A
# query's own scale is a positive per-row constant and cannot change that
# query's ranking, so it is never applied — the exact f32 rescore of the
# winners restores true cosine scores. Quantization noise on the scaled
# scores is ~3e-4 absolute (vs bf16's ~2e-3), well inside the guard band.
# --------------------------------------------------------------------------


def _tie_margin(kind: str, dim: int, scale: float) -> float:
    """Crowding margin for the low-precision selection tiers.

    Quantized SELECTION can mis-rank candidates whose true scores sit
    within the tier's quantization noise; the guard band + exact rescore
    absorb isolated flips, but a corpus of near-duplicates can pack MORE
    near-ties than the guard holds (measured: 40/64 top-1 misses on
    dim=16 clusters at spread 0.015). The check: after the exact rescore,
    if the k-th and guard-bottom (k_sel-1-th) EXACT scores differ by less
    than ~4x the tier's measured noise rms, candidates outside the band
    may also belong in the top-k — the result is marked (k-th value set
    to -inf) so the engine's underfill retry re-serves it exactly.

    Noise rms scales as 1/sqrt(dim) (measured bias-removed vs f64 at
    dim 16/128/384/1024: bf16 4.2e-4 -> 5.2e-5, int8 2.2e-3 -> 3.8e-4).
    The margin is ~1x rms: random corpora's guard-band gaps run 5-50x rms
    (a 4x-rms margin measured ~20% spurious Q=1 retries at 100k x 1024
    int8), while near-duplicate bands sit orders of magnitude BELOW rms —
    1x rms separates the regimes cleanly. An underfilled band (k_sel past
    the candidate count) has a -inf bottom, making the gap infinite — no
    spurious retries on small stores. PICOVDB_TIE_MARGIN_SCALE multiplies
    (0 disables)."""
    # = rms * sqrt(dim); int4's step is 127/7 ~ 18x int8's, so its noise
    # scales accordingly (per-row symmetric quantization in both).
    base = {"bf16": 0.0017, "int4": 0.22}.get(kind, 0.0122)
    return base * scale / (dim ** 0.5)


def _tie_scale_env() -> float:
    """PICOVDB_TIE_MARGIN_SCALE, resolved at factory-call time (NOT inside
    a cached trace — the jitted closures are lru_cached, so the scale must
    be part of the cache key to keep env changes effective)."""
    import os as _os

    try:
        return float(_os.getenv("PICOVDB_TIE_MARGIN_SCALE", "1") or 1)
    except ValueError:
        return 1.0


def _mark_crowded(vals_k, exact_full, k: int, margin: float):
    """Set the k-th value to -inf where the guard band is crowded.

    `exact_full` is the (Q, k_sel) exact-rescored, descending score
    matrix; `vals_k` its [:, :k] slice. A -inf guard bottom (candidate
    set exhausted) yields an infinite gap — never marked."""
    if margin <= 0.0 or exact_full.shape[1] <= k:
        return vals_k
    crowded = (exact_full[:, k - 1] - exact_full[:, -1]) < margin
    col = jax.lax.broadcasted_iota(jnp.int32, vals_k.shape, 1)
    return jnp.where(crowded[:, None] & (col == k - 1), -jnp.inf, vals_k)


@jax.jit
def quantize_rows_i8(v):
    """Per-row symmetric int8 quantization: (rows int8, scales f32).

    scales[r] = max|v[r]| / 127 (floored to avoid div-by-zero on deleted
    all-zero rows, which quantize to 0 and are masked off anyway)."""
    f = v.astype(jnp.float32)
    a = jnp.max(jnp.abs(f), axis=1)
    s = jnp.maximum(a, 1e-30) / 127.0
    q = jnp.round(f / s[:, None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


def _scan_kernel_i8(q_ref, v_ref, vs_ref, m_ref, vals_ref, idx_ref, *,
                    k: int, bn: int, lane_bits: int):
    """int8 variant of `_scan_kernel`: MXU int32 scores, per-row rescale."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        vals_ref[...] = jnp.full(vals_ref.shape, SCORE_SENTINEL, dtype=jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    s_i32 = jax.lax.dot_general(
        q_ref[...],
        v_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (QT, BN)
    scores = s_i32.astype(jnp.float32) * vs_ref[...]  # corpus row scales
    mask = m_ref[...]  # (1, BN)

    qt = scores.shape[0]
    low_mask = jnp.int32((1 << lane_bits) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    bits = pltpu.bitcast(scores, jnp.int32)
    keys = (_to_sortable(bits) & ~low_mask) | lane
    keys = jnp.where(mask > 0, keys, jnp.int32(KEY_MIN))

    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    def body(j, carry):
        keys, tvals, tidx = carry
        m = jnp.max(keys, axis=1, keepdims=True)
        amx = m & low_mask
        approx = pltpu.bitcast(_from_sortable(m & ~low_mask), jnp.float32)
        approx = jnp.where(m == jnp.int32(KEY_MIN), SCORE_SENTINEL, approx)
        here = col_k == j
        tvals = jnp.where(here, approx, tvals)
        tidx = jnp.where(here, amx, tidx)
        keys = jnp.where(keys == m, jnp.int32(KEY_MIN), keys)
        return keys, tvals, tidx

    init = (
        keys,
        jnp.full((qt, k), SCORE_SENTINEL, jnp.float32),
        jnp.zeros((qt, k), jnp.int32),
    )
    _, tile_vals, tile_idx = jax.lax.fori_loop(0, k, body, init,
                                               unroll=(k if k <= 16 else 1))
    tile_idx = tile_idx + b * bn

    vals, idx = _small_merge(vals_ref[...], idx_ref[...], tile_vals, tile_idx, k)
    vals_ref[...] = vals
    idx_ref[...] = idx


def fused_topk_i8(q_i8, v_i8, vscale, mask, k: int,
                  qt: int = DEFAULT_QT, bn: int = 4096,
                  interpret: bool = False):
    """Exact-ladder masked top-k over the int8 mirror.

    Args:
      q_i8: (Q, dim) int8 quantized queries (per-query scale irrelevant
        for ranking, so not passed).
      v_i8: (cap, dim) int8 mirror; vscale: (cap,) f32 per-row scales.
      mask: (cap,) bool.
    Returns ((Q, k) f32 scaled-approximate scores, (Q, k) int32 indices);
    callers rescore against the f32 corpus for exact values.
    """
    num_q, dim = q_i8.shape
    cap = v_i8.shape[0]
    qt = min(qt, num_q)
    bn = _pick_bn(dim, qt, k, 1, cap, bn)
    if k > bn:
        # k beyond the VMEM block cannot be served in-kernel (the running
        # top-k is one (qt, k) block and each tile surfaces at most bn
        # candidates) — dense XLA fallback with the same ranking semantics
        # (scaled int8 scores; callers rescore). Trace-time decision, like
        # fused_topk's. The (Q, cap) score matrix it materializes means
        # very wide k at HBM-ceiling corpus sizes stays unserveable.
        scores = jnp.dot(
            q_i8.astype(jnp.float32), v_i8.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * vscale[None, :].astype(jnp.float32)
        scores = jnp.where(mask[None, :], scores, SCORE_SENTINEL)
        vals, idx = jax.lax.top_k(scores, min(k, cap))
        # finite sentinel -> true -inf, like the kernel path: callers pin
        # underfill via isneginf before the rescore
        vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
        return vals, idx.astype(jnp.int32)
    assert cap % bn == 0 and num_q % qt == 0, (cap, bn, num_q, qt)
    lane_bits = max(1, int(bn - 1).bit_length())
    mask2d = mask.reshape(1, cap).astype(jnp.int32)
    vs2d = vscale.reshape(1, cap).astype(jnp.float32)

    grid = (num_q // qt, cap // bn)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel_i8, k=k, bn=bn, lane_bits=lane_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dim), lambda i, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_q, k), jnp.float32),
            jax.ShapeDtypeStruct((num_q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 2 * k * num_q * cap,
            bytes_accessed=cap * dim * (num_q // qt) + num_q * dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, v_i8, vs2d, mask2d)

    vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
    return vals, idxs


def _segmax_kernel_i8(q_ref, v_ref, vs_ref, m_ref, out_ref, *, bn: int):
    """int8 variant of `_segmax_kernel`: per-128-segment top-2 packed keys."""
    s_i32 = jax.lax.dot_general(
        q_ref[...], v_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (QT, BN)
    scores = s_i32.astype(jnp.float32) * vs_ref[...]
    mask = m_ref[...]
    qt = scores.shape[0]
    ns = bn // SEG

    bits = pltpu.bitcast(scores, jnp.int32)
    keys = _to_sortable(bits).reshape(qt, ns, SEG)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, ns, SEG), 2)
    keys = (keys & ~jnp.int32(SEG - 1)) | lane
    keys = jnp.where(mask.reshape(1, ns, SEG) > 0, keys, jnp.int32(KEY_MIN))

    m1 = jnp.max(keys, axis=2)
    keys = jnp.where(keys == m1[:, :, None], jnp.int32(KEY_MIN), keys)
    m2 = jnp.max(keys, axis=2)
    out_ref[...] = jnp.concatenate([m1, m2], axis=1).T  # (2*NS, QT)


def segmax_scan_i8(q_i8, v_i8, vscale, mask,
                   qt: int = DEFAULT_QT, bn: int = DEFAULT_BN,
                   interpret: bool = False, stream: bool = False,
                   raw_t: bool = False):
    """Per-128-segment top-2 over the int8 mirror; returns (keys, ns) raw —
    same contract as `segmax_scan(raw=True)`. `stream=True` uses the
    corpus-resident grid order (see `segmax_scan`): with a 1 B/element
    mirror AND 1 B/element queries the whole sweep's HBM traffic drops to
    ~cap*dim bytes once, leaving the int8 MXU rate as the floor."""
    num_q, dim = q_i8.shape
    cap = v_i8.shape[0]
    qt = min(qt, num_q)
    # Keep the conservative 9 MB model here: the int8 bn=2048 variant is
    # opt-in-only (PICOVDB_SEGMAX_I8) and its Mosaic compile was observed
    # to run 10+ minutes on v5e — not worth the risk for an opt-in path.
    bn = _pick_bn(dim, qt, 2, 1, cap, bn, budget=_segmax_budget(4))
    if bn < 8 * SEG and cap // bn > 1:
        raise ValueError(f"segmax needs bn >= {8 * SEG}; got {bn}")
    assert cap % bn == 0 and bn % SEG == 0, (cap, bn)
    assert num_q % qt == 0, (num_q, qt)
    n_tiles = cap // bn
    ns = bn // SEG
    mask2d = mask.reshape(1, cap).astype(jnp.int32)
    vs2d = vscale.reshape(1, cap).astype(jnp.float32)

    if stream:
        grid = (n_tiles, num_q // qt)
        q_map, v_map = (lambda b, i: (i, 0)), (lambda b, i: (b, 0))
        m_map, o_map = (lambda b, i: (0, b)), (lambda b, i: (b, i))
        bytes_est = cap * dim + num_q * dim * n_tiles
    else:
        grid = (num_q // qt, n_tiles)
        q_map, v_map = (lambda i, b: (i, 0)), (lambda i, b: (b, 0))
        m_map, o_map = (lambda i, b: (0, b)), (lambda i, b: (b, i))
        bytes_est = cap * dim * (num_q // qt) + num_q * dim

    keys = pl.pallas_call(
        functools.partial(_segmax_kernel_i8, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dim), v_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), m_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), m_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * ns, qt), o_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * ns, num_q), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 4 * num_q * cap,
            bytes_accessed=bytes_est,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, v_i8, vs2d, mask2d)
    if raw_t:
        return keys, ns  # (C, Q)
    return keys.T, ns


def make_segmax_topk_i8(k: int, interpret: bool = False, guard: int = 6,
                        normalize: bool = True, stream: bool = False,
                        tie_scale=None, rescore_dequant: bool = False):
    """Env-resolving wrapper: see `_make_segmax_topk_i8_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_segmax_topk_i8_cached(k, interpret, guard, normalize,
                                       stream, tie_scale, rescore_dequant)


@functools.lru_cache(maxsize=256)
def _make_segmax_topk_i8_cached(k: int, interpret: bool = False, guard: int = 6,
                                normalize: bool = True, stream: bool = False,
                                tie_scale: float = 1.0,
                                rescore_dequant: bool = False):
    """Jitted int8 top-k: segmax over the int8 mirror -> global top-k ->
    exact f32 rescore.

    fn(queries (Q, dim) f32, v_i8 (cap, dim) int8, vscale (cap,) f32,
    rescore_vectors (cap, dim) f32, mask (cap,) bool) -> (vals, idx).
    `stream=True`: corpus-resident grid order (see `segmax_scan_i8`).
    """

    def impl(queries, v_i8, vscale, rescore_vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_i8, _ = quantize_rows_i8(queries)
        try:
            keys_t, ns = segmax_scan_i8(q_i8, v_i8, vscale, mask,
                                        interpret=interpret, stream=stream,
                                        raw_t=True)
        except ValueError:
            from .exact import exact_topk

            return exact_topk(queries, rescore_vectors, mask,
                              min(k, rescore_vectors.shape[0]), None)
        k_sel = min(k + guard, keys_t.shape[0])
        if keys_t.shape[1] % 128 == 0 and k_sel <= 32:
            tk, ti = topk_packed_keys(keys_t, k_sel, interpret=interpret)
        else:
            tk, ti = jax.lax.top_k(keys_t.T, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * SEG + (tk & jnp.int32(SEG - 1))
        empty = tk == jnp.int32(KEY_MIN)
        gidx = jnp.where(empty, 0, gidx)
        gathered = jnp.take(rescore_vectors, gidx, axis=0)
        exact = jnp.einsum("qd,qkd->qk", queries,
                           gathered.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        if rescore_dequant:
            # int8 STORAGE: rescore_vectors IS the int8 corpus; reconstruct
            # winners via the per-row scales (see rescore_exact_i8r)
            exact = exact * jnp.take(vscale, gidx)
        exact = jnp.where(empty, -jnp.inf, exact)
        order = jnp.argsort(-exact, axis=1)
        vals_full = jnp.take_along_axis(exact, order, axis=1)
        vals = _mark_crowded(
            vals_full[:, :k], vals_full, k,
            _tie_margin("i8", queries.shape[1], tie_scale))
        idx = jnp.take_along_axis(gidx, order, axis=1)[:, :k]
        return vals, idx.astype(jnp.int32)

    return jax.jit(impl)


def make_fused_topk_i8(k: int, guard: int = 4, interpret: bool = False,
                       normalize: bool = True, tie_scale=None,
                       rescore_dequant: bool = False):
    """Env-resolving wrapper: see `_make_fused_topk_i8_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_fused_topk_i8_cached(k, guard, interpret, normalize,
                                      tie_scale, rescore_dequant)


@functools.lru_cache(maxsize=256)
def _make_fused_topk_i8_cached(k: int, guard: int = 4, interpret: bool = False,
                               normalize: bool = True,
                               tie_scale: float = 1.0,
                               rescore_dequant: bool = False):
    """Small-batch int8 top-k: the exact selection ladder over the int8
    mirror + exact f32 rescore.

    The Q=1 serving path: the corpus sweep reads 1 byte/element — half the
    bf16 mirror, a quarter of f32 — and tiny Q admits bn=4096 blocks
    (halving the dominant per-grid-step overhead). guard 4 matches the
    bf16 ladder: int8 per-row-scaled noise (~3e-4) is ~7x smaller than
    bf16's, so the bf16-proven band is conservative here (measured
    recall@10 = 1.000 at 100k x 1024, bench/results/int8_tier_r3.json).

    fn(queries f32, v_i8, vscale, rescore_vectors f32, mask) -> (vals, idx)
    """

    def impl(queries, v_i8, vscale, rescore_vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_i8, _ = quantize_rows_i8(queries)
        k_sel = k + max(0, guard)
        vals, idx = fused_topk_i8(q_i8, v_i8, vscale, mask, k_sel,
                                  interpret=interpret)
        if rescore_dequant:
            # int8 STORAGE: no higher-precision source exists; reconstruct
            # the winners from the quantized rows + per-row scales
            vals, idx = rescore_exact_i8r(queries, v_i8, vscale, vals, idx)
        else:
            vals, idx = rescore_exact(queries, rescore_vectors, vals, idx)
        out_vals = _mark_crowded(vals[:, :k], vals, k,
                                 _tie_margin("i8", queries.shape[1], tie_scale))
        return out_vals, idx[:, :k]

    return jax.jit(impl)


# --------------------------------------------------------------------------
# int4 STORAGE tier: two-plane nibble packing, 0.5 B/element.
#
# Per-row symmetric 4-bit quantization halves int8 storage again (a 16 GB
# v5e chip holds ~25M x 1024 rows), at ~18x int8's score noise — the tier
# exists for HOST-BORN stores where the engine's host-f64 rescore restores
# exact ranking (engine._rescored_dispatch); device-only ranking carries
# the documented quantization error.
#
# Packing layout ("two-plane"): element j < dim/2 lives in the LOW nibble
# of byte j, element j + dim/2 in the HIGH nibble. Unpacking is then two
# vector ops per byte and the int4 dot decomposes into two clean
# half-width int8 MXU matmuls — q[:, :half] @ lo.T + q[:, half:] @ hi.T —
# with no in-kernel interleaving or lane shuffles. Nibbles store value+8
# (unsigned 1..15): the +8 bias contributes 8 * sum(q) to every row's
# score, a per-query scalar folded out after the matmuls, so the kernel
# never materializes bias-corrected operands.
# --------------------------------------------------------------------------


@jax.jit
def quantize_rows_i4(v):
    """Per-row symmetric int4 quantization: (packed int8 (n, dim//2),
    scales f32 (n,)).

    scales[r] = max|v[r]| / 7 (floored like `quantize_rows_i8`); nibble
    values are clip(round(v/s), -7, 7) + 8 — BOTH nibbles biased unsigned
    [1, 15], so the kernel's per-byte mask extraction (an i32-bitcast
    trick, see `_scan_kernel_i4`) yields MXU-ready non-negative int8
    planes, and the bias folds into one per-query scalar (8 * sum(q)).
    `dim` must be even.
    """
    f = v.astype(jnp.float32)
    half = f.shape[1] // 2
    a = jnp.max(jnp.abs(f), axis=1)
    s = jnp.maximum(a, 1e-30) / 7.0
    q = jnp.clip(jnp.round(f / s[:, None]), -7, 7).astype(jnp.int32) + 8
    lo = q[:, :half]
    hi = q[:, half:]
    # int32 -> int8 conversion truncates bits (XLA modular semantics), so
    # the packed byte keeps both nibbles intact.
    return (lo | (hi << 4)).astype(jnp.int8), s


def unpack_i4(packed):
    """(..., dim//2) packed int8 -> (..., dim) int8 nibble values in
    [-7, 7] (inverts `quantize_rows_i4`; multiply by the per-row scales
    to dequantize). The single home of the nibble-layout contract: low
    nibble = first dim half, both nibbles biased [1, 15]."""
    p = packed.astype(jnp.int32) & 255
    lo = (p & 15) - 8
    hi = ((p >> 4) & 15) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


def unpack_i4_np_into(packed: "np.ndarray", out: "np.ndarray") -> None:
    """NumPy twin of `unpack_i4` for host-side paths, writing UNSCALED
    nibble values into a caller-provided (n, dim) buffer (no (n, dim)
    integer temp — the chunked host materialization paths bound their
    transients with this)."""
    half = packed.shape[1]
    p = packed.astype(np.int16) & 255
    out[:, :half] = (p & 15) - 8
    out[:, half:] = ((p >> 4) & 15) - 8


def rescore_exact_i4r(queries, v_i4, vscale, vals, idxs):
    """Dequantizing rescore against a packed int4 STORAGE corpus.

    `rescore_exact_i8r` for the nibble-packed layout: the k winning rows
    unpack to [-7, 7] and reconstruct as v = nibble * vscale[row]; the
    returned scores carry the 4-bit storage quantization (the engine's
    host rescore replaces them with exact f64 ranking on host-born
    stores)."""
    gathered = jnp.take(v_i4, idxs, axis=0)
    g = gathered.astype(jnp.int32) & 255
    lo = ((g & 15) - 8).astype(jnp.float32)
    hi = (((g >> 4) & 15) - 8).astype(jnp.float32)
    half = v_i4.shape[1]
    exact = (
        jnp.einsum("qd,qkd->qk", queries[:, :half], lo,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("qd,qkd->qk", queries[:, half:], hi,
                     preferred_element_type=jnp.float32)
    ) * jnp.take(vscale, idxs)
    exact = jnp.where(jnp.isneginf(vals), -jnp.inf, exact)
    order = jnp.argsort(-exact, axis=1)
    return jnp.take_along_axis(exact, order, axis=1), jnp.take_along_axis(
        idxs, order, axis=1
    )


def _scan_kernel_i4(q_ref, v_ref, vs_ref, m_ref, vals_ref, idx_ref, *,
                    k: int, bn: int, lane_bits: int):
    """int4 variant of `_scan_kernel_i8`: in-VMEM nibble unpack, two
    half-width s8 MXU matmuls, per-query bias fold, per-row rescale."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        vals_ref[...] = jnp.full(vals_ref.shape, SCORE_SENTINEL, dtype=jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    q = q_ref[...]  # (QT, dim) int8
    v = v_ref[...]  # (BN, dim//2) packed bytes
    # Nibble extraction without int8 shifts (Mosaic cannot legalize
    # arith.shrui on i8 vectors) and without cross-bitwidth CONVERSIONS
    # on corpus-sized tiles (the measured relayout tax): BITCAST the
    # packed block to i32, mask/shift per byte, bitcast back. The masks
    # are the same constant in every byte position, so the result is
    # correct under any byte permutation the bitcast pair applies — the
    # roundtrip is self-inverse. Both planes come out as the stored
    # biased nibbles (value + 8, in [1, 15]) — MXU-ready non-negative
    # int8 — and the bias folds into one per-query scalar: 8 * sum(q).
    v32 = pltpu.bitcast(v, jnp.int32)
    lo = pltpu.bitcast(v32 & jnp.int32(0x0F0F0F0F), jnp.int8)
    hi = pltpu.bitcast(
        jax.lax.shift_right_logical(v32, 4) & jnp.int32(0x0F0F0F0F),
        jnp.int8,
    )
    half = v.shape[1]
    qa = q[:, :half]
    qb = q[:, half:]
    dn = (((1,), (1,)), ((), ()))
    s_i32 = jax.lax.dot_general(
        qa, lo, dimension_numbers=dn, preferred_element_type=jnp.int32
    ) + jax.lax.dot_general(
        qb, hi, dimension_numbers=dn, preferred_element_type=jnp.int32
    )
    qsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)  # (QT, 1)
    scores = (s_i32 - 8 * qsum).astype(jnp.float32) * vs_ref[...]
    mask = m_ref[...]  # (1, BN)

    qt = scores.shape[0]
    low_mask = jnp.int32((1 << lane_bits) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    bits = pltpu.bitcast(scores, jnp.int32)
    keys = (_to_sortable(bits) & ~low_mask) | lane
    keys = jnp.where(mask > 0, keys, jnp.int32(KEY_MIN))

    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    def body(j, carry):
        keys, tvals, tidx = carry
        m = jnp.max(keys, axis=1, keepdims=True)
        amx = m & low_mask
        approx = pltpu.bitcast(_from_sortable(m & ~low_mask), jnp.float32)
        approx = jnp.where(m == jnp.int32(KEY_MIN), SCORE_SENTINEL, approx)
        here = col_k == j
        tvals = jnp.where(here, approx, tvals)
        tidx = jnp.where(here, amx, tidx)
        keys = jnp.where(keys == m, jnp.int32(KEY_MIN), keys)
        return keys, tvals, tidx

    init = (
        keys,
        jnp.full((qt, k), SCORE_SENTINEL, jnp.float32),
        jnp.zeros((qt, k), jnp.int32),
    )
    _, tile_vals, tile_idx = jax.lax.fori_loop(0, k, body, init,
                                               unroll=(k if k <= 16 else 1))
    tile_idx = tile_idx + b * bn

    vals, idx = _small_merge(vals_ref[...], idx_ref[...], tile_vals, tile_idx, k)
    vals_ref[...] = vals
    idx_ref[...] = idx


def fused_topk_i4(q_i8, v_i4, vscale, mask, k: int,
                  qt: int = DEFAULT_QT, bn: int = 4096,
                  interpret: bool = False):
    """Exact-ladder masked top-k over the packed int4 corpus.

    Args:
      q_i8: (Q, dim) int8 quantized queries (per-query scale irrelevant
        for ranking).
      v_i4: (cap, dim//2) packed two-plane nibbles; vscale: (cap,) f32.
      mask: (cap,) bool.
    Returns ((Q, k) f32 scaled-approximate scores, (Q, k) int32 indices);
    callers rescore (host-f64 on host-born stores, dequantizing
    otherwise).
    """
    num_q, dim = q_i8.shape
    cap, half = v_i4.shape
    assert dim == 2 * half, (dim, half)
    qt = min(qt, num_q)
    # itemsize 1: the DMA'd block is 0.5 B/elem and the two transient
    # nibble planes add ~1 B/elem, so budgeting like the 1-byte int8
    # mirror keeps bn=4096 at dim 1024 (tiny Q) — halving the grid-step
    # count, the dominant per-step cost in this regime (measured 2.15 ->
    # 1.28 ms/sweep at 1M x 1024 vs bn=2048 — under the int8 ladder's
    # 1.38 ms on the same corpus; bench/results/i4_kernel_r3.json).
    bn = _pick_bn(dim, qt, k, 1, cap, bn)
    if k > bn:
        # dense XLA fallback for k beyond the VMEM block (see
        # fused_topk_i8); unpacks the full corpus, so wide k at
        # HBM-ceiling corpus sizes stays unserveable either way.
        v = unpack_i4(v_i4).astype(jnp.float32)
        scores = jnp.dot(
            q_i8.astype(jnp.float32), v.T,
            preferred_element_type=jnp.float32,
        ) * vscale[None, :].astype(jnp.float32)
        scores = jnp.where(mask[None, :], scores, SCORE_SENTINEL)
        vals, idx = jax.lax.top_k(scores, min(k, cap))
        vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)  # see i8 above
        return vals, idx.astype(jnp.int32)
    assert cap % bn == 0 and num_q % qt == 0, (cap, bn, num_q, qt)
    lane_bits = max(1, int(bn - 1).bit_length())
    mask2d = mask.reshape(1, cap).astype(jnp.int32)
    vs2d = vscale.reshape(1, cap).astype(jnp.float32)

    grid = (num_q // qt, cap // bn)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel_i4, k=k, bn=bn, lane_bits=lane_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, half), lambda i, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_q, k), jnp.float32),
            jax.ShapeDtypeStruct((num_q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim,
            bytes_accessed=cap * half + num_q * dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, v_i4, vs2d, mask2d)
    # finite SCORE_SENTINEL sentinel -> true -inf, like every sibling kernel:
    # rescore_exact_i4r and the engine's underfill retry pin via
    # isneginf, which the finite sentinel (with its arbitrary b*bn row
    # index) would slip past — returning masked/pad rows as live hits
    vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
    return vals, idxs


def make_fused_topk_i4(k: int, guard: int = 4, interpret: bool = False,
                       normalize: bool = True, tie_scale=None):
    """Env-resolving wrapper: see `_make_fused_topk_i4_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_fused_topk_i4_cached(k, guard, interpret, normalize,
                                      tie_scale)


@functools.lru_cache(maxsize=256)
def _make_fused_topk_i4_cached(k: int, guard: int = 4,
                               interpret: bool = False,
                               normalize: bool = True,
                               tie_scale: float = 1.0):
    """int4-STORAGE top-k: selection ladder over the packed corpus +
    dequantizing rescore.

    tie_scale is accepted for signature parity but the crowding mark is
    never applied (tie_scale forced 0 like the int8-storage routes): no
    higher-precision DEVICE tier exists to retry into — exact ranking on
    host-born stores comes from the engine's host-f64 rescore instead.

    fn(queries f32, v_i4, vscale, mask) -> (vals, idx)
    """
    del tie_scale  # see docstring

    def impl(queries, v_i4, vscale, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_i8, _ = quantize_rows_i8(queries)
        k_sel = k + max(0, guard)
        vals, idx = fused_topk_i4(q_i8, v_i4, vscale, mask, k_sel,
                                  interpret=interpret)
        vals, idx = rescore_exact_i4r(queries, v_i4, vscale, vals, idx)
        return vals[:, :k], idx[:, :k]

    return jax.jit(impl)


# --------------------------------------------------------------------------
# Column-scaled int8 tier ("i8c"): integer-ranked selection.
#
# The per-ROW-scaled int8 tier above must rescale every (QT, BN) score tile
# by the corpus row scales before packing keys (int32 -> f32 convert +
# multiply + float->sortable bitcast): measured 0.89x the bf16 segmax at
# batch sizes, because those VPU passes outweigh the halved HBM sweep
# (bench/results/int8_ab_r3.json). Per-COLUMN scales remove the rescale
# from the kernel entirely: with v_i8[r, d] = round(v[r, d] / s_d), the
# query is pre-multiplied by s_d on the host side of the dispatch
# (q'_d = q_d * s_d, then per-row int8 quantization), so the raw int32 MXU
# score  sum_d q'_i8[d] * v_i8[r, d]  is already proportional to the true
# cosine for that query: per-query positive constants (the query's own
# quantization scale) cannot reorder rows. Selection therefore ranks the
# int32 scores directly — packed keys are just (score & ~127) | lane, no
# bitcast, no convert, no rescale — and the exact f32 rescore of the
# winners restores true scores, as in every other selection tier.
#
# Precision: element noise is s_d/2; for L2-normalized corpora the score
# noise is ~0.3 * max_d(s_d) * 127 * q_rms ≈ 4e-4 absolute on unit-cosine
# scores for Gaussian-like embeddings — between the per-row int8 tier
# (3e-4) and bf16 (2e-3), both of which measure recall@10 = 1.000 with the
# default guard. Column scales adapt to per-dimension variance (common in
# real embedding models); a single outlier row only inflates the scales of
# the columns it touches. The lane-bit quantization (128 int-score units)
# is ~1e-4 relative, below the int8 noise itself.
# --------------------------------------------------------------------------


@jax.jit
def quantize_cols_i8(v):
    """Per-column symmetric int8 quantization: (rows int8, col scales f32).

    scales[d] = max_r |v[r, d]| / 127 (floored to avoid div-by-zero on
    all-zero columns, which quantize to 0)."""
    f = v.astype(jnp.float32)
    a = jnp.max(jnp.abs(f), axis=0)
    s = jnp.maximum(a, 1e-30) / 127.0
    q = jnp.round(f / s[None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


@jax.jit
def quantize_cols_scaled_i8(v, s):
    """Column-quantize with PRE-COMPUTED scales (chunked-build path).

    Used when the full-precision source is too large to materialize next
    to its int8 mirror (the int8-only IVF build): a first chunked pass
    reduces the per-column abs-max, then each chunk quantizes against the
    shared scales here. Values are clipped, but with scales derived from
    the same data no clipping occurs."""
    q = jnp.round(v.astype(jnp.float32) / s[None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8)


@jax.jit
def colmax_abs(v):
    """Per-column abs-max (f32) — the reduction half of the chunked
    column quantization."""
    return jnp.max(jnp.abs(v.astype(jnp.float32)), axis=0)


@jax.jit
def fold_queries_i8(queries, cscale):
    """Fold the corpus column scales into queries, then int8-quantize.

    The per-query quantization scale is a positive constant and cannot
    change that query's ranking, so it is dropped (same argument as
    `quantize_rows_i8` on the query side of the per-row tier)."""
    q, _ = quantize_rows_i8(queries.astype(jnp.float32) * cscale[None, :])
    return q


def _segmax_kernel_i8c(q_ref, v_ref, m_ref, out_ref, *, bn: int):
    """Column-scaled int8 segmax: per-128-segment top-2 of raw int32 scores.

    No convert, no rescale, no bitcast — the int32 MXU scores are the
    ordering keys (see tier comment above); only the lane-pack, mask and
    two max passes run on the VPU."""
    s_i32 = jax.lax.dot_general(
        q_ref[...], v_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (QT, BN)
    mask = m_ref[...]
    qt = s_i32.shape[0]
    ns = bn // SEG

    keys = s_i32.reshape(qt, ns, SEG)
    lane = jax.lax.broadcasted_iota(jnp.int32, (qt, ns, SEG), 2)
    keys = (keys & ~jnp.int32(SEG - 1)) | lane
    keys = jnp.where(mask.reshape(1, ns, SEG) > 0, keys, jnp.int32(KEY_MIN))

    m1 = jnp.max(keys, axis=2)
    keys = jnp.where(keys == m1[:, :, None], jnp.int32(KEY_MIN), keys)
    m2 = jnp.max(keys, axis=2)
    out_ref[...] = jnp.concatenate([m1, m2], axis=1).T  # (2*NS, QT)


def segmax_scan_i8c(q_i8, v_i8, mask, qt: int = DEFAULT_QT,
                    bn: int = DEFAULT_BN, interpret: bool = False,
                    stream: bool = False, raw_t: bool = False):
    """Per-128-segment top-2 over the column-scaled int8 mirror.

    `q_i8` must be `fold_queries_i8(queries, cscale)` for the mirror's
    column scales. Same raw-key contract as `segmax_scan(raw=True)`; with
    `stream=True` both the resident corpus and the re-streamed queries are
    1 B/element, so the whole sweep's HBM traffic is ~cap*dim bytes once."""
    num_q, dim = q_i8.shape
    cap = v_i8.shape[0]
    qt = min(qt, num_q)
    bn = _pick_bn(dim, qt, 2, 1, cap, bn, budget=_segmax_budget(1))
    if bn < 8 * SEG and cap // bn > 1:
        raise ValueError(f"segmax needs bn >= {8 * SEG}; got {bn}")
    assert cap % bn == 0 and bn % SEG == 0, (cap, bn)
    assert num_q % qt == 0, (num_q, qt)
    # int32 score keys must sit above the KEY_MIN sentinel: |score| <=
    # 127*127*dim, so any dim below ~133k is safe (checked, not assumed).
    assert 127 * 127 * dim < 2**31, dim
    n_tiles = cap // bn
    ns = bn // SEG
    mask2d = mask.reshape(1, cap).astype(jnp.int32)

    if stream:
        grid = (n_tiles, num_q // qt)
        q_map, v_map = (lambda b, i: (i, 0)), (lambda b, i: (b, 0))
        m_map, o_map = (lambda b, i: (0, b)), (lambda b, i: (b, i))
        bytes_est = cap * dim + num_q * dim * n_tiles
    else:
        grid = (num_q // qt, n_tiles)
        q_map, v_map = (lambda i, b: (i, 0)), (lambda i, b: (b, 0))
        m_map, o_map = (lambda i, b: (0, b)), (lambda i, b: (b, i))
        bytes_est = cap * dim * (num_q // qt) + num_q * dim

    keys = pl.pallas_call(
        functools.partial(_segmax_kernel_i8c, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, dim), q_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dim), v_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), m_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * ns, qt), o_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * ns, num_q), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 4 * num_q * cap,
            bytes_accessed=bytes_est,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, v_i8, mask2d)
    if raw_t:
        return keys, ns  # (C, Q)
    return keys.T, ns


def make_segmax_topk_i8c(k: int, interpret: bool = False, guard: int = 8,
                         normalize: bool = True, stream: bool = False, tie_scale=None):
    """Env-resolving wrapper: see `_make_segmax_topk_i8c_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_segmax_topk_i8c_cached(k, interpret, guard, normalize, stream, tie_scale)


@functools.lru_cache(maxsize=256)
def _make_segmax_topk_i8c_cached(k: int, interpret: bool = False, guard: int = 8,
                         normalize: bool = True, stream: bool = False,
                                 tie_scale: float = 1.0):
    """Jitted column-scaled int8 top-k: integer segmax -> global top-k ->
    exact f32 rescore.

    fn(queries (Q, dim) f32, v_i8 (cap, dim) int8, cscale (dim,) f32,
    rescore_vectors (cap, dim) f32, mask (cap,) bool) -> (vals, idx).
    guard defaults one notch wider than the bf16 tier (8 vs 6): int8c noise
    is data-dependent (column max outliers widen it), and the wider band
    costs only a few extra rescored rows."""

    def impl(queries, v_i8, cscale, rescore_vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_i8 = fold_queries_i8(queries, cscale)
        try:
            keys_t, ns = segmax_scan_i8c(q_i8, v_i8, mask,
                                         interpret=interpret, stream=stream,
                                         raw_t=True)
        except ValueError:
            from .exact import exact_topk

            return exact_topk(queries, rescore_vectors, mask,
                              min(k, rescore_vectors.shape[0]), None)
        k_sel = min(k + guard, keys_t.shape[0])
        if keys_t.shape[1] % 128 == 0 and k_sel <= 32:
            tk, ti = topk_packed_keys(keys_t, k_sel, interpret=interpret)
        else:
            tk, ti = jax.lax.top_k(keys_t.T, k_sel)
        tile = ti // (2 * ns)
        s = jax.lax.rem(ti, jnp.int32(2 * ns))
        s = jnp.where(s >= ns, s - ns, s)
        gidx = (tile * ns + s) * SEG + (tk & jnp.int32(SEG - 1))
        empty = tk == jnp.int32(KEY_MIN)
        gidx = jnp.where(empty, 0, gidx)
        gathered = jnp.take(rescore_vectors, gidx, axis=0)
        exact = jnp.einsum("qd,qkd->qk", queries,
                           gathered.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        exact = jnp.where(empty, -jnp.inf, exact)
        order = jnp.argsort(-exact, axis=1)
        vals_full = jnp.take_along_axis(exact, order, axis=1)
        vals = _mark_crowded(
            vals_full[:, :k], vals_full, k,
            _tie_margin("i8", queries.shape[1], tie_scale))
        idx = jnp.take_along_axis(gidx, order, axis=1)[:, :k]
        return vals, idx.astype(jnp.int32)

    return jax.jit(impl)


def _scan_kernel_i8c(q_ref, v_ref, m_ref, vals_ref, idx_ref, *, k: int,
                     bn: int, lane_bits: int):
    """Column-scaled int8 exact selection ladder: ranks raw int32 scores.

    Like `_scan_kernel_i8` but with no vscale input and no convert/rescale:
    the packed key is built straight from the int32 MXU score. The running
    top-k carries the scores as floats — exact, because the lane bits
    (>= 7 low bits per bn >= 128) are cleared first, leaving < 24
    significant bits for any |score| < 2^31 — so `_small_merge` and the
    -inf padding contract stay shared with the other ladders."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        vals_ref[...] = jnp.full(vals_ref.shape, SCORE_SENTINEL, dtype=jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, dtype=jnp.int32)

    s_i32 = jax.lax.dot_general(
        q_ref[...],
        v_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (QT, BN)
    mask = m_ref[...]  # (1, BN)

    qt = s_i32.shape[0]
    low_mask = jnp.int32((1 << lane_bits) - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, s_i32.shape, 1)
    keys = (s_i32 & ~low_mask) | lane
    keys = jnp.where(mask > 0, keys, jnp.int32(KEY_MIN))

    col_k = jax.lax.broadcasted_iota(jnp.int32, (qt, k), 1)

    def body(j, carry):
        keys, tvals, tidx = carry
        m = jnp.max(keys, axis=1, keepdims=True)
        amx = m & low_mask
        approx = (m & ~low_mask).astype(jnp.float32)
        approx = jnp.where(m == jnp.int32(KEY_MIN), SCORE_SENTINEL, approx)
        here = col_k == j
        tvals = jnp.where(here, approx, tvals)
        tidx = jnp.where(here, amx, tidx)
        keys = jnp.where(keys == m, jnp.int32(KEY_MIN), keys)
        return keys, tvals, tidx

    init = (
        keys,
        jnp.full((qt, k), SCORE_SENTINEL, jnp.float32),
        jnp.zeros((qt, k), jnp.int32),
    )
    _, tile_vals, tile_idx = jax.lax.fori_loop(0, k, body, init,
                                               unroll=(k if k <= 16 else 1))
    tile_idx = tile_idx + b * bn

    vals, idx = _small_merge(vals_ref[...], idx_ref[...], tile_vals, tile_idx, k)
    vals_ref[...] = vals
    idx_ref[...] = idx


def fused_topk_i8c(q_i8, v_i8, mask, k: int, qt: int = DEFAULT_QT,
                   bn: int = 4096, interpret: bool = False):
    """Exact-ladder masked top-k over the column-scaled int8 mirror.

    Returns ((Q, k) f32 integer-score approximations — ranking-faithful,
    NOT cosine values; rescore for real scores — and (Q, k) int32 indices).
    """
    num_q, dim = q_i8.shape
    cap = v_i8.shape[0]
    qt = min(qt, num_q)
    bn = _pick_bn(dim, qt, k, 1, cap, bn)
    if k > bn:
        # See fused_topk_i8: dense XLA fallback for k beyond the VMEM
        # block. Integer scores (column scales already folded into the
        # query by callers), ranking-faithful like the kernel's output.
        scores = jnp.dot(
            q_i8.astype(jnp.float32), v_i8.T.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask[None, :], scores, SCORE_SENTINEL)
        vals, idx = jax.lax.top_k(scores, min(k, cap))
        vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)  # see i8 above
        return vals, idx.astype(jnp.int32)
    assert cap % bn == 0 and num_q % qt == 0, (cap, bn, num_q, qt)
    # int32 score keys must stay above KEY_MIN; the f32 carry is exact for
    # any such score because the >= 7 cleared lane bits leave < 24
    # significant mantissa bits (see kernel docstring).
    assert 127 * 127 * dim < 2**31, dim
    lane_bits = max(1, int(bn - 1).bit_length())
    mask2d = mask.reshape(1, cap).astype(jnp.int32)

    grid = (num_q // qt, cap // bn)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel_i8c, k=k, bn=bn, lane_bits=lane_bits),
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
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i, b: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_q, k), jnp.float32),
            jax.ShapeDtypeStruct((num_q, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * num_q * cap * dim + 2 * k * num_q * cap,
            bytes_accessed=cap * dim * (num_q // qt) + num_q * dim,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_i8, v_i8, mask2d)

    vals = jnp.where(vals <= SCORE_SENTINEL, -jnp.inf, vals)
    return vals, idxs


def make_fused_topk_i8c(k: int, guard: int = 6, interpret: bool = False,
                        normalize: bool = True, tie_scale=None):
    """Env-resolving wrapper: see `_make_fused_topk_i8c_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_fused_topk_i8c_cached(k, guard, interpret, normalize, tie_scale)


@functools.lru_cache(maxsize=256)
def _make_fused_topk_i8c_cached(k: int, guard: int = 6, interpret: bool = False,
                        normalize: bool = True,
                                tie_scale: float = 1.0):
    """Small-batch column-scaled int8 top-k: integer exact-selection ladder
    + exact f32 rescore.

    Same serving role as `make_fused_topk_i8` (the Q=1 latency tier) with
    the convert/rescale VPU passes removed from every grid step and one
    less (1, BN) f32 input DMA'd per tile.

    fn(queries f32, v_i8, cscale, rescore_vectors f32, mask) -> (vals, idx)
    """

    def impl(queries, v_i8, cscale, rescore_vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        q_i8 = fold_queries_i8(queries, cscale)
        k_sel = k + max(0, guard)
        vals, idx = fused_topk_i8c(q_i8, v_i8, mask, k_sel,
                                   interpret=interpret)
        vals, idx = rescore_exact(queries, rescore_vectors, vals, idx)
        out_vals = _mark_crowded(vals[:, :k], vals, k,
                                 _tie_margin("i8", queries.shape[1], tie_scale))
        return out_vals, idx[:, :k]

    return jax.jit(impl)


def make_mixed_fused_topk(k: int, guard: int = 4, interpret: bool = False,
                          normalize: bool = True, tie_scale=None):
    """Env-resolving wrapper: see `_make_mixed_fused_topk_cached`."""
    if tie_scale is None:
        tie_scale = _tie_scale_env()
    return _make_mixed_fused_topk_cached(k, guard, interpret, normalize, tie_scale)


@functools.lru_cache(maxsize=256)
def _make_mixed_fused_topk_cached(k: int, guard: int = 4, interpret: bool = False,
                          normalize: bool = True,
                                  tie_scale: float = 1.0):
    """Small-batch mixed-precision top-k: the exact selection ladder over
    the bf16 scan mirror + exact f32 rescore.

    At tiny Q the f32 ladder kernel is HBM-bound on the corpus sweep;
    halving the sweep via the bf16 mirror measured 0.77 ms vs ~1.0 ms for
    the f32 XLA path at Q=1 over 100k x 1024 (v5e). Selection is the exact
    ladder (no per-segment truncation), so this is safe for any candidate
    clustering; only bf16 score quantization can reorder, and the guard
    band + f32 rescore recover it (recall@10 measured 1.000).

    fn(queries, scan_vectors bf16, rescore_vectors f32, mask) -> (vals, idx)
    """

    def impl(queries, scan_vectors, rescore_vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        k_sel = k + max(0, guard)
        vals, idx = fused_topk(queries, scan_vectors, mask, k_sel,
                               interpret=interpret)
        vals, idx = rescore_exact(queries, rescore_vectors, vals, idx)
        out_vals = _mark_crowded(vals[:, :k], vals, k,
                                 _tie_margin("bf16", queries.shape[1], tie_scale))
        return out_vals, idx[:, :k]

    return jax.jit(impl)


@functools.lru_cache(maxsize=256)
def make_fused_topk(k: int, compute_dtype_name: str | None = None,
                    interpret: bool = False, rescore: bool = True,
                    normalize: bool = True, guard: int = 4):
    """Jitted fused-top-k closure for a static k (shapes retrace as needed).

    `guard` extra ranks are selected in-kernel and dropped after the exact
    rescore: the packed key quantizes scores by ~2^-13 relative, so
    boundary-adjacent true top-k entries can lose the in-kernel selection by
    a hair — the guard band plus rescore reordering recovers them (measured:
    recall@10 at 100k x 1024 goes 0.993 -> 1.0 with guard=4).
    """
    compute_dtype = jnp.dtype(compute_dtype_name) if compute_dtype_name else None
    k_sel = k + max(0, guard) if rescore else k

    def impl(queries, vectors, mask):
        if normalize:
            from .exact import normalize_on_device

            queries = normalize_on_device(queries)
        vals, idxs = fused_topk(queries, vectors, mask, k_sel, compute_dtype)
        if rescore:
            vals, idxs = rescore_exact(queries, vectors, vals, idxs)
            vals, idxs = vals[:, :k], idxs[:, :k]
        return vals, idxs

    def fn(queries, vectors, mask):
        if interpret:
            with pltpu.force_tpu_interpret_mode():
                return impl(queries, vectors, mask)
        return impl(queries, vectors, mask)

    return jax.jit(fn)
