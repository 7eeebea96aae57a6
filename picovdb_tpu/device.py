"""Device-resident corpus mirror and query dispatch.

This is the TPU-native replacement for both the reference's NumPy score path
(picovdb/pico_vdb.py:670-714) and its FAISS HNSW subsystem
(picovdb/pico_vdb.py:171-212, 716-751, 866-921): the corpus lives in HBM as a
fixed-capacity padded (cap, dim) float32 matrix plus a boolean active mask,
mutated functionally (donated buffers, scatter updates) and queried by a
single fused program (XLA exact scan or the Pallas kernel).

Host state (ids, docs, free slots) remains authoritative — see
`picovdb_tpu.engine`. The device mirror is synchronized lazily before a
query, mirroring the reference's lazy FAISS rebuild
(picovdb/pico_vdb.py:660-665): small mutation sets are scatter-applied,
large ones trigger a full re-upload (the analog of incremental-vs-full
rebuild at picovdb/pico_vdb.py:884-921).
"""

from __future__ import annotations

import functools
import logging
import os as _os
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import Float, MIN_QUERY_PAD, ROW_PAD
from .utils import next_pow2, round_up, scatter_bucket
from .ops.exact import make_exact_topk


_FVIEW_MISS = object()  # distinguishes 'not cached' from a cached refusal


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(vectors, idx, rows):
    return vectors.at[idx].set(rows)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_mask(active, idx, vals):
    return active.at[idx].set(vals)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_1d(arr, idx, vals):
    return arr.at[idx].set(vals)


@functools.partial(jax.jit, static_argnums=(1,))
def _pad_tail_2d(x, pad: int):
    return jnp.pad(x, ((0, pad), (0, 0)))


@functools.partial(jax.jit, static_argnums=(1,))
def _pad_tail_1d(x, pad: int):
    return jnp.pad(x, (0, pad))


@jax.jit
def _pack_vi(vals, idxs):
    """(Q, k) f32 + (Q, k) i32 -> one (Q, 2k) i32 fetch buffer (bitcast)."""
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(vals, jnp.int32), idxs], axis=1
    )


@jax.jit
def _cast_bf16(vectors):
    return vectors.astype(jnp.bfloat16)


@jax.jit
def _gather_rows_raw(arr, idx):
    """Storage-dtype row gather: the transfer ships packed/quantized bytes
    and the dequant runs host-side (fetch_rows)."""
    return jnp.take(arr, idx, axis=0)


@jax.jit
def _gather_1d_raw(arr, idx):
    return jnp.take(arr, idx)


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_view(src, slots, n_f: int):
    """Compacted filtered view: gather surviving rows dense + its active
    mask (padding rows gather slot 0 and mask off)."""
    view = jnp.take(src, slots, axis=0)
    act = jnp.arange(slots.shape[0], dtype=jnp.int32) < n_f
    return view, act


@functools.lru_cache(maxsize=64)
def _make_serial_loop(inner):
    """Jitted M-serial-Q=1 runner over a (cached) query kernel. Keyed on
    the kernel closure, which the make_* builders lru_cache themselves."""

    @jax.jit
    def loop(qs, *args):
        def body(c, q):
            vals, idx = inner(q[None, :], *args)
            return c, (vals[0], idx[0])

        return jax.lax.scan(body, 0, qs)[1]

    return loop


def _pad_rows(arr: np.ndarray, cap: int, fill=0) -> np.ndarray:
    if arr.shape[0] == cap:
        return arr
    pad = cap - arr.shape[0]
    widths = ((0, pad),) + ((0, 0),) * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


class DeviceIndex:
    """HBM-resident (cap, dim) corpus + active mask with bucketed query dispatch.

    Single-device by default; when constructed with a mesh (see
    `picovdb_tpu.parallel`), arrays are row-sharded and queries run through
    the shard_map path with an ICI top-k merge.
    """

    def __init__(
        self,
        dim: int,
        device=None,
        mesh=None,
        shard_axis: str = "shard",
        compute_dtype: Optional[str] = None,
        use_pallas: Optional[bool] = None,
        storage_dtype: Optional[str] = None,
        scan_mode: str = "auto",
        mixed_precision: Optional[bool] = None,
        int8_tier: Optional[bool] = None,
    ) -> None:
        self.dim = dim
        self.cap = 0
        self.vectors = None  # jax.Array (cap, dim) in storage_dtype
        self.vstore_scale = None  # (cap,) f32 per-row scales (int8 storage)
        self.vectors_lp = None  # bf16 scan mirror (mixed-precision tier)
        self.vectors_i8 = None  # int8 selection mirror (latency tier)
        self.vscale = None  # (cap,) f32 per-row scales of the int8 mirror
        self.vectors_i8c = None  # column-scaled int8 mirror (lazy-built)
        self.cscale = None  # (dim,) f32 per-column scales of that mirror
        self._i8c_budget_ok = False  # set by _refresh_lp_mirror
        self.active = None  # jax.Array (cap,) bool
        self.mesh = mesh
        self.shard_axis = shard_axis
        # bfloat16 storage halves HBM residency and sweep traffic; scoring
        # accumulates in f32 and the winners are exact-rescored against the
        # same storage, so ranking error stays ~1e-3 (guard band absorbs
        # boundary flips). int8 storage quarters residency (per-ROW scales:
        # exact mutation semantics, ~3e-4 score quantization at dim 1024 —
        # tighter than bf16) and lifts the single-chip capacity ceiling to
        # ~12M x 1024 rows. int4 storage halves int8 again (~25M x 1024 on
        # one chip, ~200M over a v5e-8 mesh; two-plane nibble packing,
        # ops/pallas_scan.py int4 section) — intended for host-born stores
        # where the engine's host-f64 rescore restores exact ranking. Host
        # persistence remains float32 in every case.
        self.storage_dtype = storage_dtype or "float32"
        if self.storage_dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise ValueError(
                "storage_dtype must be one of float32/bfloat16/int8/int4; "
                f"got {self.storage_dtype!r}"
            )
        if self.storage_dtype == "int4" and dim % 2:
            raise ValueError(
                "int4 storage packs two elements per byte and needs an "
                f"even embedding_dim; got {dim}"
            )
        if compute_dtype is None and self.storage_dtype == "bfloat16":
            compute_dtype = "bfloat16"
        self.compute_dtype = compute_dtype
        self._device = device if device is not None else jax.devices()[0]
        platform = getattr(self._device, "platform", "cpu")
        if use_pallas is None:
            use_pallas = platform == "tpu"
        self.use_pallas = use_pallas
        # Single-device scan strategy:
        #   fused  — Pallas kernel, exact, no (Q, cap) score matrix in HBM
        #   approx — XLA matmul + lax.approx_max_k + exact rescore (~2x the
        #            fused throughput at large Q; recall >= its target, and
        #            exact on CPU where approx_max_k falls back to top_k)
        #   xla    — XLA matmul + exact lax.top_k
        #   auto   — fused on TPU, xla elsewhere (current default behavior)
        assert scan_mode in ("auto", "mixed", "fused", "approx", "xla"), (
            scan_mode
        )
        self.scan_mode = scan_mode
        # Mixed-precision scan tier: a bfloat16 mirror of the corpus serves
        # *selection* (half the HBM sweep, 2x the MXU rate) while ranking
        # rescores the winners against the float32 corpus — so returned
        # scores are exact and measured recall@10 at 100k x 1024 is 1.000.
        # Default: on for TPU float32 stores (auto/mixed modes use it via
        # the segmax kernel); off under a mesh (the sharded path scans the
        # sharded f32 corpus) and for bf16 storage (already low-precision).
        if mixed_precision is None:
            mixed_precision = (
                platform == "tpu"
                and mesh is None
                and self.storage_dtype == "float32"
            ) or scan_mode == "mixed"
        self.mixed_precision = bool(mixed_precision) and mesh is None
        # int8 selection tier: a per-row-scaled int8 mirror serves
        # *selection* at 1 byte/element — half of bf16, a quarter of f32 —
        # with winners exact-rescored against the full-precision corpus.
        # Measured interleaved-A/B at 100k x 1024
        # (bench/results/int8_ab_r3.json): recall@10 = 1.000 on every int8
        # route; the tiny-Q ladder is 1.24x the bf16 ladder (and gets
        # bn=4096 blocks the 2-byte mirror can't fit), so it is the
        # small-Q default. The batch segmax measured 0.88x bf16 (the
        # int8->f32 convert + rescale on the (256, BN) score tile outweighs
        # the halved sweep at large qt), so batch stays on the bf16 mirror;
        # PICOVDB_SEGMAX_I8=1 opts the segmax tier into int8 for
        # re-measurement on other hardware.

        if int8_tier is None:
            env = _os.getenv("PICOVDB_INT8_TIER")
            if env is not None:
                int8_tier = env not in ("0", "false", "False", "")
            else:
                int8_tier = (
                    platform == "tpu"
                    and mesh is None
                    and self.storage_dtype == "float32"
                )
        self.int8_tier = bool(int8_tier) and mesh is None
        self.segmax_i8 = self.int8_tier and _os.getenv(
            "PICOVDB_SEGMAX_I8", ""
        ) not in ("", "0", "false", "False")
        # Column-scaled int8 tier ("i8c"): per-COLUMN scales fold into the
        # query at dispatch, so the kernels rank raw int32 MXU scores with
        # zero per-tile convert/rescale work — the VPU passes that made the
        # per-row int8 batch segmax lose to bf16 (0.89x,
        # bench/results/int8_ab_r3.json) are gone, and the sweep still
        # reads 1 B/element. Measured A/B (bench/results/int8_ab_r3b.json):
        # batch i8c STILL loses to bf16 (0.76x) even with all the VPU
        # passes removed — at qt=256 tiles the sweep is MXU-bound and the
        # s8 dot does not run faster than bf16 through Mosaic on v5e — so
        # the batch default stays bf16; at Q=1 i8c matches the per-row i8
        # ladder (0.994x, both ~1.13x bf16), so the proven per-row tier
        # keeps the tiny-Q default. Both routes remain re-measurable via
        # the envs below; the mirror rides the int8_tier placement rules.
        env_i8c = _os.getenv("PICOVDB_INT8C_TIER", "auto")
        self.i8c_tier = self.int8_tier if env_i8c in ("auto", "") else (
            env_i8c not in ("0", "false", "False") and mesh is None
        )
        env_seg_i8c = _os.getenv("PICOVDB_SEGMAX_I8C", "auto")
        self.segmax_i8c = self.i8c_tier and (
            self.SEGMAX_I8C_DEFAULT if env_seg_i8c in ("auto", "") else
            env_seg_i8c not in ("0", "false", "False")
        )
        env_smq_i8c = _os.getenv("PICOVDB_SMALLQ_I8C", "auto")
        self.smallq_i8c = self.i8c_tier and (
            self.SMALLQ_I8C_DEFAULT if env_smq_i8c in ("auto", "") else
            env_smq_i8c not in ("0", "false", "False")
        )
        # Corpus-resident ("stream") grid order for the batch segmax sweep:
        # the corpus streams through HBM once per BATCH instead of once per
        # 256-query tile (32x fewer corpus bytes at Q=8192), at the price
        # of re-reading the small query tiles. Pays off once the batch
        # spans several query tiles; below that the classic order reads
        # less. Routed per-dispatch in query_async; PICOVDB_SEGMAX_STREAM
        # ∈ {auto,0,1} overrides.
        env_stream = _os.getenv("PICOVDB_SEGMAX_STREAM", "auto")
        self.segmax_stream = (
            None if env_stream in ("auto", "") else
            env_stream not in ("0", "false", "False")
        )
        # Per-dispatch strategy introspection. Thread-local: concurrent
        # readers share the RWLock, and the engine decides the segmax
        # underfill retry from the strategy of ITS OWN dispatch — a shared
        # attribute could be overwritten by another thread's dispatch in
        # the window between dispatch and read, silently skipping the
        # retry. Threads that never dispatched read the last global value.
        self._strategy_tls = threading.local()
        self._strategy_global: Optional[str] = None
        # Introspection: how the last device synchronization was applied
        # ("scatter" | "full" | "grow" | None; "grow" = capacity-bucket
        # crossing d2d pad) — analog of the reference's
        # `_last_faiss_rebuild_mode` ("incremental" | "full").
        self.last_sync_mode: Optional[str] = None
        # Device-resident filter-mask cache: serving workloads repeat the
        # same `where` filters, and re-uploading a (cap,) bool mask per
        # query costs a host->HBM transfer of the corpus *length* each time
        # (175 ms at 1M rows over the dev-harness relay). Keyed by the
        # engine's frozen filter spec + mutation epoch; cleared on any
        # mirror mutation. Bounded FIFO.
        self._mask_cache: dict = {}
        self.MASK_CACHE_MAX = 32
        # replicated-output row-fetch jits on mesh stores (see _fetch_jit)
        self._fetch_rep_jits: dict = {}
        # Compacted filtered-corpus views (surviving rows gathered dense):
        # lets BIG filtered batches ride the segmax tier — per-segment
        # truncation is unsafe under a clustered filter on the full
        # corpus, but compaction spreads survivors uniformly, restoring
        # exactly the unfiltered statistical contract over n_f rows
        # (VERDICT r3 #8). Keyed like _mask_cache (filter spec + mutation
        # epoch); big (n_f x dim bf16), so the FIFO bound is small and
        # the cache clears with the mask cache.
        self._fview_cache: dict = {}
        self.FVIEW_CACHE_MAX = 2

    @property
    def last_strategy(self) -> Optional[str]:
        """The calling thread's most recent dispatch strategy.

        Thread-local by design (see `_strategy_tls` above): a thread that
        has dispatched at least once always reads ITS OWN latest strategy,
        even if other threads dispatched since; threads that never
        dispatched fall back to the process-wide last value. Cross-thread
        introspection (e.g. a monitoring thread that itself ran a query
        earlier) therefore sees that thread's own — possibly stale — value
        rather than the globally newest one.
        """
        return getattr(self._strategy_tls, "v", self._strategy_global)

    @last_strategy.setter
    def last_strategy(self, value: Optional[str]) -> None:
        self._strategy_tls.v = value
        self._strategy_global = value

    # -- placement -----------------------------------------------------------

    def _row_sharding(self):
        if self.mesh is None:
            return self._device
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(self.shard_axis, None))

    def _mask_sharding(self):
        if self.mesh is None:
            return self._device
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P(self.shard_axis))

    def _replicated(self):
        if self.mesh is None:
            return self._device
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P())

    def _padded_cap(self, n: int) -> int:
        cap = round_up(max(n, 1), ROW_PAD)
        if self.mesh is not None:
            nshards = self.mesh.shape[self.shard_axis]
            cap = round_up(cap, ROW_PAD * nshards)
        return cap

    def _cap_with_headroom(self, n: int) -> int:
        """Padded capacity plus append headroom on capacity-tier stores.

        At >=1M rows the ROW_PAD alignment pad is taken anyway (and for
        adopt the pad already costs the transient copy), so widen it to
        ~n/64 extra rows: ~64 append epochs of n/64k rows land in the
        existing plane as O(changed) scatters before `grow()` must pay
        the old+new transient — which at HBM-saturated scale can
        RESOURCE_EXHAUST and (measured, bench/results/ivf8m_i4_incr_r5b
        .log) leave the axon device unable to serve further allocations.
        When n is already ROW_PAD-aligned (the documented zero-copy
        ceiling recipe, e.g. 12.58M = 1536*8192 int8) the pad stays 0 and
        no headroom is added, preserving the ceiling adopt.
        """
        cap = max(self.cap, self._padded_cap(n))
        if n >= 1_000_000 and cap != n:
            cap = max(cap, self._padded_cap(n + n // 64))
        return cap

    def _filter_view(self, mask_key, filter_mask):
        """Get-or-build the compacted corpus view for a filter mask.

        Returns (slots (capf,) int32, scan_view (capf, dim) bf16,
        active (capf,) bool), all device-resident, or None when the
        survivor set is too small for segmax to pay (< SEGMAX_MIN_CAP) or
        the view would blow the HBM budget (PICOVDB_FVIEW_BUDGET_GB,
        default 4). The gather runs on device from the bf16 mirror — no
        host traffic beyond the (n_f,) slot list. Cached per mask_key
        (filter spec + mutation epoch) beside _mask_cache; cleared with it
        on any mirror mutation.
        """
        v = self._fview_cache.get(mask_key, _FVIEW_MISS)
        if v is not _FVIEW_MISS:
            return v  # may be a cached REFUSAL (None): see below
        n_f = int(filter_mask.sum())
        if n_f < self.SEGMAX_MIN_CAP or not self._fview_budget_ok(n_f):
            # cache the refusal too: every chunk of a filtered batch
            # re-asks, and the O(cap) mask sum per chunk adds up on
            # multi-million-row stores (r5 review finding)
            if mask_key is not None:
                self._fview_cache[mask_key] = None
            return None
        rows = np.nonzero(filter_mask)[0].astype(np.int32)
        capf = round_up(n_f, ROW_PAD)
        slots_dev = jax.device_put(_pad_rows(rows, capf), self._device)
        view, act = _gather_view(self.vectors_lp, slots_dev, n_f)
        out = (slots_dev, view, act)
        while len(self._fview_cache) >= self.FVIEW_CACHE_MAX:
            # same concurrent-eviction caveat as _mask_cache; evict
            # cached refusals (None) before real views — a rotating
            # refused filter must not thrash the 2-slot view cache
            try:
                snap = list(self._fview_cache.items())
                victim = next(
                    (k for k, cached in snap if cached is None),
                    snap[0][0] if snap else None,
                )
                if victim is None and not snap:
                    break
                self._fview_cache.pop(victim, None)
            except (StopIteration, RuntimeError):
                break
        if mask_key is not None:
            self._fview_cache[mask_key] = out
        return out

    def _fview_budget_ok(self, n_f: int) -> bool:
        try:
            budget_gb = float(
                _os.getenv("PICOVDB_FVIEW_BUDGET_GB", "4") or 4
            )
        except ValueError:
            budget_gb = 4.0
        return n_f * self.dim * 2.0 <= budget_gb * 2**30

    # -- synchronization -------------------------------------------------------

    def _storage_np_dtype(self):
        if self.storage_dtype == "float32":
            return Float
        import ml_dtypes  # ships with jax

        return np.dtype(getattr(ml_dtypes, self.storage_dtype))

    # `auto` scan-mode routing: below this many (padded) queries the fused
    # kernel is latency-bound — its per-tile selection ladder costs ~28
    # small VPU ops per corpus tile regardless of Q, so a Q<=8 scan over
    # 100k x 1024 measures 1.8 ms fused vs 0.7-1.0 ms for the plain XLA
    # matmul+top_k (v5e, BENCHMARKS.md "small-Q routing"); fused wins from
    # Q=32 up (1.04 vs 1.23 ms). Explicit scan_mode="fused" bypasses this.
    SMALL_Q_XLA = 16

    # segmax routing bounds: per-segment top-2 extraction is statistically
    # safe while k stays small relative to the segment count (recall loss
    # needs >2 of the true top-k in one 128-row segment), and only pays off
    # once the corpus spans enough scan blocks.
    SEGMAX_MAX_K = 16
    SEGMAX_MIN_CAP = 32_768

    # Measurement-driven defaults for the column-scaled int8 routes
    # (flipped by hardware A/B; PICOVDB_SEGMAX_I8C / PICOVDB_SMALLQ_I8C
    # override per-process).
    SEGMAX_I8C_DEFAULT = False
    SMALLQ_I8C_DEFAULT = False

    # Above this many rows, full uploads stream chunk-by-chunk into a
    # device-resident buffer (donated scatters), so a memmapped corpus
    # larger than host RAM never materializes on the host (SURVEY.md §7.6
    # "memmap streaming host->HBM").
    STREAM_CHUNK_ROWS = 262_144

    def grow(self, n: int) -> bool:
        """Grow padded capacity device-side to hold `n` rows — zero host traffic.

        Append epochs that cross a ROW_PAD capacity bucket used to fall
        back to the host-fed full re-upload (`_ensure_host_vectors` +
        `full_upload`), which on a lazy capacity-tier store materializes
        the full f32 host matrix (~33 GB at 8M x 1024) and was measured to
        OOM on the chip with the IVF postings mirror resident
        (bench/results/ivf8m_i4_incr_r5.log). This pads every resident
        plane with zero rows on device instead (d2d, milliseconds) and
        adds a small slack (max(ROW_PAD, n/64)) so subsequent appends stay
        inside the new bucket — keeping mutation epochs O(changed) across
        bucket boundaries (reference bar: incremental must beat full,
        picovdb/pico_vdb.py:884-921).

        Peak HBM is old + new corpus plane. On allocation failure near the
        HBM ceiling the method degrades rather than corrupts: if the core
        plane pad fails the store is untouched; if a later (small) buffer
        fails the device mirror is dropped wholesale. Either way returns
        False and the caller falls back to the full re-upload path.
        """
        if self.vectors is None:
            return False
        slack = max(ROW_PAD, n // 64)
        new_cap = max(self.cap, self._padded_cap(n + slack))
        if new_cap <= self.cap:
            return True
        pad = new_cap - self.cap
        row_sh = self._row_sharding()
        mask_sh = self._mask_sharding()
        committed = False
        try:
            # the big plane first: a failure here leaves the store intact.
            # device_put rebalances the tail padding across shards (the
            # block distribution's row boundaries move with cap).
            vecs = jax.device_put(_pad_tail_2d(self.vectors, pad), row_sh)
            vecs.block_until_ready()
            self.vectors = vecs
            committed = True
            self.active = jax.device_put(
                _pad_tail_1d(self.active, pad), mask_sh
            )
            if self.vstore_scale is not None:
                self.vstore_scale = jax.device_put(
                    _pad_tail_1d(self.vstore_scale, pad), mask_sh
                )
            self.cap = new_cap
        except Exception as e:  # RESOURCE_EXHAUSTED near the HBM ceiling
            if committed:
                # partially grown (corpus plane at new_cap, cap/active
                # still old): drop the mirror wholesale — whether OOM or
                # any other failure — so no later op pairs a new_cap
                # corpus with an old-cap mask; the caller's full
                # re-upload rebuilds every buffer at a consistent cap
                self.vectors = None
                self.vstore_scale = None
                self.vectors_lp = None
                self.vectors_i8 = None
                self.vscale = None
                self.vectors_i8c = None  # a stale corpus-sized plane
                self.cscale = None       # would pin HBM mid-recovery
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            logging.getLogger("picovdb_tpu").warning(
                "device grow %d -> %d rows exhausted HBM (%s)",
                self.cap, new_cap, str(e).split("\n")[0][:160],
            )
            return False
        # optional mirrors (f32/bf16 stores): pad in place; each step
        # frees its old buffer on assignment, bounding the transient. A
        # mirror that fails to grow is simply dropped — queries fall back
        # to the f32 corpus plane for that tier.
        try:
            if self.vectors_lp is not None:
                self.vectors_lp = jax.device_put(
                    _pad_tail_2d(self.vectors_lp, pad), row_sh
                )
        except Exception as e:
            # drop FIRST: an old-cap mirror next to the new-cap corpus
            # would shape-mismatch every strategy that reads it
            self.vectors_lp = None
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
        try:
            if self.vectors_i8 is not None:
                self.vectors_i8 = jax.device_put(
                    _pad_tail_2d(self.vectors_i8, pad), row_sh
                )
                self.vscale = jax.device_put(
                    _pad_tail_1d(self.vscale, pad), mask_sh
                )
        except Exception as e:
            self.vectors_i8 = None
            self.vscale = None
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
        # i8c mirror stays lazy (corpus-global column scales); its HBM
        # budget gate re-evaluates at the NEW capacity, or
        # ensure_i8c_mirror could build an over-budget mirror and OOM a
        # later dispatch (r5 review finding)
        self.vectors_i8c = None
        self.cscale = None
        if self.i8c_tier:
            budget, bpe = self._mirror_budget()
            self._i8c_budget_ok = self.cap * self.dim * bpe <= budget
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "grow"  # introspection: capacity-bucket
        return True                   # crossing d2d pad (not a sync)

    def full_upload(self, host_vectors: np.ndarray, active_np: np.ndarray) -> None:
        """Upload the whole corpus, growing padded capacity as needed."""
        n = host_vectors.shape[0]
        cap = self._cap_with_headroom(n)
        mask = _pad_rows(np.ascontiguousarray(active_np, dtype=bool), cap)
        if self.storage_dtype in ("int8", "int4") and self.mesh is not None:
            # Sharded quantized corpus: rows + their per-row scales live on
            # the owning shard. Quantization (and for int4 the two-plane
            # nibble pack) is row-local, so one jitted pass over the
            # row-sharded f32 upload partitions with zero collectives
            # (GSPMD keeps in/out row shardings aligned); the f32 staging
            # array is transient, mirroring the existing non-streamed mesh
            # upload below.
            from .ops.pallas_scan import quantize_rows_i4, quantize_rows_i8

            quant = (quantize_rows_i4 if self.storage_dtype == "int4"
                     else quantize_rows_i8)
            vecs = _pad_rows(
                np.ascontiguousarray(np.asarray(host_vectors, dtype=Float)),
                cap,
            )
            f_dev = jax.device_put(vecs, self._row_sharding())
            # no donation: the f32 input cannot alias the narrower
            # quantized outputs, so donating would only warn — but DROP
            # the reference immediately after dispatch so the staging
            # plane frees when the quant completes (donation's other
            # effect), not at the end of the method
            q8, qs = jax.jit(quant)(f_dev)
            del f_dev
            self.vectors = jax.device_put(q8, self._row_sharding())
            self.vstore_scale = jax.device_put(qs, self._mask_sharding())
            self.active = jax.device_put(mask, self._mask_sharding())
            self.cap = cap
            self._refresh_lp_mirror()
            self._mask_cache.clear()
            self._fview_cache.clear()
            self.last_sync_mode = "full"
            return
        if self.storage_dtype in ("int8", "int4"):
            # Per-row quantization is chunk-local (each row owns its
            # scale), so the quantized corpus builds in ONE streaming
            # pass: upload an f32 chunk, quantize (+pack, for int4) on
            # device, scatter into the narrow buffer + scale column.
            from .ops.pallas_scan import quantize_rows_i4, quantize_rows_i8

            i4 = self.storage_dtype == "int4"
            quant = quantize_rows_i4 if i4 else quantize_rows_i8
            cols = self.dim // 2 if i4 else self.dim
            buf = jax.device_put(
                jnp.zeros((cap, cols), dtype=jnp.int8), self._device
            )
            scales = jax.device_put(
                jnp.zeros((cap,), dtype=jnp.float32), self._device
            )
            chunk = self.STREAM_CHUNK_ROWS
            for start in range(0, n, chunk):
                rows = np.ascontiguousarray(
                    np.asarray(host_vectors[start:start + chunk], dtype=Float)
                )
                q8, qs = quant(
                    jax.device_put(rows, self._device)
                )
                idx = jax.device_put(
                    np.arange(start, start + rows.shape[0], dtype=np.int32),
                    self._device,
                )
                buf = _scatter_rows(buf, idx, q8)
                scales = _scatter_1d(scales, idx, qs)
            self.vectors = buf
            self.vstore_scale = scales
            self.active = jax.device_put(mask, self._device)
            self.cap = cap
            self._refresh_lp_mirror()
            self._mask_cache.clear()
            self._fview_cache.clear()
            self.last_sync_mode = "full"
            return
        sdt = self._storage_np_dtype()
        stream = n > self.STREAM_CHUNK_ROWS and self.mesh is None
        if stream:
            buf = jax.device_put(
                jnp.zeros((cap, self.dim), dtype=jnp.dtype(sdt)), self._device
            )
            chunk = self.STREAM_CHUNK_ROWS
            for start in range(0, n, chunk):
                rows = np.ascontiguousarray(
                    # dtype= copies only on mismatch; .astype would copy
                    # a full chunk even when the store is already f32
                    np.asarray(host_vectors[start : start + chunk],
                               dtype=sdt)
                )
                idx = np.arange(start, start + rows.shape[0], dtype=np.int32)
                buf = _scatter_rows(
                    buf,
                    jax.device_put(idx, self._device),
                    jax.device_put(rows, self._device),
                )
            self.vectors = buf
        else:
            vecs = _pad_rows(
                # dtype= copies only on mismatch (the .astype form copied
                # the whole corpus even when already f32 — ~32 GB of
                # avoidable host transient at 8M x 1024 on mesh stores,
                # which never stream)
                np.ascontiguousarray(np.asarray(host_vectors, dtype=sdt)),
                cap,
            )
            self.vectors = jax.device_put(vecs, self._row_sharding())
        self.active = jax.device_put(mask, self._mask_sharding())
        self.cap = cap
        self._refresh_lp_mirror()
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "full"

    def adopt(self, vectors_dev, n: int, normalize: bool = False,
              scales=None, want_shadow: bool = False):
        """Adopt a device-resident (n, dim) array as the full corpus.

        Device-born ingestion: embeddings produced on the TPU (e.g. by the
        on-TPU BERT encoder, models/bert_encoder.py) become the corpus
        without ever visiting the host — no host mirror copy, no PCIe/relay
        round trip. One jitted program normalizes (optional), casts to the
        storage dtype, and pads to the aligned capacity; the input buffer
        is donated where it can actually alias (pad == 0, matching dtype)
        and otherwise released as soon as the consuming program is
        dispatched, so peak HBM stays ~input + padded output.

        `want_shadow=True` additionally fetches the normalized f32 rows to
        host BEFORE the storage-dtype cast and returns them (engine
        `host_shadow`: the exact-recall tier for device-born lossy stores).
        Costs one device->host corpus transfer and host RAM for the f32
        matrix; not available for pre-quantized input (`scales`), whose
        f32 form never existed. Returns None otherwise.
        """
        shadow = None
        if want_shadow and scales is None:
            # donate only when the f32 output can alias the input (same
            # dtype); a bf16/int input widens and could never alias
            @functools.partial(
                jax.jit, static_argnums=(1,),
                donate_argnums=(
                    (0,) if vectors_dev.dtype == jnp.float32 else ()
                ),
            )
            def _norm32(x, do_norm):
                x = x.astype(jnp.float32)
                if do_norm:
                    nrm = jnp.linalg.norm(x, axis=1, keepdims=True)
                    e0 = jnp.zeros_like(x).at[:, 0].set(1.0)
                    x = jnp.where(
                        nrm > 0.0, x / jnp.where(nrm > 0, nrm, 1), e0
                    )
                return x

            vectors_dev = _norm32(vectors_dev, bool(normalize))
            shadow = np.asarray(vectors_dev)  # blocks: safe to donate after
            if not shadow.flags.writeable:  # engine mutates host rows
                shadow = shadow.copy()
            normalize = False
        cap = self._cap_with_headroom(n)
        if self.storage_dtype in ("int8", "int4") and scales is not None:
            # pre-quantized device-born input (built chunk-wise when the
            # f32 intermediate could never fit HBM — e.g. 12M x 1024):
            # pad and adopt as-is. For int4 the input is the PACKED
            # (n, dim//2) byte matrix (quantize_rows_i4's layout). NOTE:
            # at the capacity ceiling, build the
            # input with n a ROW_PAD multiple — pad != 0 cannot alias the
            # donated buffer (shape change), so the pad step transiently
            # doubles the corpus (measured OOM at 12.0M x 1024; 12.58M =
            # 1536 * 8192 adopts with zero copies).
            assert vectors_dev.dtype == jnp.int8, vectors_dev.dtype
            if self.storage_dtype == "int4":
                assert vectors_dev.shape[1] == self.dim // 2, (
                    vectors_dev.shape, self.dim
                )

            if cap == n:
                # donation aliases only at pad == 0 (see NOTE above):
                # the zero-copy adopt at ROW_PAD-multiple n
                @functools.partial(jax.jit, donate_argnums=(0, 1))
                def _pad_q0(v8, vs):
                    return v8, vs

                v8, vs = _pad_q0(vectors_dev, scales)
            else:
                # pad changes the shape, so the donated input could never
                # alias — donating here only emits "buffers were not
                # usable" warnings (the transient 2x is inherent)
                @functools.partial(jax.jit, static_argnums=(2,))
                def _pad_q(v8, vs, pad):
                    return (jnp.pad(v8, ((0, pad), (0, 0))),
                            jnp.pad(vs, (0, pad)))

                v8, vs = _pad_q(vectors_dev, scales, cap - n)
            self.vectors = jax.device_put(v8, self._row_sharding())
            self.vstore_scale = jax.device_put(vs, self._mask_sharding())
            self.active = jax.device_put(
                jnp.arange(cap, dtype=jnp.int32) < n, self._mask_sharding()
            )
            self.cap = cap
            self._refresh_lp_mirror()
            self._mask_cache.clear()
            self._fview_cache.clear()
            self.last_sync_mode = "full"
            return shadow
        if self.storage_dtype in ("int8", "int4"):
            from .ops.pallas_scan import quantize_rows_i4, quantize_rows_i8

            quant = (quantize_rows_i4 if self.storage_dtype == "int4"
                     else quantize_rows_i8)

            # no donation: the f32 input can never alias the int8/packed
            # output (element width changes), so donating only warns
            @functools.partial(jax.jit, static_argnums=(1, 2))
            def _prep_q(x, pad, do_norm):
                x = x.astype(jnp.float32)
                if do_norm:
                    nrm = jnp.linalg.norm(x, axis=1, keepdims=True)
                    e0 = jnp.zeros_like(x).at[:, 0].set(1.0)
                    x = jnp.where(
                        nrm > 0.0, x / jnp.where(nrm > 0, nrm, 1), e0
                    )
                q8, qs = quant(x)
                if pad:
                    q8 = jnp.pad(q8, ((0, pad), (0, 0)))
                    qs = jnp.pad(qs, (0, pad))
                return q8, qs

            v8, vs = _prep_q(vectors_dev, cap - n, bool(normalize))
            self.vectors = jax.device_put(v8, self._row_sharding())
            self.vstore_scale = jax.device_put(vs, self._mask_sharding())
            self.active = jax.device_put(
                jnp.arange(cap, dtype=jnp.int32) < n, self._mask_sharding()
            )
            self.cap = cap
            self._refresh_lp_mirror()
            self._mask_cache.clear()
            self._fview_cache.clear()
            self.last_sync_mode = "full"
            return shadow
        sdt = jnp.dtype(self._storage_np_dtype())
        # donation aliases only when the output keeps the input's shape
        # and dtype (pad == 0, matching storage dtype) — that is the
        # zero-copy adopt documented below; anywhere else it just warns
        alias_ok = (cap == n) and (vectors_dev.dtype == sdt)

        @functools.partial(
            jax.jit, static_argnums=(1, 2),
            donate_argnums=(0,) if alias_ok else (),
        )
        def _prep(x, pad, do_norm):
            if do_norm:
                x = x.astype(jnp.float32)
                nrm = jnp.linalg.norm(x, axis=1, keepdims=True)
                # zero rows map to e0, matching utils.normalize_batch and
                # the reference (picovdb/pico_vdb.py:58-68)
                e0 = jnp.zeros_like(x).at[:, 0].set(1.0)
                x = jnp.where(nrm > 0.0, x / jnp.where(nrm > 0, nrm, 1), e0)
            # normalize=False with matching dtype and no padding is a pure
            # donation pass-through: pre-normalized storage-dtype input
            # (e.g. a 4M x 1024 bf16 matrix built chunk-wise on device)
            # costs zero extra HBM here.
            x = x.astype(sdt)
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)))
            return x

        v = _prep(vectors_dev, cap - n, bool(normalize))
        mask = jnp.arange(cap, dtype=jnp.int32) < n
        if self.mesh is None:
            self.vectors = jax.device_put(v, self._device)
            self.active = jax.device_put(mask, self._device)
        else:
            self.vectors = jax.device_put(v, self._row_sharding())
            self.active = jax.device_put(mask, self._mask_sharding())
        self.cap = cap
        self._refresh_lp_mirror()
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "full"
        return shadow

    def adopt_global(self, vectors_global, active_np: np.ndarray) -> None:
        """Adopt an externally assembled GLOBAL row-sharded corpus array.

        Multi-process engine load (SURVEY §2 distributed table): each
        process reads only its own checkpoint shard and joins it into one
        global jax.Array (parallel.multihost.load_host_shard); this method
        casts to the storage dtype and pads to the aligned capacity in ONE
        jitted program whose output sharding is the corpus row sharding —
        GSPMD inserts the cross-process row movement (ICI/Gloo), so no
        host ever touches another host's rows. f32/bfloat16 storage only
        (quantized tiers load via their packed plane instead).
        """
        if self.storage_dtype in ("int8", "int4"):
            raise NotImplementedError(
                "adopt_global supports float32/bfloat16 storage; quantized "
                "multi-process stores load via upload_prequantized"
            )
        n = int(vectors_global.shape[0])
        cap = self._cap_with_headroom(n)
        sdt = jnp.dtype(self._storage_np_dtype())

        @functools.partial(
            jax.jit, static_argnums=(1,),
            # donation can alias only when shape and dtype survive the
            # cast+pad; the resharding itself may still block it, but
            # then aliasing is genuinely impossible and the warning is
            # the honest outcome
            donate_argnums=(
                (0,) if (cap == n and vectors_global.dtype == sdt) else ()
            ),
            out_shardings=self._row_sharding(),
        )
        def _pad_cast(v, pad):
            v = v.astype(sdt)
            if pad:
                v = jnp.pad(v, ((0, pad), (0, 0)))
            return v

        self.vectors = _pad_cast(vectors_global, cap - n)
        # active mask: host metadata is replicated across processes, so
        # every process passes the identical padded array and device_put
        # slices out its local rows
        self.active = jax.device_put(
            _pad_rows(np.asarray(active_np, dtype=bool), cap),
            self._mask_sharding(),
        )
        self.cap = cap
        self._refresh_lp_mirror()
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "full"

    # f32 corpus + bf16 mirror = 6 bytes/row/dim; above this the mirror is
    # skipped so big corpora keep their headroom (v5e has 16 GB HBM).
    MIXED_HBM_BUDGET = 12 * 2**30

    def _mirror_budget(self) -> tuple:
        """(HBM budget bytes, bytes/element across resident planes) for
        the mirror-tier gating — one home for the math used by
        `_refresh_lp_mirror` and `grow`."""

        budget = int(
            float(_os.getenv("PICOVDB_MIXED_BUDGET_GB", "0") or 0) * 2**30
        ) or self.MIXED_HBM_BUDGET
        bpe = 4  # f32 corpus
        if self.mixed_precision:
            bpe += 2
        if self.int8_tier:
            bpe += 1  # + 4/dim for scales, negligible
        if self.i8c_tier:
            bpe += 1
        return budget, bpe

    def _refresh_lp_mirror(self) -> None:
        """(Re)build the low-precision scan mirrors from the committed corpus.

        bf16 (selection for the batch segmax tier) and int8 + per-row scales
        (the tiny-Q latency tier) are derived on device — no host traffic.
        """

        if self.storage_dtype in ("int8", "int4"):
            # the corpus IS the quantized tier; no mirrors
            self.vectors_lp = None
            self.vectors_i8 = None
            self.vscale = None
            self.vectors_i8c = None
            self.cscale = None
            self._i8c_budget_ok = False
            return
        budget, bpe = self._mirror_budget()
        if not self.mixed_precision or self.vectors is None:
            self.vectors_lp = None
        elif self.cap * self.dim * bpe > budget:
            self.vectors_lp = None
        else:
            self.vectors_lp = _cast_bf16(self.vectors)
        if not self.int8_tier or self.vectors is None:
            self.vectors_i8 = None
            self.vscale = None
        elif self.cap * self.dim * bpe > budget:
            self.vectors_i8 = None
            self.vscale = None
        else:
            from .ops.pallas_scan import quantize_rows_i8

            self.vectors_i8, self.vscale = quantize_rows_i8(self.vectors)
        # The i8c mirror is LAZY: dropped here (and on scatter — column
        # scales are corpus-global, so per-row scatter-quantization against
        # stale scales would distort selection) and rebuilt by
        # `ensure_i8c_mirror` on the first dispatch that routes to it.
        # With both i8c routes default-off this costs nothing unless a
        # measurement flips them on.
        self.vectors_i8c = None
        self.cscale = None
        self._i8c_budget_ok = (
            self.i8c_tier and self.cap * self.dim * bpe <= budget
        )

    def ensure_i8c_mirror(self) -> bool:
        """Build the column-scaled int8 mirror on demand; True if usable."""
        if self.vectors_i8c is not None:
            return True
        if (not self.i8c_tier or self.vectors is None
                or not self._i8c_budget_ok):
            return False
        from .ops.pallas_scan import quantize_cols_i8

        self.vectors_i8c, self.cscale = quantize_cols_i8(self.vectors)
        return True

    def scatter(
        self, idxs: np.ndarray, rows: Optional[np.ndarray], active_vals: np.ndarray
    ) -> None:
        """Apply a small mutation set in place (donated buffers, no host copy).

        `rows` may be None for delete-only updates (mask clear); the vector
        rows of deleted slots are then zeroed lazily on the next full upload,
        which is safe because the mask excludes them from scoring.
        """
        if self.vectors is None:
            raise RuntimeError("scatter before any upload")
        n = idxs.shape[0]
        if n == 0:
            return
        # pow2 bucket with a 1024 floor on capacity stores: one executable
        # set per layout covers every small epoch, pre-compiled by
        # warm_scatter_path (utils.scatter_bucket documents the tradeoff)
        pad_n = scatter_bucket(n, self.cap)
        if pad_n != n:
            pad_idx = np.concatenate([idxs, np.repeat(idxs[-1:], pad_n - n)])
            pad_act = np.concatenate(
                [active_vals, np.repeat(active_vals[-1:], pad_n - n)]
            )
        else:
            pad_idx, pad_act = idxs, active_vals
        dev_idx = jax.device_put(pad_idx.astype(np.int32), self._replicated())
        if rows is not None and self.storage_dtype in ("int8", "int4"):
            # per-row scales: mutations quantize exactly, no stale scales
            from .ops.pallas_scan import quantize_rows_i4, quantize_rows_i8

            quant = (quantize_rows_i4 if self.storage_dtype == "int4"
                     else quantize_rows_i8)
            if pad_n != n:
                rows = np.concatenate(
                    [rows, np.repeat(rows[-1:], pad_n - n, axis=0)]
                )
            q8, qs = quant(
                jax.device_put(
                    np.ascontiguousarray(rows, dtype=Float),
                    self._replicated(),
                )
            )
            self.vectors = _scatter_rows(self.vectors, dev_idx, q8)
            self.vstore_scale = _scatter_1d(self.vstore_scale, dev_idx, qs)
        elif rows is not None:
            if pad_n != n:
                rows = np.concatenate([rows, np.repeat(rows[-1:], pad_n - n, axis=0)])
            dev_rows = jax.device_put(
                np.ascontiguousarray(
                    np.asarray(rows).astype(self._storage_np_dtype())
                ),
                self._replicated(),
            )
            self.vectors = _scatter_rows(self.vectors, dev_idx, dev_rows)
            if self.vectors_lp is not None:
                self.vectors_lp = _scatter_rows(
                    self.vectors_lp, dev_idx,
                    _cast_bf16(dev_rows),
                )
            if self.vectors_i8 is not None:
                from .ops.pallas_scan import quantize_rows_i8

                q_rows, q_scale = quantize_rows_i8(dev_rows)
                self.vectors_i8 = _scatter_rows(
                    self.vectors_i8, dev_idx, q_rows
                )
                self.vscale = _scatter_1d(self.vscale, dev_idx, q_scale)
            # i8c mirror: column scales are corpus-global, so a new row
            # can exceed an existing column max — drop the mirror and let
            # `ensure_i8c_mirror` requantize lazily at the next dispatch
            # that routes to it (no per-mutation cost on the default
            # routes).
            self.vectors_i8c = None
            self.cscale = None
        dev_act = jax.device_put(pad_act.astype(bool), self._replicated())
        self.active = _scatter_mask(self.active, dev_idx, dev_act)
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "scatter"

    def warm_scatter_path(self, bucket: int = 1024) -> None:
        """Pre-compile `scatter()`'s executables at this layout's shapes
        with IDENTITY writes on the live buffers (write back what is
        already stored), so the first real mutation pays execution cost
        only. `scatter` pads operands to `utils.scatter_bucket` sizes; on
        capacity stores that floors at 1024 rows, so ONE warm at the
        default bucket covers every epoch of up to 1024 changed rows.
        Called by the engine after capacity-tier (re)builds
        (PICOVDB_WARM_UPDATES gates it; see engine._maybe_warm_mutation_path).
        """
        if self.vectors is None:
            return
        rep = self._replicated()
        idx = jax.device_put(np.zeros(bucket, dtype=np.int32), rep)
        if self.storage_dtype in ("int8", "int4"):
            from .ops.pallas_scan import quantize_rows_i4, quantize_rows_i8

            quant = (quantize_rows_i4 if self.storage_dtype == "int4"
                     else quantize_rows_i8)
            # warm the on-device quantizer at the bucket shape; its output
            # is NOT scattered (quantizing zeros is not an identity write)
            q8, _ = quant(jax.device_put(
                np.zeros((bucket, self.dim), dtype=np.float32), rep
            ))
            q8.block_until_ready()
            del q8
            row0 = np.repeat(np.asarray(self.vectors[0:1]), bucket, axis=0)
            self.vectors = _scatter_rows(
                self.vectors, idx,
                jax.device_put(np.ascontiguousarray(row0), rep),
            )
            sc0 = np.repeat(np.asarray(self.vstore_scale[0:1]), bucket)
            self.vstore_scale = _scatter_1d(
                self.vstore_scale, idx, jax.device_put(sc0, rep)
            )
        else:
            row0 = np.repeat(np.asarray(self.vectors[0:1]), bucket, axis=0)
            dev_rows = jax.device_put(np.ascontiguousarray(row0), rep)
            self.vectors = _scatter_rows(self.vectors, idx, dev_rows)
            if self.vectors_lp is not None:
                self.vectors_lp = _scatter_rows(
                    self.vectors_lp, idx, _cast_bf16(dev_rows)
                )
            if self.vectors_i8 is not None:
                from .ops.pallas_scan import quantize_rows_i8

                # per-row quantization is deterministic, so requantizing
                # the stored row IS the stored mirror row — identity
                q_rows, q_scale = quantize_rows_i8(dev_rows)
                self.vectors_i8 = _scatter_rows(self.vectors_i8, idx, q_rows)
                self.vscale = _scatter_1d(self.vscale, idx, q_scale)
        act0 = np.repeat(np.asarray(self.active[0:1]), bucket).astype(bool)
        self.active = _scatter_mask(
            self.active, idx, jax.device_put(act0, rep)
        )
        jax.block_until_ready(self.active)

    # -- query -----------------------------------------------------------------

    @staticmethod
    def pack_results(vals, idxs):
        """Fuse (vals f32, idxs i32) into one (Q, 2k) int32 device buffer.

        The serving lanes fetch one array per chunk instead of two: the
        dev-harness relay (and any RPC-ish transport) charges a fixed
        per-transfer cost on top of bandwidth, so halving the transfer
        count trims wall time with identical bytes. Scores travel bitcast
        in the first k columns; `engine._unpack_fetch` restores them.
        """
        return _pack_vi(vals, idxs)

    # Rows per device gather in fetch_rows: bounds the (chunk, dim) f32
    # transient next to a capacity-tier resident corpus.
    FETCH_CHUNK_ROWS = 262_144

    def fetch_rows(self, idxs: np.ndarray) -> np.ndarray:
        """Batched dequantized float32 host rows by slot id.

        One device gather + one transfer per chunk instead of a per-row
        relay round trip — restores the reference getter's O(1)-per-row
        host cost (picovdb/pico_vdb.py:945) for device-born stores.
        Indices are padded to power-of-two buckets so repeated calls at
        varying sizes reuse a handful of gather specializations.

        The wire carries STORAGE-dtype bytes (packed int4 rows: 8x fewer
        bytes than f32; int8: 4x; bf16: 2x) and the dequant/unpack runs
        host-side — on slow host<->device links the transfer dominates
        the call (measured: an f32-wire get_all over 100k x 1024 int4
        cost 867 s in a degraded relay window, gather_ab_r5.log), and on
        fast links the host-side multiply is noise.
        """
        if self.vectors is None:
            raise RuntimeError("fetch_rows before any upload")
        idxs = np.asarray(idxs)
        m = idxs.shape[0]
        out = np.empty((m, self.dim), dtype=np.float32)
        step = self.FETCH_CHUNK_ROWS
        for s in range(0, m, step):
            e = min(m, s + step)
            chunk = np.ascontiguousarray(idxs[s:e], dtype=np.int32)
            pad = next_pow2(max(8, chunk.shape[0]))
            if pad != chunk.shape[0]:
                chunk = np.pad(chunk, (0, pad - chunk.shape[0]))
            ci = jax.device_put(chunk, self._replicated())
            raw = np.asarray(
                self._fetch_jit(_gather_rows_raw)(self.vectors, ci)
            )[: e - s]
            if self.vstore_scale is not None:
                scale = np.asarray(
                    self._fetch_jit(_gather_1d_raw)(self.vstore_scale, ci),
                    dtype=np.float32,
                )[: e - s]
            if self.storage_dtype == "int4":
                from .ops.pallas_scan import unpack_i4_np_into

                rows = np.empty((e - s, self.dim), dtype=np.float32)
                unpack_i4_np_into(raw, rows)
                rows *= scale[:, None]
            elif self.vstore_scale is not None:  # int8
                rows = raw.astype(np.float32)
                rows *= scale[:, None]
            else:  # float32 / bfloat16
                rows = np.asarray(raw, dtype=np.float32)
            out[s:e] = rows
        return out

    def _fetch_jit(self, fn):
        """Row-fetch jit, with the output pinned REPLICATED on mesh stores:
        under multi-process every host must be able to read the gathered
        rows locally (a compiler-chosen sharded output would not be fully
        addressable)."""
        if self.mesh is None:
            return fn
        cached = self._fetch_rep_jits.get(fn)
        if cached is None:
            cached = jax.jit(fn, out_shardings=self._replicated())
            self._fetch_rep_jits[fn] = cached
        return cached

    def iter_store_chunks(self, n: int, chunk: Optional[int] = None):
        """Yield the quantized corpus as host (packed_rows, scales) chunks.

        The quantized-persistence writer streams these straight into
        disk-backed memmaps (persistence.save_quantized_atomic), so a
        capacity-tier int8/int4 store checkpoints without ever holding
        more than one chunk of host memory — the f32 matrix the r4 save
        path materialized (engine._ensure_host_vectors) never exists.
        Chunks are fixed-size (last one short): two slice executables
        total, compile-cheap.
        """
        if self.vectors is None or self.vstore_scale is None:
            raise RuntimeError(
                "iter_store_chunks requires a quantized device store"
            )
        step = chunk or self.STREAM_CHUNK_ROWS
        for s in range(0, n, step):
            e = min(n, s + step)
            yield (
                np.asarray(self.vectors[s:e]),
                np.asarray(self.vstore_scale[s:e], dtype=np.float32),
            )

    def upload_prequantized(
        self, plane: np.ndarray, scales: np.ndarray, active_np: np.ndarray
    ) -> None:
        """Build the corpus from a pre-quantized host plane + per-row scales.

        Load-side counterpart of `iter_store_chunks`: `plane` is the
        (n, cols) int8 matrix ((n, dim//2) packed nibbles for int4),
        typically a read-only memmap of `<base>.vecs.q.npy` — chunks are
        scattered into a zero-initialized device buffer, so host RSS stays
        one chunk and the f32 corpus never exists on either side. Works on
        single-device and mesh stores (chunks upload replicated; GSPMD
        routes each row to its owner shard).
        """
        n = plane.shape[0]
        cols = self.dim // 2 if self.storage_dtype == "int4" else self.dim
        if self.storage_dtype not in ("int8", "int4"):
            raise ValueError(
                "upload_prequantized requires int8/int4 storage; "
                f"this store is {self.storage_dtype!r}"
            )
        if plane.ndim != 2 or plane.shape[1] != cols:
            raise ValueError(
                f"quantized plane has shape {plane.shape}; expected "
                f"(*, {cols}) for {self.storage_dtype} at dim {self.dim}"
            )
        if scales.shape[0] != n:
            raise ValueError(
                f"{scales.shape[0]} scales for {n} plane rows"
            )
        cap = self._cap_with_headroom(n)
        rep = self._replicated()
        buf = jax.device_put(
            jnp.zeros((cap, cols), dtype=jnp.int8), self._row_sharding()
        )
        sc = jax.device_put(
            jnp.zeros((cap,), dtype=jnp.float32), self._mask_sharding()
        )
        step = self.STREAM_CHUNK_ROWS
        for s in range(0, n, step):
            e = min(n, s + step)
            idx = jax.device_put(np.arange(s, e, dtype=np.int32), rep)
            buf = _scatter_rows(
                buf, idx,
                jax.device_put(
                    np.ascontiguousarray(plane[s:e], dtype=np.int8), rep
                ),
            )
            sc = _scatter_1d(
                sc, idx,
                jax.device_put(
                    np.ascontiguousarray(scales[s:e], dtype=np.float32), rep
                ),
            )
        self.vectors = buf
        self.vstore_scale = sc
        self.active = jax.device_put(
            _pad_rows(np.asarray(active_np, dtype=bool), cap),
            self._mask_sharding(),
        )
        self.cap = cap
        self._refresh_lp_mirror()
        self._mask_cache.clear()
        self._fview_cache.clear()
        self.last_sync_mode = "full"

    def snapshot(self):
        """Immutable handles to the current corpus arrays.

        jax.Arrays are immutable, so holding these gives snapshot isolation
        even if a concurrent writer swaps the mirror afterwards. Callers
        that re-dispatch after releasing the engine lock (the segmax
        underfill retry) MUST query through these captured handles — going
        back to `self.vectors` would pair a new mirror with result
        bookkeeping (docs/ids) captured against the old one.
        """
        return (self.vectors, self.active, self.vstore_scale)

    def query_exact_snapshot(self, snap, qnorm, k):
        """Exact masked top-k against a captured `snapshot()`.

        Blocking; returns host (vals, idxs) of (Q, min(k, cap)). Used by
        the segmax underfill retry so the re-dispatch sees exactly the
        arrays the original dispatch saw (round-2 review item 6).
        """
        vectors, active, vscale = snap
        num_q = qnorm.shape[0]
        if isinstance(qnorm, np.ndarray):
            q_dev = jax.device_put(
                np.ascontiguousarray(qnorm, dtype=Float), self._replicated()
            )
        else:
            q_dev = qnorm
            if q_dev.dtype != jnp.float32:
                q_dev = q_dev.astype(jnp.float32)
        k_eff = min(k, vectors.shape[0])
        if vscale is not None and vectors.shape[1] != self.dim:
            # packed int4 snapshot (the (cap, dim//2) byte layout)
            if (self.mesh is None
                    and getattr(self._device, "platform", "cpu") == "tpu"):
                from .ops.pallas_scan import make_fused_topk_i4

                if num_q > 256 and num_q % 256:
                    pad = -(-num_q // 256) * 256 - num_q
                    q_dev = jnp.pad(q_dev, ((0, pad), (0, 0)))
                fn4 = make_fused_topk_i4(k_eff)
                vals, idxs = fn4(q_dev, vectors, vscale, active)
            else:
                from .ops.exact import make_exact_topk_i4r

                fn4 = make_exact_topk_i4r(k_eff)
                vals, idxs = fn4(q_dev, vectors, vscale, active)
        elif vscale is not None:  # int8 storage snapshot
            if (self.mesh is None
                    and getattr(self._device, "platform", "cpu") == "tpu"
                    and k_eff + 4 <= 1024):
                # single-device only: the Pallas ladder cannot run over a
                # row-sharded snapshot under plain jit; mesh snapshots use
                # the XLA i8r scan below, which GSPMD partitions.
                # stream via the int8 ladder: the XLA fallback's (Q, cap)
                # f32 score matrix OOMs near the capacity ceiling (e.g.
                # a 2048-query chunk over 12.58M rows would need ~100 GB)
                from .ops.pallas_scan import make_fused_topk_i8

                if num_q > 256 and num_q % 256:
                    # ladder query tiles are 256-wide past one tile; pad
                    # with zero rows (they normalize to e0, sliced off)
                    pad = -(-num_q // 256) * 256 - num_q
                    q_dev = jnp.pad(q_dev, ((0, pad), (0, 0)))
                fn8 = make_fused_topk_i8(k_eff, rescore_dequant=True,
                                         tie_scale=0.0)
                vals, idxs = fn8(q_dev, vectors, vscale, vectors, active)
            else:
                from .ops.exact import make_exact_topk_i8r

                fn8 = make_exact_topk_i8r(k_eff)
                vals, idxs = fn8(q_dev, vectors, vscale, active)
        elif (self.mesh is None
                and getattr(self._device, "platform", "cpu") == "tpu"
                and k_eff + 4 <= 1024
                and vectors.shape[0] % 256 == 0):
            # f32/bf16 snapshot on a single TPU: stream via the fused
            # Pallas scan like the int8/int4 branches above — the XLA
            # exact fallback materializes a (Q, cap) f32 score matrix,
            # which OOMs at capacity tiers (a 2048-query retry chunk
            # over 1.5M rows is ~12.9 GB next to the resident corpus),
            # crashing the very query the underfill retry exists to
            # save (r5 review finding).
            from .ops.pallas_scan import make_fused_topk

            if num_q > 256 and num_q % 256:
                pad = -(-num_q // 256) * 256 - num_q
                q_dev = jnp.pad(q_dev, ((0, pad), (0, 0)))
            fnf = make_fused_topk(k_eff, self.compute_dtype)
            vals, idxs = fnf(q_dev, vectors, active)
        else:
            fn = make_exact_topk(k_eff, self.compute_dtype)
            vals, idxs = fn(q_dev, vectors, active)
        return np.asarray(vals)[:num_q], np.asarray(idxs)[:num_q]

    def query(
        self,
        qnorm: np.ndarray,
        k: int,
        filter_mask: Optional[np.ndarray] = None,
        force_exact: bool = False,
        mask_key=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Masked top-k over the device corpus (blocking).

        Args:
          qnorm: (Q, dim) float32 normalized queries (host).
          k: requested candidates per query (clamped to capacity).
          filter_mask: optional (size,) bool host mask (already ANDed with
            active by the caller); None means "all active rows".

        Returns (values, indices) as host NumPy, shapes (Q, k); padding
        entries (fewer than k candidates) carry -inf values.
        """
        vals, idxs, num_q, k_eff = self.query_async(
            qnorm, k, filter_mask, force_exact=force_exact, mask_key=mask_key
        )
        from .utils import pack_fetch_enabled

        if pack_fetch_enabled():
            # One host fetch instead of two: the relay charges a fixed
            # per-transfer cost, which dominates at single-query sizes.
            buf = np.asarray(_pack_vi(vals, idxs))
            vals = np.ascontiguousarray(
                buf[:num_q, :k_eff]).view(np.float32)
            idxs = np.ascontiguousarray(buf[:num_q, k_eff: 2 * k_eff])
            return vals, idxs
        vals = np.asarray(vals)[:num_q, :k_eff]
        idxs = np.asarray(idxs)[:num_q, :k_eff]
        return vals, idxs

    def query_async(
        self,
        qnorm: np.ndarray,
        k: int,
        filter_mask: Optional[np.ndarray] = None,
        force_exact: bool = False,
        mask_key=None,
    ):
        """Dispatch a masked top-k; returns device arrays without blocking.

        Returns (vals_dev, idxs_dev, num_q, k_eff): callers slice
        `np.asarray(...)[:num_q, :k_eff]` when they need the results, letting
        throughput paths pipeline several dispatches ahead of host fetches
        (hides host<->device round-trip latency).

        `qnorm` may be raw (normalization happens on device, fused into the
        scan) and may already be a device-resident jax.Array — the serving
        path for query embeddings produced by an upstream on-TPU model — in
        which case no host->device transfer happens at all.
        """
        if self.vectors is None or self.cap == 0:
            raise RuntimeError("query before any upload")
        num_q = qnorm.shape[0]
        # int8 STORAGE routing (see full_upload): segmax over the int8
        # corpus for large unfiltered batches, the int8 ladder for small
        # ones, the int8 XLA scan otherwise — all with dequant rescore.
        i8s = self.storage_dtype == "int8"
        # int4 STORAGE: every route goes through the packed ladder (TPU)
        # or the unpacking XLA scan (CPU / wide k inside the kernel's own
        # fallback) — there is no segmax tier; at the capacities the tier
        # exists for, every batch is sweep-bound anyway.
        i4s = self.storage_dtype == "int4"
        i8s_segmax = (
            i8s
            and not force_exact
            and filter_mask is None
            and self.scan_mode in ("auto", "mixed")
            and min(k, self.cap) <= self.SEGMAX_MAX_K
            and self.cap >= self.SEGMAX_MIN_CAP
            and (num_q > self.SMALL_Q_XLA or self.scan_mode == "mixed")
        )
        i8s_smallq = (
            i8s
            and not i8s_segmax
            and not force_exact
            and filter_mask is None
            and self.scan_mode == "auto"
            and num_q <= self.SMALL_Q_XLA
            and min(k, self.cap) + 4 <= 16
        )
        # Query padding buckets the jit cache (pow2) and aligns the fused
        # kernel's query tiles. Small batches routed to the XLA scan skip
        # it entirely: the matmul handles any Q, and on the serving path
        # every eager device op saved (pad, cast) is ~0.1-0.2 ms of host
        # dispatch through the relay per query.
        # Mixed-precision segmax tier: the default TPU serving path for
        # moderate k, unfiltered queries over large corpora. Small k keeps
        # the per-segment top-2 assumption safe (see ops/pallas_scan.py
        # segmax notes); filtered queries go exact — a narrow filter can
        # cluster all candidates into one 128-row segment, the same reason
        # the reference skips FAISS under filters (pico_vdb.py:667-668).
        # Callers that spot -inf underfill in a segmax result re-dispatch
        # with force_exact (engine safety net for clustered active sets).
        use_segmax = (
            (
                self.vectors_lp is not None
                or (self.segmax_i8 and self.vectors_i8 is not None)
                or (self.segmax_i8c and self._i8c_budget_ok)
            )
            and not force_exact
            and filter_mask is None
            and self.scan_mode in ("auto", "mixed")
            and min(k, self.cap) <= self.SEGMAX_MAX_K
            and self.cap >= self.SEGMAX_MIN_CAP
            # tiny batches are per-tile-overhead-bound in any pallas sweep
            # (measured 1.36 ms segmax vs 1.0 ms XLA at Q=1, 100k x 1024);
            # scan_mode="mixed" forces segmax regardless for testing
            and (num_q > self.SMALL_Q_XLA or self.scan_mode == "mixed")
        )
        # Filtered big batches: gather the surviving rows into a dense
        # compacted view (cached per filter spec) and ride the segmax tier
        # over it. Compaction is what makes this SOUND where full-corpus
        # segmax under a filter is not: a clustered filter can pack many
        # true winners into one 128-row segment of the full corpus, but the
        # compacted survivors land uniformly across the view's segments, so
        # the per-segment top-2 bound is exactly the unfiltered one at n_f
        # rows (VERDICT r3 #8; the reference skips FAISS under filters
        # entirely, pico_vdb.py:667-668). tie_scale=0 like the filtered
        # ladder: the engine's snapshot retry is unfiltered-only.
        fview = None
        if (
            filter_mask is not None
            and mask_key is not None
            and not force_exact
            and self.mesh is None
            and self.vectors_lp is not None
            and self.scan_mode in ("auto", "mixed")
            and min(k, self.cap) <= self.SEGMAX_MAX_K
            and num_q > self.SMALL_Q_XLA
        ):
            fview = self._filter_view(mask_key, filter_mask)
        # Small unfiltered batches are pure HBM-bandwidth-bound, so the
        # narrowest mirror wins. Preference order: int8 (1 B/elem, the
        # latency tier) > bf16 (2 B/elem) > XLA f32. Selection noise is
        # absorbed by the guard + exact f32 rescore in both cases.
        small_q_i8c = (
            self.smallq_i8c
            and self._i8c_budget_ok
            and not force_exact
            and filter_mask is None
            and self.scan_mode == "auto"
            and num_q <= self.SMALL_Q_XLA
            and min(k, self.cap) + 6 <= 16  # guard 6 inside the wide ladder
        )
        small_q_i8 = (
            not small_q_i8c
            and self.vectors_i8 is not None
            and not force_exact
            and filter_mask is None
            and self.scan_mode == "auto"
            and num_q <= self.SMALL_Q_XLA
            and min(k, self.cap) + 4 <= 16  # guard 4 inside the wide ladder
        )
        small_q_mixed = (
            not small_q_i8
            and not small_q_i8c
            and self.vectors_lp is not None
            and not force_exact
            and filter_mask is None
            and self.scan_mode == "auto"
            and num_q <= self.SMALL_Q_XLA
            and min(k, self.cap) + 4 <= 16  # keep the ladder unrolled/wide
        )
        small_q_xla = (
            self.mesh is None
            and not i8s
            and not i4s
            and self.scan_mode == "auto"
            and not use_segmax
            and not small_q_i8
            and not small_q_i8c
            and not small_q_mixed
            and num_q <= self.SMALL_Q_XLA
        )
        q_pad = (
            num_q if (small_q_xla or small_q_mixed or small_q_i8
                      or small_q_i8c or i8s_smallq
                      or ((i8s or i4s) and not i8s_segmax
                          and num_q <= self.SMALL_Q_XLA))
            else max(MIN_QUERY_PAD, next_pow2(num_q))
        )
        if (use_segmax or i8s_segmax or fview is not None) and q_pad % 128:
            # Q a multiple of 128 keeps the slab top-k in the Pallas
            # kernel (topk_packed_keys); the lax.top_k fallback sorts the
            # whole (Q, C) candidate slab — at the capacity ceiling its
            # workspace OOMs (measured at Q=64 over 12.58M rows), and it
            # costs 8-9 ms at serving sizes anyway.
            q_pad = max(128, q_pad)
        if isinstance(qnorm, np.ndarray):
            if qnorm.dtype != Float and qnorm.dtype.itemsize > 2:
                qnorm = np.ascontiguousarray(qnorm, dtype=Float)
            if q_pad != num_q:
                padq = np.zeros((q_pad, self.dim), dtype=qnorm.dtype)
                padq[:num_q] = qnorm
                qnorm = padq
            q_dev = jax.device_put(
                np.ascontiguousarray(qnorm), self._replicated()
            )
            if q_dev.dtype != jnp.float32:
                # compact query wire (engine._wire_encode): half the
                # upload bytes, one cached widening op on device —
                # ranking is unchanged because queries L2-normalize on
                # device after the cast
                q_dev = q_dev.astype(jnp.float32)
        else:
            q_dev = qnorm
            if q_dev.dtype != jnp.float32:
                q_dev = q_dev.astype(jnp.float32)
            if q_pad != num_q:
                q_dev = jnp.pad(q_dev, ((0, q_pad - num_q), (0, 0)))
            if self.mesh is not None:
                q_dev = jax.device_put(q_dev, self._replicated())

        if filter_mask is None:
            mask_dev = self.active
        elif fview is not None:
            # the compacted view carries its own dense active mask; the
            # full-corpus filter mask never ships
            mask_dev = None
        elif mask_key is not None and mask_key in self._mask_cache:
            mask_dev = self._mask_cache[mask_key]
        else:
            m = _pad_rows(np.ascontiguousarray(filter_mask, dtype=bool), self.cap)
            mask_dev = jax.device_put(m, self._mask_sharding())
            if mask_key is not None:
                if len(self._mask_cache) >= self.MASK_CACHE_MAX:
                    # concurrent readers may evict the same entry; dict ops
                    # are GIL-atomic but the oldest key may already be gone
                    try:
                        self._mask_cache.pop(
                            next(iter(self._mask_cache)), None
                        )
                    except (StopIteration, RuntimeError):
                        pass
                self._mask_cache[mask_key] = mask_dev

        # Dispatch with the exact k: the fused kernel's selection cost is
        # linear in k (2 VPU passes per rank), so pow2 bucketing would cost
        # up to ~60% extra selection work for a marginally smaller jit cache.
        k_eff = min(k, self.cap)
        k_pad = k_eff

        # Off-TPU there is no Mosaic compiler: kernel paths explicitly
        # requested there (scan_mode="fused" / use_pallas with a mesh) run
        # in Pallas interpret mode — same code path, CPU-testable.
        interpret = (
            getattr(self._device, "platform", "cpu") != "tpu"
        )
        if self.mesh is not None:
            from .parallel.sharded_query import make_sharded_topk

            use_pallas = self.use_pallas or self.scan_mode == "fused"
            if self.storage_dtype in ("int8", "int4"):
                i4m = self.storage_dtype == "int4"
                s8_fn = make_sharded_topk(
                    self.mesh,
                    self.shard_axis,
                    k_pad,
                    None,
                    use_pallas=use_pallas,
                    interpret=use_pallas and interpret,
                    storage_i8=not i4m,
                    storage_i4=i4m,
                )
                vs = self.vstore_scale
                fn = lambda q, v, m: s8_fn(q, v, vs, m)  # noqa: E731
                stor = "i4stor" if i4m else "i8stor"
                self.last_strategy = (
                    f"sharded_scan_{stor}_pallas" if use_pallas
                    else f"sharded_scan_{stor}"
                )
            else:
                fn = make_sharded_topk(
                    self.mesh,
                    self.shard_axis,
                    k_pad,
                    self.compute_dtype,
                    use_pallas=use_pallas,
                    interpret=use_pallas and interpret,
                )
                self.last_strategy = (
                    "sharded_scan_pallas" if use_pallas else "sharded_scan"
                )
        elif i8s_segmax:
            from .ops.pallas_scan import make_segmax_topk_i8

            stream = (q_pad > 256 if self.segmax_stream is None
                      else self.segmax_stream)
            # tie_scale=0: for int8 STORAGE the crowding mark has no
            # higher-precision tier to retry into — the "exact" fallback
            # ranks the same quantized scores — so marking would only
            # drop legitimate storage-precision hits (fuzz-soak find).
            # Segmax underfill (-inf from per-segment truncation) still
            # triggers the engine retry as usual.
            s8s_fn = make_segmax_topk_i8(k_pad, interpret=interpret,
                                         stream=stream,
                                         rescore_dequant=True,
                                         tie_scale=0.0)
            v8, vs = self.vectors, self.vstore_scale
            fn = lambda q, v, m: s8s_fn(q, v8, vs, v8, m)  # noqa: E731
            self.last_strategy = (
                "segmax_i8stor_stream" if stream else "segmax_i8stor"
            )
        elif i8s_smallq:
            from .ops.pallas_scan import make_fused_topk_i8

            f8s_fn = make_fused_topk_i8(k_pad, interpret=interpret,
                                        rescore_dequant=True,
                                        tie_scale=0.0)  # see i8s_segmax
            v8, vs = self.vectors, self.vstore_scale
            fn = lambda q, v, m: f8s_fn(q, v8, vs, v8, m)  # noqa: E731
            self.last_strategy = "i8stor_fused_smallq"
        elif i8s and self.use_pallas and min(k, self.cap) + 4 <= 1024:
            # exact/filtered fallback ON TPU: the int8 ladder streams the
            # corpus (exact selection, filter mask honored) instead of
            # materializing a (Q, cap) score matrix — at the capacity
            # ceiling (12.58M rows = 12.9 GB corpus) the XLA fallback's
            # score matrix OOMs from Q=32 up. tie_scale=0 on retries so a
            # crowding re-mark cannot leak -inf into assembly.
            from .ops.pallas_scan import make_fused_topk_i8

            l8_fn = make_fused_topk_i8(
                k_pad, interpret=interpret, rescore_dequant=True,
                tie_scale=0.0,  # see i8s_segmax: no higher tier exists
            )
            v8, vs = self.vectors, self.vstore_scale
            fn = lambda q, v, m: l8_fn(q, v8, vs, v8, m)  # noqa: E731
            self.last_strategy = "i8stor_fused_exact"
        elif i8s:
            from .ops.exact import make_exact_topk_i8r

            x8_fn = make_exact_topk_i8r(k_pad)
            vs = self.vstore_scale
            fn = lambda q, v, m: x8_fn(q, v, vs, m)  # noqa: E731
            self.last_strategy = "i8stor_xla"
        elif i4s and self.use_pallas:
            # packed int4 ladder: exact selection over the quantized
            # scores, filter mask honored, streaming (never materializes
            # the unpacked corpus); k beyond the VMEM block falls back to
            # the dense XLA scan inside fused_topk_i4.
            from .ops.pallas_scan import make_fused_topk_i4

            f4_fn = make_fused_topk_i4(k_pad, interpret=interpret)
            v4, vs = self.vectors, self.vstore_scale
            fn = lambda q, v, m: f4_fn(q, v4, vs, m)  # noqa: E731
            self.last_strategy = "i4stor_fused"
        elif i4s:
            from .ops.exact import make_exact_topk_i4r

            x4_fn = make_exact_topk_i4r(k_pad)
            vs = self.vstore_scale
            fn = lambda q, v, m: x4_fn(q, v, vs, m)  # noqa: E731
            self.last_strategy = "i4stor_xla"
        elif fview is not None:
            from .ops.pallas_scan import make_segmax_topk

            slots_v, scan_v, act_v = fview
            stream = (q_pad > 256 if self.segmax_stream is None
                      else self.segmax_stream)
            # tie_scale=0: see mixed_fused_batch_filtered — the engine's
            # snapshot retry re-serves UNFILTERED, so filtered results
            # must never carry a retry mark. slot_map translates view
            # candidates to global slots before the exact f32 rescore
            # against the full corpus (no f32 view copy in HBM).
            segv_fn = make_segmax_topk(k_pad, None, interpret=interpret,
                                       stream=stream, tie_scale=0.0,
                                       slot_map=True)
            f32 = self.vectors
            fn = (lambda q, v, m:
                  segv_fn(q, scan_v, f32, act_v, slots_v))  # noqa: E731
            self.last_strategy = (
                "fview_segmax_stream" if stream else "fview_segmax"
            )
        elif use_segmax and self.segmax_i8c and self.ensure_i8c_mirror():
            from .ops.pallas_scan import make_segmax_topk_i8c

            stream = (q_pad > 256 if self.segmax_stream is None
                      else self.segmax_stream)
            seg8c_fn = make_segmax_topk_i8c(k_pad, interpret=interpret,
                                            stream=stream)
            v8c, cs, f32 = self.vectors_i8c, self.cscale, self.vectors
            fn = lambda q, v, m: seg8c_fn(q, v8c, cs, f32, m)  # noqa: E731
            self.last_strategy = (
                "segmax_i8c_stream" if stream else "segmax_i8c"
            )
        elif use_segmax and self.segmax_i8 and self.vectors_i8 is not None:
            from .ops.pallas_scan import make_segmax_topk_i8

            stream = (q_pad > 256 if self.segmax_stream is None
                      else self.segmax_stream)
            seg8_fn = make_segmax_topk_i8(k_pad, interpret=interpret,
                                          stream=stream)
            v8, vs, f32 = self.vectors_i8, self.vscale, self.vectors
            fn = lambda q, v, m: seg8_fn(q, v8, vs, f32, m)  # noqa: E731
            self.last_strategy = (
                "segmax_i8_stream" if stream else "segmax_i8"
            )
        elif use_segmax:
            from .ops.pallas_scan import make_segmax_topk

            # auto: the corpus-resident order wins from the 2nd query tile
            # up (query re-reads cost <= 1/8th of the corpus re-reads they
            # replace at qt=256/bn=2048; measured A/B in
            # bench/results/segmax_stream_r3.json).
            stream = (q_pad > 256 if self.segmax_stream is None
                      else self.segmax_stream)
            seg_fn = make_segmax_topk(k_pad, None, interpret=interpret,
                                      stream=stream)
            lp = self.vectors_lp
            f32 = self.vectors
            fn = lambda q, v, m: seg_fn(q, lp, f32, m)  # noqa: E731
            self.last_strategy = (
                "segmax_mixed_stream" if stream else "segmax_mixed"
            )
        elif small_q_i8c and self.ensure_i8c_mirror():
            from .ops.pallas_scan import make_fused_topk_i8c

            i8c_fn = make_fused_topk_i8c(k_pad, interpret=interpret)
            v8c, cs, f32 = self.vectors_i8c, self.cscale, self.vectors
            fn = lambda q, v, m: i8c_fn(q, v8c, cs, f32, m)  # noqa: E731
            self.last_strategy = "i8c_fused_smallq"
        elif small_q_i8:
            from .ops.pallas_scan import make_fused_topk_i8

            i8_fn = make_fused_topk_i8(k_pad, interpret=interpret)
            v8, vs, f32 = self.vectors_i8, self.vscale, self.vectors
            fn = lambda q, v, m: i8_fn(q, v8, vs, f32, m)  # noqa: E731
            self.last_strategy = "i8_fused_smallq"
        elif small_q_mixed:
            from .ops.pallas_scan import make_mixed_fused_topk

            mf_fn = make_mixed_fused_topk(k_pad, interpret=interpret)
            lp = self.vectors_lp
            f32 = self.vectors
            fn = lambda q, v, m: mf_fn(q, lp, f32, m)  # noqa: E731
            self.last_strategy = "mixed_fused_smallq"
        elif self.scan_mode == "approx":
            from .ops.exact import make_approx_topk

            fn = make_approx_topk(k_pad, self.compute_dtype)
            self.last_strategy = "xla_approx"
        elif (
            self.scan_mode == "auto"
            and self.use_pallas
            and not small_q_xla
            and not force_exact
            and self.vectors_lp is not None
        ):
            # Batches that segmax declined (filtered queries, or k past
            # SEGMAX_MAX_K) still get the bf16 mirror: the exact selection
            # LADDER has no per-segment truncation, so it is safe under
            # any candidate clustering a filter can produce — the reason
            # segmax must skip filters does not apply. Half the sweep DMA
            # of the f32 fused route; winners exact-f32-rescored as
            # always. (The filter mask ANDs into the kernel mask.)
            from .ops.pallas_scan import make_mixed_fused_topk

            # The crowding mark is only applied UNFILTERED: the engine's
            # snapshot retry re-serves against (vectors, active) without
            # the filter mask, so a marked filtered chunk would retry into
            # the wrong candidate set. Filtered batches therefore serve
            # ladder-selected bf16 results unmarked (selection is exact
            # over bf16 scores; only sub-rms near-ties can mis-rank).
            mfb_fn = make_mixed_fused_topk(
                k_pad, interpret=interpret,
                tie_scale=0.0 if (filter_mask is not None or force_exact)
                else None,
            )
            lp = self.vectors_lp
            f32 = self.vectors
            fn = lambda q, v, m: mfb_fn(q, lp, f32, m)  # noqa: E731
            self.last_strategy = (
                "mixed_fused_batch_filtered" if filter_mask is not None
                else "mixed_fused_batch"
            )
        elif (
            self.scan_mode == "fused"
            or (self.scan_mode == "auto" and self.use_pallas
                and not small_q_xla)
        ):
            from .ops.pallas_scan import make_fused_topk

            # Under bf16 storage the rescore itself reads bf16 rows, so
            # recall floors at ~0.994 regardless of guard width (measured:
            # guard 4 vs 16 identical recall, 2.3x slower) — keep guard=4.
            fn = make_fused_topk(k_pad, self.compute_dtype,
                                 interpret=interpret)
            self.last_strategy = "pallas_fused"
        else:
            fn = make_exact_topk(k_pad, self.compute_dtype)
            self.last_strategy = "xla_topk"
        vals, idxs = fn(q_dev, self.vectors, mask_dev)

        return vals, idxs, num_q, k_eff

    def query_serial_loop(self, queries, k: int):
        """Run M independent Q=1 queries serially inside ONE device program.

        `lax.scan` serializes the iterations on the device, each sweeping
        the full corpus from HBM through the same kernel the production
        small-Q route dispatches (int8 mirror when present, else the bf16
        ladder, else the XLA exact scan). One launch amortizes per-dispatch
        host/driver overhead across all M queries, so the marginal cost per
        additional query — the slope of wall time vs M — is the device-side
        single-query serving latency, free of host and transport noise
        (bench/q1_anatomy.py measures the methodology; bench.py reports it
        as `single_query_device_ms` against the reference's 0.4 ms FAISS
        HNSW number, /root/reference/README.md:75).

        `queries` is an (M, dim) float32 array (host or device); rows are
        normalized on device like every query path. Returns host
        ((M, k) f32 exact scores, (M, k) int32 slot ids). Single-device
        stores only.
        """
        if self.mesh is not None:
            raise ValueError("query_serial_loop is single-device only")
        if self.vectors is None:
            raise ValueError(
                "empty device mirror; sync first (or use "
                "PicoVectorDB.query_serial_loop, which does)"
            )
        k_eff = min(k, self.cap)
        interpret = getattr(self._device, "platform", "cpu") != "tpu"
        if self.storage_dtype == "int8" and k_eff + 4 <= 16:
            from .ops.pallas_scan import make_fused_topk_i8

            inner = make_fused_topk_i8(k_eff, interpret=interpret,
                                       rescore_dequant=True,
                                       tie_scale=0.0)
            args = (self.vectors, self.vstore_scale, self.vectors,
                    self.active)
            self.last_strategy = "i8stor_fused_smallq_loop"
        elif (self.smallq_i8c and k_eff + 6 <= 16
                and self.ensure_i8c_mirror()):
            from .ops.pallas_scan import make_fused_topk_i8c

            inner = make_fused_topk_i8c(k_eff, interpret=interpret)
            args = (self.vectors_i8c, self.cscale, self.vectors, self.active)
            self.last_strategy = "i8c_fused_smallq_loop"
        elif self.vectors_i8 is not None and k_eff + 4 <= 16:
            from .ops.pallas_scan import make_fused_topk_i8

            # tie_scale=0: this is the latency-measurement primitive — no
            # engine retry wraps it, so a crowding mark would surface raw
            # -inf scores to callers instead of triggering an exact
            # re-serve (review finding). Callers needing the guard use
            # the dispatch path (engine.query).
            inner = make_fused_topk_i8(k_eff, interpret=interpret,
                                       tie_scale=0.0)
            args = (self.vectors_i8, self.vscale, self.vectors, self.active)
            self.last_strategy = "i8_fused_smallq_loop"
        elif self.vectors_lp is not None and k_eff + 4 <= 16:
            from .ops.pallas_scan import make_mixed_fused_topk

            inner = make_mixed_fused_topk(k_eff, interpret=interpret,
                                          tie_scale=0.0)  # see above
            args = (self.vectors_lp, self.vectors, self.active)
            self.last_strategy = "mixed_fused_smallq_loop"
        elif self.storage_dtype == "int4" and self.use_pallas:
            from .ops.pallas_scan import make_fused_topk_i4

            inner = make_fused_topk_i4(k_eff, interpret=interpret)
            args = (self.vectors, self.vstore_scale, self.active)
            self.last_strategy = "i4stor_fused_loop"
        elif self.storage_dtype == "int4":
            from .ops.exact import make_exact_topk_i4r

            inner = make_exact_topk_i4r(k_eff)
            args = (self.vectors, self.vstore_scale, self.active)
            self.last_strategy = "i4stor_xla_loop"
        elif self.storage_dtype == "int8":
            from .ops.exact import make_exact_topk_i8r

            inner = make_exact_topk_i8r(k_eff)
            args = (self.vectors, self.vstore_scale, self.active)
            self.last_strategy = "i8stor_xla_loop"
        else:
            inner = make_exact_topk(k_eff, self.compute_dtype)
            args = (self.vectors, self.active)
            self.last_strategy = "xla_topk_loop"

        loop = _make_serial_loop(inner)

        if isinstance(queries, np.ndarray):
            queries = jax.device_put(
                np.ascontiguousarray(queries, dtype=Float), self._device
            )
        vals, idxs = loop(queries, *args)
        return np.asarray(vals), np.asarray(idxs)
