"""Grouped SQ8 exact scan — the capacity tier without a rerank gather.

Reference analog: faiss-style IVF + scalar quantizer (the reference's
capacity path is IVFPQ ADC + an exact rerank that re-reads raw vectors,
gamma_index_ivfpq.cc:642-697).  On TPU the rerank's random row gather is
the wall: fetching ~100 raw rows per query costs ~0.9 us PER ROW no
matter how it is issued (XLA gather, Pallas multi-DMA — both measured
~95 ms for 102k rows on v5e), capping the ADC+rerank pipeline at
~10k QPS.  The fix is to not gather rows at all: store an int8
per-dimension scalar quantization of each vector IN SLOT ORDER inside
the inverted lists (d bytes/row next to the M-byte PQ codes) and compute
near-exact distances directly in the grouped scan:

    x_d  ~  off_d + scale_d * c_d                    (c = u8 code)
    q.x  =  (q*scale).c  +  q.off                    (one MXU matmul)
    ||q - x||^2 = ||q||^2 - 2 q.x + ||x||^2

The kernel reuses the query-grouping of ops/pallas_gadc.py (queries
probing the same list share one code-tile DMA) but replaces the
LUT+one-hot ADC with a single [Q, d] x [d, TILE] matmul per tile — 32x
fewer FLOPs than the one-hot expansion, 4x the DMA of M=32 PQ codes
(still trivially HBM-bound-free), and the exact ||x||^2 is a stored
f32 per slot (computed from the DEQUANTIZED point at encode time, so
the scanned distance is the exact distance to the quantized point —
the same contract as the dense reconstruction scan).

Accuracy: int8 codes are exact in bf16; the only rounding is the
(q*scale) bf16 cast, giving ~2^-9 relative error on the cross term —
the same precision class as the dense bf16 mirror scan (0.997
recall@10 at the bench geometry).  Distances come out near-exact, so
top-k is selected directly from the scan: no recall_num, no rerank.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamma_tpu.ops.pallas_gadc import (build_groups, default_q_pad,
                                       group_bound, _round_up)


def train_sq(x: jnp.ndarray, eps: float = 1e-8
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-dimension affine range fit over a train set → (scale[d],
    off[d]) f32 with x ~ off + scale * c, c in [0, 255].

    Pass RESIDUALS (x - coarse centroid) for the residual coding used by
    the capacity tier: the residual range is ~5-10x smaller than the
    global range, shrinking quantization noise ~25-100x — measured
    recall@10 ceiling 0.979 (global) vs >0.99 (residual) at the 1M
    bench geometry."""
    xf = x.astype(jnp.float32)
    # clip the fit range at the 0.05/99.95 percentiles: a min/max fit
    # lets a handful of outlier rows inflate the step for EVERY row
    # (measured: ~2x wider steps on the bench residuals → the bulk of
    # the no-rerank tier's recall loss).  Rows outside the clipped
    # range clamp in encode_sq — rare, and their norms stay exact, so
    # only their own distances blur.
    lo = jnp.percentile(xf, 0.05, axis=0)
    hi = jnp.percentile(xf, 99.95, axis=0)
    scale = jnp.maximum(hi - lo, eps) / 255.0
    return scale, lo


@functools.partial(jax.jit, static_argnames=("d_pad", "residual"))
def encode_sq(x: jnp.ndarray, scale: jnp.ndarray, off: jnp.ndarray,
              coarse: Optional[jnp.ndarray] = None,
              *, d_pad: int, residual: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (codes [n, d_pad] u8, norms [n] f32).  With residual=True,
    `coarse` is the per-row coarse centroid and the CODE quantizes
    x - coarse; norms are always the exact ||dequant-point||^2 of the
    FULL point so scan distances are exact distances to the quantized
    point.  Padding dims encode as 0 with scale 1 / off 0 → they
    contribute nothing."""
    xf = x.astype(jnp.float32)
    base = coarse.astype(jnp.float32) if residual else 0.0
    r = xf - base
    c = jnp.clip(jnp.round((r - off[None, :]) / scale[None, :]),
                 0.0, 255.0)
    deq = base + off[None, :] + scale[None, :] * c
    norms = jnp.sum(deq * deq, axis=-1)
    codes = c.astype(jnp.uint8)
    d = codes.shape[1]
    if d != d_pad:
        codes = jnp.pad(codes, ((0, 0), (0, d_pad - d)))
    return codes, norms


def _rows_as(c: jnp.ndarray, precise: bool) -> jnp.ndarray:
    """Row tile → the matmul operand dtype.  u8 SQ codes go through i32
    (Mosaic has no direct u8→float cast; codes ≤ 255 are exact either
    way); bf16 payload rows (the IVFFlat grouped path) are used as-is
    unless precise demands f32."""
    ct = jnp.float32 if precise else jnp.bfloat16
    if c.dtype == jnp.uint8:
        c = c.astype(jnp.int32)
    return c.astype(ct)


def _gsq_kernel(glist_ref, ntiles_ref,           # scalar prefetch
                codes_ref,                       # [1, TILE, d] u8
                nrm_ref,                         # [1, 1, TILE] f32
                qs_ref,                          # [1, Q, d] bf16/f32
                out_ref,                         # [1, Q, TILE] f32
                *, alpha: float, with_norms: bool, precise: bool,
                masked: bool = False):
    g = pl.program_id(0)
    t = pl.program_id(1)
    nt = ntiles_ref[g]

    @pl.when(t < nt)
    def _scan():
        c = _rows_as(codes_ref[0], precise)              # [TILE, d]
        ip = jax.lax.dot_general(
            qs_ref[0], c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Q, TILE]
        if with_norms:
            out_ref[0] = nrm_ref[0] - alpha * ip
        else:
            out_ref[0] = -alpha * ip

    @pl.when(t >= nt)
    def _skip():
        if masked:
            # the norms operand carries the per-slot mask bias: a
            # skipped tile is entirely beyond the list's live length,
            # so its (norms + bias) row is BIG everywhere — emit it
            out_ref[0] = jnp.broadcast_to(nrm_ref[0], out_ref.shape[1:])
        else:
            # skipped tiles must stay finite: the caller's in-length
            # mask ADDS BIG, and garbage/NaN would survive the add
            out_ref[0] = jnp.zeros_like(out_ref[0])


def _gsq_fold_kernel(glist_ref, ntiles_ref,      # scalar prefetch
                     codes_ref,                  # [1, TILE, d] u8
                     nrm_ref,                    # [1, 1, TILE] f32
                     qs_ref,                     # [1, Q, d] bf16/f32
                     out_ref,                    # [1, Q, TILE//fold] f32
                     arg_ref,                    # [1, Q, TILE//fold] i32
                     *, alpha: float, precise: bool, fold: int):
    """Folded variant: emits per-bin (min, argmin) over `fold` STRIDED
    slots instead of raw [Q, TILE] distances — the select's phase 1
    runs inside the kernel, shrinking the grouped output (and the
    ungroup gather downstream) fold-x.  Bin c of a tile holds slots
    {c, c+TILE/fold, ...}: strided, so same-list near-ties (adjacent
    slots) collide only with probability fold/TILE per pair (see
    ops/ivf_scan._chunkmin_topk for why contiguous bins are wrong).
    Requires the mask bias fused into nrm (masked mode): callers cannot
    re-mask individual slots after the fold."""
    g = pl.program_id(0)
    t = pl.program_id(1)
    nt = ntiles_ref[g]

    @pl.when(t < nt)
    def _scan():
        c = _rows_as(codes_ref[0], precise)              # [TILE, d]
        ip = jax.lax.dot_general(
            qs_ref[0], c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Q, TILE]
        dist = nrm_ref[0] - alpha * ip
        q, tile_n = dist.shape
        lb = tile_n // fold
        # unrolled strided min/argmin (Mosaic-safe: static fold <= 16)
        vals = dist[:, :lb]
        args = jnp.zeros((q, lb), jnp.int32)
        for j in range(1, fold):
            dj = dist[:, j * lb:(j + 1) * lb]
            m = dj < vals
            vals = jnp.where(m, dj, vals)
            args = jnp.where(m, j, args)
        out_ref[0] = vals
        arg_ref[0] = args

    @pl.when(t >= nt)
    def _skip():
        # folded mode always runs masked: a skipped tile is entirely
        # beyond the list's live length → all-BIG bias
        out_ref[0] = jnp.broadcast_to(
            jnp.max(nrm_ref[0]), out_ref.shape[1:])
        arg_ref[0] = jnp.zeros_like(arg_ref[0])


def fold_geometry(cap: int, tile: int, fold: int):
    """The folded kernel's effective (tile, lb): callers reconstruct
    original slots as (fidx // lb) * tile + arg * lb + (fidx % lb), so
    they must derive the SAME tile the kernel used."""
    tile = min(tile, cap)
    if cap % tile:
        tile = cap
    assert tile % fold == 0, (tile, fold)
    return tile, tile // fold


def _gsq_fold_call(codes, norms3, glist, ntiles, qs, *, q_pad: int,
                   tile: int, alpha: float, precise: bool, fold: int,
                   interpret: bool):
    g_pad = glist.shape[0]
    nlist, cap, d = codes.shape
    tile, lb = fold_geometry(cap, tile, fold)
    n_tiles = cap // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_pad, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, d),
                         lambda g, t, gl, nt: (gl[g], t, 0)),
            pl.BlockSpec((1, 1, tile),
                         lambda g, t, gl, nt: (gl[g], 0, t)),
            pl.BlockSpec((1, q_pad, d),
                         lambda g, t, gl, nt: (g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_pad, lb), lambda g, t, gl, nt: (g, 0, t)),
            pl.BlockSpec((1, q_pad, lb), lambda g, t, gl, nt: (g, 0, t)),
        ],
    )
    kern = functools.partial(_gsq_fold_kernel, alpha=alpha,
                             precise=precise, fold=fold)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, q_pad, cap // fold), jnp.float32),
            jax.ShapeDtypeStruct((g_pad, q_pad, cap // fold), jnp.int32),
        ],
        interpret=interpret,
    )(glist, ntiles, codes, norms3, qs)


def _gsq_call(codes, norms3, glist, ntiles, qs, *, q_pad: int, tile: int,
              alpha: float, with_norms: bool, precise: bool,
              interpret: bool, masked: bool = False):
    g_pad = glist.shape[0]
    nlist, cap, d = codes.shape
    tile = min(tile, cap)
    n_tiles = -(-cap // tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_pad, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, d),
                         lambda g, t, gl, nt: (gl[g], t, 0)),
            pl.BlockSpec((1, 1, tile),
                         lambda g, t, gl, nt: (gl[g], 0, t)),
            pl.BlockSpec((1, q_pad, d),
                         lambda g, t, gl, nt: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, q_pad, tile),
                               lambda g, t, gl, nt: (g, 0, t)),
    )
    kern = functools.partial(_gsq_kernel, alpha=alpha,
                             with_norms=with_norms, precise=precise,
                             masked=masked)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, q_pad, cap), jnp.float32),
        interpret=interpret,
    )(glist, ntiles, codes, norms3, qs)


def grouped_sq_scan(codes: jnp.ndarray,     # [nlist, cap, d_pad] u8|bf16
                    norms: jnp.ndarray,     # [nlist, cap] f32
                    lens: jnp.ndarray,      # [nlist] i32
                    list_ids: jnp.ndarray,  # [B, P] i32
                    queries: jnp.ndarray,   # [B, d] (pre-rotated if OPQ)
                    scale: Optional[jnp.ndarray],  # [d] f32; None = raw rows
                    off: Optional[jnp.ndarray],    # [d] f32; None = raw rows
                    centroids: Optional[jnp.ndarray] = None,  # [nlist,d]
                    *, metric: str = "l2",
                    bias: Optional[jnp.ndarray] = None,  # [nlist, cap] f32
                    q_pad: Optional[int] = None,
                    tile: Optional[int] = None,
                    precise: bool = False,
                    fold: int = 1,
                    interpret: bool = False):
    """→ dist [B, P, cap] f32: for L2 the EXACT ||q - dequant(x)||^2;
    for IP the exact -q.dequant(x).  Without `bias`, tiles beyond a
    list's live length return +query-const only — callers must mask by
    length (they do).  With `bias` [nlist, cap] f32
    (ops/ivf_scan.list_bias), the mask folds into the norms operand —
    dead/tombstoned/filtered slots come out >= BIG (+query-consts) and
    the caller needs no [B, P, cap] mask at all.

    `centroids` switches to RESIDUAL decoding: codes quantize
    x - c_list and the q.c_list cross term is added back in the
    epilogue — the kernel itself is unchanged, the list dependence
    folds entirely into per-(query, probe) constants.  q.c is computed
    as a full [B, nlist] HIGHEST-precision matmul + take_along_axis:
    default (bf16) MXU precision on the ~|q||c|-magnitude cross term
    shifts cross-list comparisons by more than near-tie gaps (measured
    -1pt recall), and reconstructing it from the coarse L2 distances
    hits the same cancellation.

    fold > 1 (requires `bias`): the kernel emits per-bin (min, argmin)
    over `fold` strided slots — returns (dist [B, P, cap//fold],
    args [B, P, cap//fold] i32) and the ORIGINAL slot of bin f is
    (f // lb) * tile + args * lb + (f % lb) with lb = tile // fold.
    This fuses the wide select's phase 1 into the scan: the grouped
    output and ungroup gather shrink fold-x (the 10M tier's HBM wall,
    experiments/exp_tenm4.py)."""
    b, p = list_ids.shape
    nlist, cap, d_pad = codes.shape
    d = queries.shape[1]
    if q_pad is None:
        q_pad = default_q_pad(b, p, nlist)
    if tile is None:
        tile = 512 if fold <= 1 else 4096
    if fold > 1:
        tile, _ = fold_geometry(cap, tile, fold)
    g_pad = group_bound(b, p, nlist, q_pad)

    glist, ntiles, gpair, pair_gid, pair_slot = build_groups(
        list_ids, lens, q_pad=q_pad, tile=min(tile, cap), g_pad=g_pad)

    qf = queries.astype(jnp.float32)
    if scale is None:
        # raw-row payload (bf16 IVFFlat rows): q.x is the matmul alone
        qs_full = qf                                     # [B, d]
        qoff = jnp.zeros(qf.shape[0], jnp.float32)
    else:
        qs_full = qf * scale[None, :]                    # [B, d]
        # q.x = (q*scale).c + q.off ; q.off is a per-query constant
        qoff = qf @ off.astype(jnp.float32)              # [B]
    if d != d_pad:
        qs_full = jnp.pad(qs_full, ((0, 0), (0, d_pad - d)))
    qidx = jnp.maximum(gpair, 0) // p                    # [G, Q]
    qs_dt = jnp.float32 if precise else jnp.bfloat16
    qs = jnp.take(qs_full, qidx, axis=0).astype(qs_dt)

    alpha = 2.0 if metric != "ip" else 1.0
    with_norms = metric != "ip"
    if bias is not None:
        # fold the per-slot mask into the norms stream (IP has no norms
        # term, so the bias alone becomes the operand)
        nrm_arr = (norms + bias) if with_norms else bias
        with_norms = True
    else:
        nrm_arr = norms
    norms3 = nrm_arr.reshape(nlist, 1, cap)
    args = None
    if fold > 1:
        assert bias is not None, "fold requires the fused mask bias"
        og, oa = _gsq_fold_call(codes, norms3, glist, ntiles, qs,
                                q_pad=q_pad, tile=tile, alpha=alpha,
                                precise=precise, fold=fold,
                                interpret=interpret)  # [G, Q, cap//fold]
        capf = cap // fold
        rows = pair_gid * q_pad + pair_slot
        out = jnp.take(og.reshape(g_pad * q_pad, capf), rows, axis=0
                       ).reshape(b, p, capf)
        args = jnp.take(oa.reshape(g_pad * q_pad, capf), rows, axis=0
                        ).reshape(b, p, capf)
    else:
        og = _gsq_call(codes, norms3, glist, ntiles, qs, q_pad=q_pad,
                       tile=tile, alpha=alpha, with_norms=with_norms,
                       precise=precise, interpret=interpret,
                       masked=bias is not None)           # [G, Q, cap]
        flat = og.reshape(g_pad * q_pad, cap)
        out = jnp.take(flat, pair_gid * q_pad + pair_slot, axis=0
                       ).reshape(b, p, cap)

    def _done(o):
        return o if args is None else (o, args)

    if centroids is None:
        if metric == "ip":
            return _done(out - qoff[:, None, None])
        qn = jnp.sum(qf * qf, axis=-1)                   # [B]
        return _done(out + (qn - 2.0 * qoff)[:, None, None])
    # residual decode: add back the -alpha * q.c_list cross term
    qc_full = jax.lax.dot_general(
        qf, centroids.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)             # [B, nlist]
    qc = jnp.take_along_axis(qc_full, list_ids, axis=1)  # [B, P]
    if metric == "ip":
        return _done(out - (qc + qoff[:, None])[..., None])
    qn = jnp.sum(qf * qf, axis=-1)                       # [B]
    return _done(out + (qn[:, None]
                        - 2.0 * (qc + qoff[:, None]))[..., None])
