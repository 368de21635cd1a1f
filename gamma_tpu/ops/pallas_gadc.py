"""Grouped MXU ADC scan — the capacity-mode hot loop, rebuilt for the MXU.

Reference hot loop: GammaIVFPQScanner's per-code LUT accumulation
(gamma_index_ivfpq.h:403-418) and its AVX2 FastScan analog
(gamma_index_ivfpqfs.cc:149, faiss bbs register blocking).

The round-2 kernel (ops/pallas_adc.py) computes one (query, probe) pair
per grid step, accumulating LUT entries as ksub-wide one-hot VPU
select-sums — ksub x more ALU than the lookups need, at the VPU's rate
(718 ms / 256-query batch at the SIFT1M geometry → 174 QPS end to end).

This kernel restructures the scan so the multiply-accumulate lands on
the MXU.  The L2 ADC distance decomposes exactly:

  ||q - (c_L + res(x))||²  =  ||q - c_L||²                    (coarse)
                            + Σ_m ||cb[m, code_m]||²          (per-code)
                            - 2 Σ_m r_m · cb[m, code_m]       (cross)
  with r = q - c_L; the per-code and cross terms together are

      lut_q[mk] @ onehot(x)[mk]      lut = cbn - 2 (r @ CBm)

  where CBm [d, M·ksub] is the block-diagonal flattened codebook and
  onehot(x) [M·ksub] has one 1 per subquantizer.  So:

  * queries probing the same list are GROUPED (device-side sort) into
    rows of Q_PAD slots; each (group, cap-tile) grid step computes ONE
    [Q_PAD, M·ksub] x [M·ksub, TILE] matmul — the one-hot expansion of
    the codes tile is built once in VMEM and amortized over every query
    in the group, and the accumulation runs on the MXU;
  * the per-(query, list) LUT itself is built IN-KERNEL as a second
    matmul from the grouped residuals [Q_PAD, d] and CBm — nothing
    per-(query, probe) materializes in HBM (the XLA path's
    [B, P, M, ksub] f32 LUT is 512 MB at the SIFT1M bench geometry);
  * tiles beyond a list's live length are skipped via scalar-prefetched
    per-group tile counts (pl.when), so padded capacity costs DMA only.

IP is the same kernel with r = q, lut = -(q @ CBm), and the caller adds
the coarse term either way (dist = coarse[b,p] + out[g, slot]).

The FastScan (ksub=16, packed nibbles) variant shares the kernel: codes
unpack in-register and CBm's column blocks follow the packed order
(all low nibbles, then all high nibbles), so no interleave shuffle is
needed.  At M·ksub=1024 the expansion and matmul are 8x cheaper per
code than the 8-bit layout — the preferred capacity operating point.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamma_tpu.ops import pq as pq_ops


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def default_q_pad(b: int, p: int, nlist: int) -> int:
    """Query slots per group: ~2x the mean list occupancy of the batch,
    clamped to [8, 128].  Larger batches fill the MXU's lane dim better."""
    mean = max(1, (b * p) // max(1, nlist))
    q = 8
    while q < 2 * mean and q < 128:
        q *= 2
    return q


def group_bound(b: int, p: int, nlist: int, q_pad: int) -> int:
    """Static bound on the number of (list, chunk) groups: at most one
    group per occupied list plus one extra chunk per q_pad pairs."""
    bp = b * p
    return _round_up(min(nlist, bp) + _cdiv(bp, q_pad) + 1, 8)


def build_groups(list_ids: jnp.ndarray,     # [B, P] i32
                 lens: jnp.ndarray,         # [nlist] i32
                 *, q_pad: int, tile: int, g_pad: int):
    """Invert the (query, probe) → list mapping into per-list groups of
    at most q_pad query slots (lists probed by more get extra chunk
    groups).  All device ops: one sort + cumsums + scatters over B·P
    elements.

    → (glist [g_pad] i32       — list id per group (0 for inactive),
       ntiles [g_pad] i32      — live cap-tiles per group (0 → skip),
       gpair [g_pad, q_pad]    — flat pair index per slot (-1 pad),
       pair_gid [B·P] i32,
       pair_slot [B·P] i32)    — inverse map for ungrouping."""
    b, p = list_ids.shape
    bp = b * p
    li = list_ids.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(li, stable=True).astype(jnp.int32)
    sl = jnp.take(li, order)
    idx = jnp.arange(bp, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - run_start
    slot = rank % q_pad
    new_grp = is_start | (slot == 0)
    gid = jnp.cumsum(new_grp.astype(jnp.int32)) - 1
    glist = jnp.zeros((g_pad,), jnp.int32).at[gid].set(sl, mode="drop")
    gpair = jnp.full((g_pad, q_pad), -1, jnp.int32).at[gid, slot].set(
        order, mode="drop")
    pair_gid = jnp.zeros((bp,), jnp.int32).at[order].set(gid)
    pair_slot = jnp.zeros((bp,), jnp.int32).at[order].set(slot)
    ng = gid[-1] + 1
    active = jnp.arange(g_pad, dtype=jnp.int32) < ng
    glens = jnp.take(lens, glist)
    ntiles = jnp.where(active, -(-glens // tile), 0).astype(jnp.int32)
    return glist, ntiles, gpair, pair_gid, pair_slot


def flat_codebook(pq: pq_ops.PQCodebooks, packed: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten [M, ksub, dsub] codebooks into the kernel's block-diagonal
    CBm [M·dsub, M·ksub] (bf16) + flat norms cbn [1, M·ksub] (f32).

    For the packed-nibble layout, column blocks follow the kernel's
    unpack order (all low nibbles, then all high nibbles) while ROWS stay
    in true feature order — the kernel never interleaves."""
    m, ksub, dsub = pq.codebooks.shape
    if packed:
        perm = jnp.concatenate([jnp.arange(0, m, 2, dtype=jnp.int32),
                                jnp.arange(1, m, 2, dtype=jnp.int32)])
    else:
        perm = jnp.arange(m, dtype=jnp.int32)
    cb_t = jnp.transpose(pq.codebooks.astype(jnp.float32), (0, 2, 1))
    z = jnp.zeros((m, dsub, m, ksub), jnp.float32)
    # column block j holds subquantizer perm[j]; its rows are that
    # subquantizer's true feature dims
    z = z.at[perm, :, jnp.arange(m), :].set(jnp.take(cb_t, perm, axis=0))
    cbm = z.reshape(m * dsub, m * ksub)
    cbn = jnp.take(pq.cb_norms.astype(jnp.float32), perm, axis=0
                   ).reshape(1, m * ksub)
    return cbm.astype(jnp.bfloat16), cbn


def _gadc_kernel(glist_ref, ntiles_ref,          # scalar prefetch
                 codes_ref,                      # [1, TILE, W] u8
                 rg_ref,                         # [1, Q, K] bf16
                 cbm_ref,                        # [K, MK] bf16
                 cbn_ref,                        # [1, MK] f32
                 *rest,                          # [bias_ref,] out, scratch
                 alpha: float, ksub: int, packed: bool,
                 with_bias: bool = False):
    if with_bias:
        bias_ref, out_ref, lut_ref, oh_ref = rest  # bias [1, 1, TILE] f32
    else:
        out_ref, lut_ref, oh_ref = rest
    g = pl.program_id(0)
    t = pl.program_id(1)
    nt = ntiles_ref[g]

    @pl.when((t == 0) & (nt > 0))
    def _build_lut():
        ip = jnp.dot(rg_ref[0], cbm_ref[:],
                     preferred_element_type=jnp.float32)     # [Q, MK]
        lut_ref[:] = (cbn_ref[:] - alpha * ip).astype(jnp.bfloat16)

    @pl.when(t < nt)
    def _scan():
        tile_n = codes_ref.shape[1]
        if packed:
            pk = codes_ref[0].astype(jnp.int32)              # [TILE, W]
            cu = jnp.concatenate([pk & 15, pk >> 4], axis=1)
        else:
            cu = codes_ref[0].astype(jnp.int32)              # [TILE, M]
        m = cu.shape[1]
        mk = m * ksub
        if mk >= 4096:
            # per-subquantizer expansion: [TILE, ksub] compares into
            # lane-aligned scratch slices (ksub >= 128) keep the int32
            # intermediates at [TILE, ksub] instead of [TILE, MK]
            kidx = jax.lax.broadcasted_iota(jnp.int32, (tile_n, ksub), 1)
            for mi in range(m):
                cm = cu[:, mi: mi + 1]
                oh_ref[:, mi * ksub:(mi + 1) * ksub] = (
                    kidx == cm).astype(jnp.bfloat16)
        else:
            # small tables (FastScan ksub=16): expand codes across lanes
            # with an MXU matmul (Mosaic cannot lower jnp.repeat's
            # [T,M,ksub]→[T,MK] shape cast).  E[m, j] = (j//ksub == m),
            # so rep[t, j] = cu[t, j//ksub] exactly (codes < 256 are
            # exact in f32 accumulation).
            jm = jax.lax.broadcasted_iota(jnp.int32, (m, mk), 1) // ksub
            mi_ = jax.lax.broadcasted_iota(jnp.int32, (m, mk), 0)
            e = (jm == mi_).astype(jnp.bfloat16)
            rep = jax.lax.dot_general(
                cu.astype(jnp.bfloat16), e,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [TILE, MK]
            kmod = (jax.lax.broadcasted_iota(
                jnp.int32, (tile_n, mk), 1) & (ksub - 1)).astype(jnp.float32)
            oh_ref[:] = (rep == kmod).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            lut_ref[:], oh_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Q, TILE]
        if with_bias:
            # per-(list, slot) mask/penalty bias rides the tile stream:
            # dead slots (beyond length, tombstoned, filtered) come out
            # >= BIG with no caller-side [B, P, cap] mask at all
            acc = acc + bias_ref[0]
        out_ref[0] = acc

    @pl.when(t >= nt)
    def _skip():
        if with_bias:
            # a skipped tile is entirely beyond the list's live length,
            # so its bias is BIG everywhere — emitting it masks the tile
            out_ref[0] = jnp.broadcast_to(bias_ref[0], out_ref.shape[1:])
        else:
            # skipped tiles must still be finite: the caller's in-length
            # mask ADDS BIG, and garbage/NaN would survive the add
            out_ref[0] = jnp.zeros_like(out_ref[0])


def _gadc_call(codes, glist, ntiles, rg, cbm, cbn, bias3=None,
               *, q_pad: int, tile: int, ksub: int, alpha: float,
               packed: bool, interpret: bool) -> jnp.ndarray:
    g_pad = glist.shape[0]
    nlist, cap, w = codes.shape
    kdim, mk = cbm.shape
    tile = min(tile, cap)
    n_tiles = _cdiv(cap, tile)
    in_specs = [
        pl.BlockSpec((1, tile, w),
                     lambda g, t, gl, nt: (gl[g], t, 0)),
        pl.BlockSpec((1, q_pad, kdim),
                     lambda g, t, gl, nt: (g, 0, 0)),
        pl.BlockSpec((kdim, mk), lambda g, t, gl, nt: (0, 0)),
        pl.BlockSpec((1, mk), lambda g, t, gl, nt: (0, 0)),
    ]
    operands = [glist, ntiles, codes, rg, cbm, cbn]
    if bias3 is not None:
        in_specs.append(pl.BlockSpec((1, 1, tile),
                                     lambda g, t, gl, nt: (gl[g], 0, t)))
        operands.append(bias3)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g_pad, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_pad, tile),
                               lambda g, t, gl, nt: (g, 0, t)),
        scratch_shapes=[
            pltpu.VMEM((q_pad, mk), jnp.bfloat16),
            pltpu.VMEM((tile, mk), jnp.bfloat16),
        ],
    )
    kern = functools.partial(_gadc_kernel, alpha=alpha, ksub=ksub,
                             packed=packed, with_bias=bias3 is not None)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_pad, q_pad, cap), jnp.float32),
        interpret=interpret,
    )(*operands)


def grouped_adc(codes: jnp.ndarray,        # [nlist, cap, W] u8
                lens: jnp.ndarray,         # [nlist] i32
                list_ids: jnp.ndarray,     # [B, P] i32
                queries: jnp.ndarray,      # [B, d] (pre-rotated if OPQ)
                centroids: jnp.ndarray,    # [nlist, d] f32
                pq: pq_ops.PQCodebooks,
                *, metric: str = "l2", packed: bool = False,
                residual: bool = True,
                bias: Optional[jnp.ndarray] = None,   # [nlist, cap] f32
                q_pad: Optional[int] = None, tile: Optional[int] = None,
                interpret: bool = False) -> jnp.ndarray:
    """→ adc [B, P, cap] f32 with adc[b,p,c] =
         Σ_m ||cb[m,code]||² - 2 r_{b,p} · cb[m, code]     (L2, residual)
         Σ_m ||cb[m,code]||² - 2 q_b   · cb[m, code]       (L2, raw —
             by_residual=false FastScan: caller adds ||q||² for the
             full distance instead of the coarse term)
         Σ_m        - q_b · cb[m, code]                    (IP)
    so that the full distance is coarse[b,p] + adc[b,p,c] (residual L2 /
    IP) or ||q||² + adc (raw L2).

    Without `bias`, tiles beyond a list's live length return 0.0 —
    callers must mask by length (they do).  With `bias` [nlist, cap]
    f32 (ops/ivf_scan.list_bias: BIG on dead/tombstoned/filtered slots,
    additive penalties on live ones), the mask rides the tile stream
    and the output needs NO caller-side [B, P, cap] mask: masked slots
    come out >= BIG, skipped tiles emit their (all-BIG) bias."""
    b, p = list_ids.shape
    nlist, cap, w = codes.shape
    m, ksub = pq.M, pq.ksub
    assert ksub & (ksub - 1) == 0, "ksub must be a power of two"
    mk = m * ksub
    assert mk % 128 == 0, "M*ksub must be lane-aligned (multiple of 128)"
    if q_pad is None:
        q_pad = default_q_pad(b, p, nlist)
    if tile is None:
        tile = 256 if mk >= 4096 else 512
    g_pad = group_bound(b, p, nlist, q_pad)

    glist, ntiles, gpair, pair_gid, pair_slot = build_groups(
        list_ids, lens, q_pad=q_pad, tile=min(tile, cap), g_pad=g_pad)

    qidx = jnp.maximum(gpair, 0) // p                       # [G, Q]
    qg = jnp.take(queries.astype(jnp.float32), qidx, axis=0)
    if metric == "ip":
        rg = qg
        alpha = 1.0
    elif residual:
        cg = jnp.take(centroids.astype(jnp.float32), glist, axis=0)
        rg = qg - cg[:, None, :]
        alpha = 2.0
    else:
        rg = qg
        alpha = 2.0
    cbm, cbn = flat_codebook(pq, packed)
    if metric == "ip":
        cbn = jnp.zeros_like(cbn)
    # pad the contraction dim (true feature dims → subspace-padded dims
    # are zero on both sides, then lane-align)
    kdim = _round_up(cbm.shape[0], 128)
    if cbm.shape[0] != kdim:
        cbm = jnp.pad(cbm, ((0, kdim - cbm.shape[0]), (0, 0)))
    if rg.shape[-1] != kdim:
        rg = jnp.pad(rg, ((0, 0), (0, 0), (0, kdim - rg.shape[-1])))
    rg = rg.astype(jnp.bfloat16)

    bias3 = (None if bias is None
             else bias.reshape(nlist, 1, cap).astype(jnp.float32))
    og = _gadc_call(codes, glist, ntiles, rg, cbm, cbn, bias3,
                    q_pad=q_pad, tile=tile, ksub=ksub, alpha=alpha,
                    packed=packed, interpret=interpret)     # [G, Q, cap]
    flat = og.reshape(g_pad * q_pad, cap)
    adc = jnp.take(flat, pair_gid * q_pad + pair_slot, axis=0)
    return adc.reshape(b, p, cap)
