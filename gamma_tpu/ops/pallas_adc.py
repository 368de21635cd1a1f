"""Pallas gather-ADC scan kernel — capacity-mode hot loop.

Reference hot loop: GammaIVFPQScanner's per-code LUT accumulation
(gamma_index_ivfpq.h:403-418, 574-601): for each code in a probed list,
`dis = dis0 + Σ_m LUT[m][code[m]]`.

XLA on TPU lowers the LUT gather to scalar-core loops (measured 3.5-5.7
s for a [256 q × 64 probes × 512 cap × 32 M] batch).  This kernel keeps
the gather on-chip: each grid step owns one (query, probe) pair, DMAs the
probed list's codes into VMEM via scalar-prefetched indexing, and
accumulates the M LUT lookups as VPU select-sums over the 256-entry
sublane axis — no HBM gather traffic beyond the codes themselves.
Measured 718 ms/batch at the SIFT1M geometry (B=256, P=64, cap=1953,
M=32, ksub=256) on v5e — ~8x the XLA lowering, and at the VPU's one-hot
select-sum speed-of-light (ksub x more ALU than true gathers need; see
fastscan ksub=16 for the cheaper operating point).

Used by scan_mode="gather" when HBM cannot hold reconstructions
(ops/dense_scan.py is the default below that threshold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gamma_tpu.ops.distances import BIG


# cap-axis tile: the per-m one-hot select materializes a [TILE, ksub] f32
# intermediate; at TILE=512/ksub=256 the unrolled M-loop's working set is
# ~8 MB of scoped VMEM, inside the 16 MB limit.  Untiled (cap=1953 at the
# SIFT1M geometry) the same kernel OOMs VMEM at compile time.
CAP_TILE = 512


def _adc_kernel(list_ids_ref,          # scalar prefetch [B*P] i32
                codes_ref,             # [1, TILE, M] u8 (probed list tile)
                lut_ref,               # [1, M, ksub] f32 (this (b,p))
                out_ref):              # [1, 1, TILE] f32
    tile, m = codes_ref.shape[1], codes_ref.shape[2]
    ksub = lut_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32)          # [TILE, M]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (tile, ksub), 1)

    # static unroll over subquantizers (M is small; dynamic slicing of
    # values is not lowerable in Mosaic)
    acc = jnp.zeros((tile,), jnp.float32)
    for mi in range(m):
        cm = codes[:, mi: mi + 1]                    # [TILE, 1]
        onehot = kidx == cm                          # [TILE, ksub]
        lut_m = lut_ref[0, mi: mi + 1, :]            # [1, ksub]
        acc = acc + jnp.sum(jnp.where(onehot, lut_m, 0.0), axis=1)
    out_ref[0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_pallas(codes: jnp.ndarray,      # [nlist, cap, M] u8
                    list_ids: jnp.ndarray,   # [B, P] i32
                    lut: jnp.ndarray,        # [B, P, M, ksub] f32
                    *, interpret: bool = False) -> jnp.ndarray:
    """→ dist [B, P, cap] f32 where dist[b,p,c] =
    Σ_m lut[b,p,m,codes[list_ids[b,p],c,m]]."""
    b, p = list_ids.shape
    nlist, cap, m = codes.shape
    ksub = lut.shape[-1]
    flat_ids = list_ids.reshape(-1)
    lut_flat = lut.reshape(b * p, m, ksub)
    n_tiles = -(-cap // CAP_TILE)

    # grid iterates tiles innermost so the (b,p) LUT block stays resident
    # across a list's tiles; non-divisible caps rely on Pallas block
    # padding (OOB tile tails compute garbage that the caller's in-len
    # mask discards)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * p, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, min(cap, CAP_TILE), m),
                lambda i, t, ids: (ids[i], t, 0)),
            pl.BlockSpec(
                (1, m, ksub),
                lambda i, t, ids: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, min(cap, CAP_TILE)),
                               lambda i, t, ids: (i, 0, t)),
    )
    out = pl.pallas_call(
        _adc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * p, 1, cap), jnp.float32),
        interpret=interpret,
    )(flat_ids, codes, lut_flat)
    return out.reshape(b, p, cap)


# ---------------------------------------------------------------------
# FastScan variant: 4-bit codes packed two-per-byte, ksub=16, one LUT per
# QUERY (by_residual=false — reference gamma_index_ivfpqfs.cc:146).  The
# ksub=16 one-hot is 16x less VPU work per subquantizer than ksub=256, and
# the query-level LUT removes the nprobe x LUT traffic.  This is the TPU
# analog of the reference's AVX2 vpshufb 16-entry register LUTs (faiss
# BlockInvertedLists, bbs blocking — CAP_TILE plays the bbs role here).
# Measured 65 ms/batch at the SIFT1M geometry (B=256, P=64, cap=1953,
# M=64 packed) on v5e — 8.2x the 8-bit kernel, matching the ALU ratio.
# ---------------------------------------------------------------------

CAP_TILE_FS = 512


def _adc_fs_kernel(list_ids_ref,       # scalar prefetch [B*P] i32
                   codes_ref,          # [1, TILE, M//2] u8 packed nibbles
                   lut_ref,            # [1, 16, M] f32 (this query,
                                       #   TRANSPOSED: ksub on sublanes)
                   out_ref):           # [1, 1, TILE] f32
    tile = codes_ref.shape[1]
    ksub, m = lut_ref.shape[1], lut_ref.shape[2]
    # ONE transpose to [W, TILE], then every per-m access is a cheap
    # second-minor row read (per-m column extracts from [TILE, W] are 64
    # cross-lane shuffles per grid step and dominate the kernel)
    packed_t = jnp.transpose(codes_ref[0].astype(jnp.int32))  # [W, TILE]
    lo_t = packed_t & 15
    hi_t = packed_t >> 4
    # one-hot laid out [ksub, TILE]: ksub=16 rides the 8-sublane axis
    # (2 vregs) and TILE rides the 128 lanes — a [TILE, 16] layout pads
    # 16 up to 128 lanes and blows the 16 MB scoped-VMEM limit 8x over
    kidx = jax.lax.broadcasted_iota(jnp.int32, (ksub, tile), 0)

    acc = jnp.zeros((tile,), jnp.float32)
    for mi in range(m):
        nib = (hi_t if mi % 2 else lo_t)[mi // 2]    # [TILE]
        onehot = kidx == nib[None, :]                # [ksub, TILE]
        lut_m = lut_ref[0, :, mi: mi + 1]            # [ksub, 1]
        acc = acc + jnp.sum(jnp.where(onehot, lut_m, 0.0), axis=0)
    out_ref[0, 0, :] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_scan_pallas_fs(codes: jnp.ndarray,     # [nlist, cap, M//2] u8
                       list_ids: jnp.ndarray,  # [B, P] i32
                       lut: jnp.ndarray,       # [B, M, 16] f32 per query
                       *, interpret: bool = False) -> jnp.ndarray:
    """→ dist [B, P, cap] f32 where dist[b,p,c] = Σ_m lut[b,m,nibble_m(c)]
    over the packed 4-bit codes of list list_ids[b,p]."""
    b, p = list_ids.shape
    nlist, cap, w = codes.shape
    m, ksub = lut.shape[1], lut.shape[2]
    flat_ids = list_ids.reshape(-1)
    lut_t = jnp.transpose(lut, (0, 2, 1))        # [B, ksub, M]
    n_tiles = -(-cap // CAP_TILE_FS)
    tile = min(cap, CAP_TILE_FS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * p, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile, w),
                lambda i, t, ids: (ids[i], t, 0)),
            pl.BlockSpec(
                (1, ksub, m),
                lambda i, t, ids, _p=p: (i // _p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile),
                               lambda i, t, ids: (i, 0, t)),
    )
    out = pl.pallas_call(
        _adc_fs_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * p, 1, cap), jnp.float32),
        interpret=interpret,
    )(flat_ids, codes, lut_t)
    return out.reshape(b, p, cap)


def unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., W] u8 packed → [..., 2W] u8 codes in 0..15 (lo nibble first)."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    return jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (2 * packed.shape[-1],))
