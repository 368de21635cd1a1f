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


def _adc_kernel(list_ids_ref,          # scalar prefetch [B*P] i32
                codes_ref,             # [1, cap, M] u8 (probed list)
                lut_ref,               # [1, M, ksub] f32 (this (b,p))
                out_ref):              # [1, 1, cap] f32
    cap, m = codes_ref.shape[1], codes_ref.shape[2]
    ksub = lut_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32)          # [cap, M]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (cap, ksub), 1)

    # static unroll over subquantizers (M is small; dynamic slicing of
    # values is not lowerable in Mosaic)
    acc = jnp.zeros((cap,), jnp.float32)
    for mi in range(m):
        cm = codes[:, mi: mi + 1]                    # [cap, 1]
        onehot = kidx == cm                          # [cap, ksub]
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * p,),
        in_specs=[
            pl.BlockSpec(
                (1, cap, m),
                lambda i, ids: (ids[i], 0, 0)),
            pl.BlockSpec(
                (1, m, ksub),
                lambda i, ids: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, cap),
                               lambda i, ids: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _adc_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * p, 1, cap), jnp.float32),
        interpret=interpret,
    )(flat_ids, codes, lut_flat)
    return out.reshape(b, p, cap)
