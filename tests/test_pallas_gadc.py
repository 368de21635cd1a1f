"""Grouped MXU ADC kernel vs the XLA reference formulation.

The kernel runs in interpret mode here (CPU test platform); the real-TPU
compiled path gets an on-chip agreement check inside bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamma_tpu.ops import pq as pq_ops
from gamma_tpu.ops.pallas_gadc import (build_groups, default_q_pad,
                                       group_bound, grouped_adc)
from gamma_tpu.ops.pallas_adc import unpack_nibbles


def _mk_state(rng, nlist, cap, m, ksub, d, fill=0.8):
    """Random codes + lens + trained-ish codebooks/centroids."""
    x = rng.normal(size=(4096, d)).astype(np.float32)
    pq = pq_ops.train_pq(jnp.asarray(x), m,
                         nbits=int(np.log2(ksub)), iters=3)
    cents = jnp.asarray(rng.normal(size=(nlist, d)).astype(np.float32))
    codes = jnp.asarray(
        rng.integers(0, ksub, size=(nlist, cap, m)).astype(np.uint8))
    lens = jnp.asarray(
        rng.integers(0, int(cap * fill) + 1, size=nlist).astype(np.int32))
    return pq, cents, codes, lens


def _xla_ref(pq, cents, codes, list_ids, queries, metric):
    """Reference full distance: per-(b,p) residual LUT + gather scan."""
    codes_g = jnp.take(codes, list_ids, axis=0)
    if metric == "ip":
        lut = -pq_ops.ip_lut(pq, queries)
        lut = jnp.broadcast_to(
            lut[:, None], (lut.shape[0], list_ids.shape[1]) + lut.shape[1:])
        base = -pq_ops.pairwise_ip(queries, cents) if False else None
        cd = -jnp.einsum("bd,ld->bl", queries, cents)
        cd = jnp.take_along_axis(cd, list_ids, axis=1)
    else:
        probed = jnp.take(cents, list_ids, axis=0)
        residual = queries.astype(jnp.float32)[:, None, :] - probed
        lut = pq_ops.l2_lut(pq, residual)
        cd = jnp.zeros(list_ids.shape, jnp.float32)
    return pq_ops.adc_scan(lut, codes_g) + cd[..., None]


def _grouped_full(pq, cents, codes, lens, list_ids, queries, metric,
                  **kw):
    adc = grouped_adc(codes, lens, list_ids, queries, cents, pq,
                      metric=metric, interpret=True, **kw)
    if metric == "ip":
        cd = -jnp.einsum("bd,ld->bl", queries, cents)
        cd = jnp.take_along_axis(cd, list_ids, axis=1)
    else:
        diff = queries[:, None, :] - jnp.take(cents, list_ids, axis=0)
        cd = jnp.sum(diff * diff, axis=-1)
    return adc + cd[..., None]


def _mask_compare(got, ref, lens, list_ids, rtol=2e-2):
    """Compare only in-length slots (the kernel skips dead tiles)."""
    lens_g = np.asarray(jnp.take(lens, list_ids, axis=0))
    cap = got.shape[-1]
    in_len = np.arange(cap)[None, None, :] < lens_g[..., None]
    g = np.asarray(got)[in_len]
    r = np.asarray(ref)[in_len]
    scale = max(1.0, float(np.abs(r).max()))
    assert np.max(np.abs(g - r)) / scale < rtol, \
        f"max err {np.max(np.abs(g - r)) / scale}"


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_grouped_adc_parity_8bit(rng, metric):
    nlist, cap, m, ksub, d = 12, 48, 4, 32, 16
    pq, cents, codes, lens = _mk_state(rng, nlist, cap, m, ksub, d)
    b, p = 6, 3
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    list_ids = jnp.asarray(
        rng.integers(0, nlist, size=(b, p)).astype(np.int32))
    ref = _xla_ref(pq, cents, codes, list_ids, queries, metric)
    got = _grouped_full(pq, cents, codes, lens, list_ids, queries, metric,
                        q_pad=8, tile=16)
    _mask_compare(got, ref, lens, list_ids)


def test_grouped_adc_chunking_overflow(rng):
    """One list probed by more pairs than q_pad must spill into extra
    chunk groups, and every pair must still get its correct row."""
    nlist, cap, m, ksub, d = 4, 32, 8, 16, 16
    pq, cents, codes, lens = _mk_state(rng, nlist, cap, m, ksub, d, fill=1.0)
    b, p = 10, 3
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    # every query probes list 1 → 10 pairs share a list with q_pad=4
    li = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
    li[:, 0] = 1
    list_ids = jnp.asarray(li)
    ref = _xla_ref(pq, cents, codes, list_ids, queries, "l2")
    got = _grouped_full(pq, cents, codes, lens, list_ids, queries, "l2",
                        q_pad=4, tile=16)
    _mask_compare(got, ref, lens, list_ids)


def test_grouped_adc_packed_fastscan(rng):
    """Packed-nibble codes (ksub=16) through the fused-compare path."""
    nlist, cap, m, ksub, d = 8, 40, 16, 16, 32
    x = rng.normal(size=(4096, d)).astype(np.float32)
    pq = pq_ops.train_pq(jnp.asarray(x), m, nbits=4, iters=3)
    cents = jnp.asarray(rng.normal(size=(nlist, d)).astype(np.float32))
    codes4 = rng.integers(0, 16, size=(nlist, cap, m)).astype(np.uint8)
    packed = (codes4[..., 0::2] | (codes4[..., 1::2] << 4)).astype(np.uint8)
    lens = jnp.asarray(rng.integers(8, cap + 1, size=nlist).astype(np.int32))
    b, p = 5, 4
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    list_ids = jnp.asarray(
        rng.integers(0, nlist, size=(b, p)).astype(np.int32))
    # reference over the unpacked codes
    ref = _xla_ref(pq, cents, jnp.asarray(codes4), list_ids, queries, "l2")
    adc = grouped_adc(jnp.asarray(packed), lens, list_ids, queries, cents,
                      pq, metric="l2", packed=True, interpret=True,
                      q_pad=8, tile=16)
    diff = queries[:, None, :] - jnp.take(cents, list_ids, axis=0)
    cd = jnp.sum(diff * diff, axis=-1)
    got = adc + cd[..., None]
    _mask_compare(got, ref, lens, list_ids)
    # round-trip sanity on the nibble packing convention
    assert np.array_equal(np.asarray(unpack_nibbles(jnp.asarray(packed))),
                          codes4)


def test_build_groups_invariants(rng):
    nlist, q_pad, tile = 16, 4, 8
    b, p = 12, 5
    list_ids = jnp.asarray(
        rng.integers(0, nlist, size=(b, p)).astype(np.int32))
    lens = jnp.asarray(rng.integers(0, 33, size=nlist).astype(np.int32))
    g_pad = group_bound(b, p, nlist, q_pad)
    glist, ntiles, gpair, pair_gid, pair_slot = build_groups(
        list_ids, lens, q_pad=q_pad, tile=tile, g_pad=g_pad)
    glist, gpair = np.asarray(glist), np.asarray(gpair)
    pair_gid, pair_slot = np.asarray(pair_gid), np.asarray(pair_slot)
    ntiles = np.asarray(ntiles)
    li = np.asarray(list_ids).reshape(-1)
    # every pair maps to a slot holding exactly it, in a group of its list
    for pair in range(b * p):
        g, s = pair_gid[pair], pair_slot[pair]
        assert gpair[g, s] == pair
        assert glist[g] == li[pair]
        assert ntiles[g] == -(-int(np.asarray(lens)[li[pair]]) // tile)
    # no slot holds a pair twice
    filled = gpair[gpair >= 0]
    assert len(set(filled.tolist())) == filled.size == b * p


def test_default_q_pad_scaling():
    assert default_q_pad(256, 64, 2048) == 16
    assert default_q_pad(2048, 64, 2048) == 128
    assert default_q_pad(8, 4, 2048) == 8
