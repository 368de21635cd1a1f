"""Grouped SQ8 exact-scan kernel vs a numpy oracle.

The kernel runs in interpret mode here (CPU test platform); the real-TPU
compiled path gets an on-chip agreement check inside bench.py
(sq8_pallas_max_rel_err).  The contract under test: grouped_sq_scan
returns the EXACT distance (L2) / negated inner product (IP) between the
query and the DEQUANTIZED point, for every in-length slot of every
probed list, for both the residual and non-residual codings.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gamma_tpu.ops.pallas_gsq import encode_sq, grouped_sq_scan, train_sq


def _mk_sq_state(rng, nlist, cap, d, d_pad, *, residual):
    """Clustered rows encoded per list → (codes, norms, lens, cents,
    scale, off, deq) where deq[l, s] is the dequantized point the kernel
    distances must be exact against."""
    cents = rng.normal(size=(nlist, d)).astype(np.float32) * 3.0
    lens = rng.integers(1, cap + 1, size=nlist).astype(np.int32)
    rows = cents[:, None, :] + \
        0.3 * rng.normal(size=(nlist, cap, d)).astype(np.float32)
    res = rows - cents[:, None, :] if residual else rows
    scale, off = train_sq(jnp.asarray(res.reshape(-1, d)))
    codes = np.zeros((nlist, cap, d_pad), np.uint8)
    norms = np.zeros((nlist, cap), np.float32)
    for l in range(nlist):
        c, n = encode_sq(
            jnp.asarray(rows[l]), scale, off,
            coarse=jnp.broadcast_to(jnp.asarray(cents[l]), (cap, d))
            if residual else None,
            d_pad=d_pad, residual=residual)
        codes[l] = np.asarray(c)
        norms[l] = np.asarray(n)
    base = cents[:, None, :] if residual else 0.0
    deq = base + np.asarray(off)[None, None, :] + \
        np.asarray(scale)[None, None, :] * codes[..., :d].astype(np.float32)
    return codes, norms, lens, cents, scale, off, deq


def _oracle(deq, list_ids, queries, metric):
    """[B, P, cap] exact distances to the dequantized points (f64)."""
    pts = deq[np.asarray(list_ids)]          # [B, P, cap, d]
    q = np.asarray(queries, np.float64)[:, None, None, :]
    if metric == "ip":
        return -np.sum(q * pts, axis=-1)
    dd = q - pts
    return np.sum(dd * dd, axis=-1)


def _mask_compare(got, ref, lens, list_ids, rtol=2e-2):
    """Element-wise tolerance over in-length slots; returns the worst
    scaled error (for comparative asserts).

    The floor is the MEDIAN |ref| magnitude, not the global max: bf16
    matmul error scales with operand magnitudes, so near-zero distances
    (the near-tie regime that costs recall, esp. for metric='ip') must
    not inherit the loosest entry's absolute budget — a global-max
    normalization let a large relative error on small-|ref| entries
    pass unnoticed."""
    lens_g = lens[np.asarray(list_ids)]
    cap = got.shape[-1]
    in_len = np.arange(cap)[None, None, :] < lens_g[..., None]
    g = np.asarray(got, np.float64)[in_len]
    r = np.asarray(ref, np.float64)[in_len]
    floor = max(float(np.median(np.abs(r))), 1e-6)
    denom = np.maximum(np.abs(r), floor)
    scaled = np.abs(g - r) / denom
    worst = float(scaled.max())
    assert worst < rtol, f"max element-wise rel err {worst} (rtol {rtol})"
    return worst


def test_encode_sq_norms_exact(rng):
    """norms must be ||dequantized point||^2, including the coarse base."""
    d, d_pad, n = 12, 16, 64
    cents = rng.normal(size=(n, d)).astype(np.float32)
    rows = cents + 0.2 * rng.normal(size=(n, d)).astype(np.float32)
    scale, off = train_sq(jnp.asarray(rows - cents))
    codes, norms = encode_sq(jnp.asarray(rows), scale, off,
                             coarse=jnp.asarray(cents), d_pad=d_pad,
                             residual=True)
    deq = cents + np.asarray(off) + \
        np.asarray(scale) * np.asarray(codes)[:, :d].astype(np.float32)
    np.testing.assert_allclose(np.asarray(norms), (deq ** 2).sum(-1),
                               rtol=1e-5)
    # padding dims must encode as zero-contribution
    assert codes.shape == (n, d_pad)
    assert np.all(np.asarray(codes)[:, d:] == 0)


@pytest.mark.parametrize("metric", ["l2", "ip"])
@pytest.mark.parametrize("residual", [True, False])
def test_grouped_sq_parity(rng, metric, residual):
    nlist, cap, d, d_pad = 10, 40, 16, 16
    codes, norms, lens, cents, scale, off, deq = _mk_sq_state(
        rng, nlist, cap, d, d_pad, residual=residual)
    b, p = 6, 3
    queries = rng.normal(size=(b, d)).astype(np.float32)
    list_ids = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
    got = grouped_sq_scan(
        jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(lens),
        jnp.asarray(list_ids), jnp.asarray(queries), scale, off,
        centroids=jnp.asarray(cents) if residual else None,
        metric=metric, q_pad=8, tile=16, interpret=True)
    ref = _oracle(deq, list_ids, queries, metric)
    _mask_compare(got, ref, lens, list_ids)


def test_grouped_sq_padded_dims_and_spill(rng):
    """d < d_pad padding contributes nothing, and one list probed by
    more pairs than q_pad spills into chunk groups correctly."""
    nlist, cap, d, d_pad = 4, 32, 12, 16
    codes, norms, lens, cents, scale, off, deq = _mk_sq_state(
        rng, nlist, cap, d, d_pad, residual=True)
    lens[:] = cap                    # full lists
    b, p = 10, 3
    queries = rng.normal(size=(b, d)).astype(np.float32)
    li = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
    li[:, 0] = 2                     # 10 pairs share list 2, q_pad=4
    got = grouped_sq_scan(
        jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(lens),
        jnp.asarray(li), jnp.asarray(queries), scale, off,
        centroids=jnp.asarray(cents), metric="l2",
        q_pad=4, tile=16, interpret=True)
    ref = _oracle(deq, li, queries, "l2")
    _mask_compare(got, ref, lens, li)


def test_grouped_sq_precise_mode(rng):
    """precise=True (f32 kernel matmul) must tighten the bf16 error —
    asserted COMPARATIVELY on the same inputs (precise err < default
    err), not just against an absolute bar a no-op precise flag could
    still clear."""
    nlist, cap, d, d_pad = 6, 24, 16, 16
    codes, norms, lens, cents, scale, off, deq = _mk_sq_state(
        rng, nlist, cap, d, d_pad, residual=True)
    b, p = 4, 2
    queries = rng.normal(size=(b, d)).astype(np.float32)
    list_ids = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
    ref = _oracle(deq, list_ids, queries, "l2")

    def run(precise):
        return grouped_sq_scan(
            jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(lens),
            jnp.asarray(list_ids), jnp.asarray(queries), scale, off,
            centroids=jnp.asarray(cents), metric="l2",
            q_pad=8, tile=8, precise=precise, interpret=True)

    err_precise = _mask_compare(run(True), ref, lens, list_ids, rtol=1e-4)
    err_bf16 = _mask_compare(run(False), ref, lens, list_ids, rtol=2e-2)
    assert err_precise < err_bf16, (
        f"precise ({err_precise}) not tighter than bf16 ({err_bf16})")
