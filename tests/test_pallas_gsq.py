"""Grouped SQ8 exact-scan kernel vs a numpy oracle.

The kernel runs in interpret mode here (CPU test platform); the real-TPU
compiled path gets an on-chip agreement check inside bench.py
(sq8_pallas_max_rel_err).  The contract under test: grouped_sq_scan
returns the EXACT distance (L2) / negated inner product (IP) between the
query and the DEQUANTIZED point, for every in-length slot of every
probed list, for both the residual and non-residual codings.
"""

import jax
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


def test_grouped_sq_fold_reconstruction(rng):
    """fold>1: the kernel's per-bin (min, argmin) must reconstruct —
    vals equal the strided-bin minima of the unfolded distances and the
    decoded slot points at exactly that minimum."""
    from gamma_tpu.ops import ivf_scan as iv
    from gamma_tpu.ops.pallas_gsq import fold_geometry
    nlist, cap, d, d_pad, b, p, fold = 8, 32, 8, 128, 4, 3, 4
    codes, norms, lens, cents, scale, off, deq = _mk_sq_state(
        rng, nlist, cap, d, d_pad, residual=True)
    queries = rng.normal(size=(b, d)).astype(np.float32) * 2.0
    list_ids = np.stack([rng.choice(nlist, p, replace=False)
                         for _ in range(b)]).astype(np.int32)
    docids = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    bias = iv.list_bias(jnp.asarray(docids), jnp.asarray(lens), cap,
                        penalty=None, live_n=jnp.int32(nlist * cap))
    tile, lb = fold_geometry(cap, 16, fold)
    dist_f, args_f = grouped_sq_scan(
        jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(lens),
        jnp.asarray(list_ids), jnp.asarray(queries), scale, off,
        centroids=jnp.asarray(cents), metric="l2", bias=bias,
        fold=fold, tile=tile, q_pad=4, interpret=True)
    full = grouped_sq_scan(
        jnp.asarray(codes), jnp.asarray(norms), jnp.asarray(lens),
        jnp.asarray(list_ids), jnp.asarray(queries), scale, off,
        centroids=jnp.asarray(cents), metric="l2", bias=bias,
        q_pad=4, tile=16, interpret=True)
    dist_f, args_f, full = map(np.asarray, (dist_f, args_f, full))
    capf = cap // fold
    for bi in range(b):
        for pi in range(p):
            for f in range(capf):
                tt, c = (f % capf) // lb, f % lb
                tt = f // lb
                slots = [tt * tile + j * lb + c for j in range(fold)]
                ref = min(full[bi, pi, s] for s in slots)
                got = dist_f[bi, pi, f]
                assert abs(got - min(ref, 1e30)) <= 1e-3 * max(
                    1.0, abs(ref)) or (got >= 1e29 and ref >= 1e29), (
                    bi, pi, f, got, ref)
                j = int(args_f[bi, pi, f])
                s = tt * tile + j * lb + c
                assert abs(full[bi, pi, s] - got) <= 1e-3 * max(
                    1.0, abs(got)) or got >= 1e29


def test_ivfsq_fold_path_matches_unfolded(rng):
    """ivfsq_search's wide-cap fold path (cap >= 4096 triggers fold=8)
    returns the same top-k as the unfolded XLA path."""
    from gamma_tpu.ops import ivf_scan as iv
    from gamma_tpu.realtime.invert_index import IVFState
    nlist, cap, d, d_pad, b = 4, 4096, 8, 128, 4
    codes, norms, lens, cents, scale, off, deq = _mk_sq_state(
        rng, nlist, cap, d, d_pad, residual=True)
    lens = np.minimum(lens + 3000, cap).astype(np.int32)  # long lists
    queries = rng.normal(size=(b, d)).astype(np.float32) * 2.0
    ids = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    st = IVFState(jnp.zeros((nlist, cap, 1), jnp.uint8),
                  jnp.asarray(ids), jnp.asarray(ids), jnp.asarray(lens))
    pen = jnp.zeros(nlist * cap, jnp.float32)
    kw = dict(nprobe=3, k=5, metric="l2", cap_eff=0)
    d_x, doc_x, _ = iv.ivfsq_search(
        st, jnp.asarray(codes), jnp.asarray(norms), scale, off,
        jnp.asarray(cents), jnp.asarray((cents ** 2).sum(-1)),
        jnp.asarray(queries), pen, scan_impl="xla", **kw)
    # fold path runs the pallas kernel in interpret mode off-TPU? No —
    # scan_impl="pallas" without interpret needs a TPU; emulate the
    # fold SELECT path by checking the pallas interpret kernel feeding
    # the same decode logic through grouped_sq_scan directly instead.
    from gamma_tpu.ops.pallas_gsq import fold_geometry
    bias = iv.list_bias(st.docids, st.lens, cap, penalty=pen)
    cd, lids = iv.coarse_assign(jnp.asarray(queries),
                                jnp.asarray(cents),
                                jnp.asarray((cents ** 2).sum(-1)),
                                3, "l2")
    tile, lb = fold_geometry(cap, 4096, 8)
    dist_f, args_f = grouped_sq_scan(
        jnp.asarray(codes), jnp.asarray(norms), st.lens, lids,
        jnp.asarray(queries), scale, off,
        centroids=jnp.asarray(cents), metric="l2", bias=bias,
        fold=8, tile=tile, q_pad=4, interpret=True)
    capf = cap // 8
    flat = np.asarray(jnp.minimum(dist_f, 1e30)).reshape(b, -1)
    order = np.argsort(flat, axis=1)[:, :5]
    args_n = np.asarray(args_f).reshape(b, -1)
    got = []
    for bi in range(b):
        docs = []
        for ridx in order[bi]:
            pidx, fidx = ridx // capf, ridx % capf
            tt, c = fidx // lb, fidx % lb
            slot = tt * tile + int(args_n[bi, ridx]) * lb + c
            docs.append(int(ids[np.asarray(lids)[bi, pidx], slot]))
        got.append(docs)
    doc_x = np.asarray(doc_x)
    agree = np.mean([len(set(got[i]) & set(doc_x[i].tolist())) / 5
                     for i in range(b)])
    assert agree >= 0.8, (agree, got, doc_x)


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_grouped_raw_rows_parity(rng, metric):
    """scale/off=None: the kernel scans raw bf16 payload rows (the
    IVFFlat grouped path) — distances must be exact to the stored bf16
    rows within bf16-matmul tolerance."""
    nlist, cap, d = 8, 32, 16
    rows_f32 = rng.normal(size=(nlist, cap, d)).astype(np.float32)
    rows = jnp.asarray(rows_f32).astype(jnp.bfloat16)
    rows_np = np.asarray(rows, np.float32)        # the stored payload
    lens = rng.integers(1, cap + 1, size=nlist).astype(np.int32)
    norms = (rows_np ** 2).sum(-1).astype(np.float32)
    b, p = 6, 3
    queries = rng.normal(size=(b, d)).astype(np.float32)
    list_ids = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
    got = grouped_sq_scan(
        rows, jnp.asarray(norms), jnp.asarray(lens),
        jnp.asarray(list_ids), jnp.asarray(queries), None, None,
        metric=metric, q_pad=8, tile=16, interpret=True)
    ref = _oracle(rows_np, list_ids, queries, metric)
    _mask_compare(got, ref, lens, list_ids)


def test_ivfflat_grouped_matches_xla():
    """End-to-end: ivfflat_search scan_impl='pallas' (interpret) returns
    the same top-k sets as the XLA gather path at a small geometry.
    Local rng: near-tie top-k comparisons are draw-sensitive (see
    conftest rng invariant)."""
    from unittest import mock

    import functools as _ft

    from gamma_tpu.ops import ivf_scan
    from gamma_tpu.ops.pallas_gsq import grouped_sq_scan as _gss
    from gamma_tpu.realtime import invert_index as rt

    rng = np.random.default_rng(7)
    nlist, cap, d, n = 16, 24, 32, 300
    rows = rng.normal(size=(n, d)).astype(np.float32)
    cents = rng.normal(size=(nlist, d)).astype(np.float32) * 2.0
    la = np.argmin(((rows[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    codes = np.zeros((nlist, cap, d * 2), np.uint8)
    vids = np.full((nlist, cap), -1, np.int32)
    lens = np.zeros(nlist, np.int32)
    for i in range(n):
        l = la[i]
        if lens[l] >= cap:
            continue
        bf = jnp.asarray(rows[i]).astype(jnp.bfloat16)
        codes[l, lens[l]] = np.asarray(
            jax.lax.bitcast_convert_type(bf, jnp.uint8)).reshape(-1)
        vids[l, lens[l]] = i
        lens[l] += 1
    state = rt.IVFState(jnp.asarray(codes), jnp.asarray(vids),
                        jnp.asarray(vids), jnp.asarray(lens))
    cn = jnp.sum(jnp.asarray(cents) ** 2, -1)
    q = jnp.asarray(rows[rng.integers(0, n, size=5)]
                    + 0.05 * rng.normal(size=(5, d)).astype(np.float32))
    pen = jnp.zeros(n + 8, jnp.float32)
    kw = dict(nprobe=6, k=8, d=d, metric="l2")
    dx, docx, _ = ivf_scan.ivfflat_search(state, jnp.asarray(cents), cn,
                                          q, pen, scan_impl="xla", **kw)
    with mock.patch("gamma_tpu.ops.pallas_gsq.grouped_sq_scan",
                    _ft.partial(_gss, interpret=True)):
        dp, docp, _ = ivf_scan.ivfflat_search(
            state, jnp.asarray(cents), cn, q, pen,
            scan_impl="pallas", **kw)
    for i in range(5):
        sx = set(np.asarray(docx[i]).tolist())
        sp = set(np.asarray(docp[i]).tolist())
        assert len(sx & sp) >= 7, (i, sx, sp)    # bf16 near-ties may flip 1
    # magnitude-aware distance compare: the pallas path's bf16 QUERY
    # cast blurs near-zero distances by ~|q||x|*2^-9 absolute (the
    # dense-mirror precision class), so the floor is the median |ref|,
    # not zero — same policy as _mask_compare above
    got = np.sort(np.asarray(dp, np.float64), axis=1)
    ref = np.sort(np.asarray(dx, np.float64), axis=1)
    floor = max(float(np.median(np.abs(ref))), 1e-6)
    scaled = np.abs(got - ref) / np.maximum(np.abs(ref), floor)
    assert float(scaled.max()) < 3e-2, float(scaled.max())
