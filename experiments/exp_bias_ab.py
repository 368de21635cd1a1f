"""A/B the round-4 regression: gather/SQ8 QPS halved (28.4k -> 13.7k)
after 4be56ad (fold posting masks into kernels + late id select).

Isolates, at the 1M bench geometry (nlist=2048, cap~1024, d=128, B=1024,
P=64), the per-dispatch cost of:
  1. grouped_sq_scan with fused bias vs bias=None + caller-side mask add
  2. candidate select: two-stage exact vs approx_min_k vs full sort
  3. the full ivfsq pipeline both ways
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

from gamma_tpu.ops import ivf_scan as iv
from gamma_tpu.ops.pallas_gsq import grouped_sq_scan


def _force(out):
    # slice ON DEVICE first: np.asarray of a big output drags the whole
    # buffer through the 30-60 MB/s tunnel (2.4 s per 268 MB read)
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[:4])


def bench(fn, *args, iters=8):
    _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    nlist, cap, d = 2048, 1024, 128
    b, p, k = int(os.environ.get("B", 1024)), 64, 10
    fill = 0.48
    print(f"devices={jax.devices()} B={b} cap={cap}", flush=True)

    cents = jnp.asarray(rng.normal(size=(nlist, d)).astype(np.float32))
    cnorms = jnp.sum(cents * cents, axis=1)
    sq_codes = jnp.asarray(
        rng.integers(0, 256, size=(nlist, cap, d)).astype(np.uint8))
    sq_norms = jnp.asarray(rng.random((nlist, cap)).astype(np.float32))
    scale = jnp.full((d,), 0.01, jnp.float32)
    off = jnp.full((d,), -1.0, jnp.float32)
    L = int(cap * fill)
    lens = jnp.asarray(np.full(nlist, L, np.int32))
    ids = np.full((nlist, cap), -1, np.int32)
    ids[:, :L] = np.arange(nlist * L, dtype=np.int32).reshape(nlist, L)
    ids_d = jnp.asarray(ids)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    live_n = jnp.int32(nlist * L)

    cd, list_ids = jax.jit(
        lambda q: iv.coarse_assign(q, cents, cnorms, p, "l2"))(queries)
    list_ids = jax.block_until_ready(list_ids)

    bias = jax.jit(lambda: iv.list_bias(ids_d, lens, cap, live_n=live_n)
                   )()

    # 1. kernel alone: fused bias vs none (codes passed as args so
    # they are runtime operands, not 268 MB HLO constants)
    def scan_nob(sc, sn, li, q):
        return grouped_sq_scan(sc, sn, lens, li, q, scale, off,
                               centroids=cents, metric="l2")

    def scan_bias(sc, sn, bi, li, q):
        return grouped_sq_scan(sc, sn, lens, li, q, scale, off,
                               centroids=cents, metric="l2", bias=bi)

    t_nob = bench(jax.jit(scan_nob), sq_codes, sq_norms, list_ids, queries)
    t_bias = bench(jax.jit(scan_bias), sq_codes, sq_norms, bias,
                   list_ids, queries)
    print(f"gsq kernel: bias=None {t_nob:.1f} ms   fused {t_bias:.1f} ms",
          flush=True)

    # 2. select alone, on a precomputed dist tensor
    dist = jax.jit(scan_bias)(sq_codes, sq_norms, bias, list_ids,
                              queries)
    dist = jax.block_until_ready(dist)

    def sel_exact2(dd, li):
        return iv._select_late(dd, li, ids_d, ids_d, cap, k, exact=True)

    def sel_approx(dd, li):
        return iv._select_late(dd, li, ids_d, ids_d, cap, k, exact=False)

    def sel_fullsort(dd, li):
        flat = dd.reshape(b, -1)
        nd, ridx = jax.lax.top_k(-flat, k)
        return -nd, ridx

    t_e2 = bench(jax.jit(sel_exact2), dist, list_ids)
    t_ap = bench(jax.jit(sel_approx), dist, list_ids)
    t_fs = bench(jax.jit(sel_fullsort), dist, list_ids)
    print(f"select: exact2 {t_e2:.1f} ms   approx {t_ap:.1f} ms   "
          f"fullsort {t_fs:.1f} ms", flush=True)

    # 3. full pipeline (scan -> +cd -> select) fused vs unfused+approx
    def pipe(sc, sn, bi, li, q, exact):
        rd = grouped_sq_scan(sc, sn, lens, li, q, scale, off,
                             centroids=cents, metric="l2", bias=bi)
        dd = jnp.minimum(rd, iv.BIG)
        return iv._select_late(dd, li, ids_d, ids_d, cap, k, exact=exact)

    import functools
    t_pipe_e = bench(jax.jit(functools.partial(pipe, exact=True)),
                     sq_codes, sq_norms, bias, list_ids, queries)
    t_pipe_a = bench(jax.jit(functools.partial(pipe, exact=False)),
                     sq_codes, sq_norms, bias, list_ids, queries)
    print(f"pipeline: exact2 {t_pipe_e:.1f} ms ({b/t_pipe_e*1000:,.0f} "
          f"QPS)   approx {t_pipe_a:.1f} ms ({b/t_pipe_a*1000:,.0f} QPS)",
          flush=True)




def main2():
    """Candidate replacements for the exact select, timed + checked for
    exact agreement against the full sort."""
    rng = np.random.default_rng(1)
    nlist, cap, d = 2048, 1024, 128
    b, p, k = int(os.environ.get("B", 1024)), 64, 10
    print(f"[select-ab] B={b} cap={cap} width={p*cap}", flush=True)
    dist = jnp.asarray(rng.normal(size=(b, p, cap)).astype(np.float32))
    # make plenty of near-ties: quantize
    dist = jnp.round(dist * 64) / 64

    def fullsort(dd):
        flat = dd.reshape(b, -1)
        nd, ridx = jax.lax.top_k(-flat, k)
        return -nd, ridx

    def approx_resort(dd, r=128):
        flat = dd.reshape(b, -1)
        vd, vi = jax.lax.approx_min_k(flat, r, recall_target=0.95)
        nd, pos = jax.lax.top_k(-vd, k)
        return -nd, jnp.take_along_axis(vi, pos, axis=1)

    def minext(dd):
        flat = dd.reshape(b, -1)
        def step(carry, _):
            f, = carry
            v = jnp.min(f, axis=1)
            i = jnp.argmin(f, axis=1).astype(jnp.int32)
            f = f.at[jnp.arange(b), i].set(iv.BIG)
            return (f,), (v, i)
        (_,), (vs, js) = jax.lax.scan(step, (flat,), None, length=k)
        return vs.T, js.T

    fns = {"fullsort": fullsort, "approx128+sort": approx_resort,
           "minext": minext}
    ref_v, ref_i = jax.jit(fullsort)(dist)
    ref_v = np.asarray(ref_v); ref_i = np.asarray(ref_i)
    for name, fn in fns.items():
        t = bench(jax.jit(fn), dist)
        v, i = jax.jit(fn)(dist)
        v = np.asarray(v)
        # compare by VALUE multiset (ties make index compare unfair)
        agree = float(np.mean(np.sort(v, 1) == np.sort(ref_v, 1)))
        print(f"  {name:16s} {t:6.1f} ms  value-agreement {agree:.6f}",
              flush=True)


if __name__ == "__main__":
    if os.environ.get("SELECT_AB"):
        main2()
        raise SystemExit
    main()
