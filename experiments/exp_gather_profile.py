"""Stage-by-stage timing of the gather-mode search at the bench geometry.

Decomposes ivfpq_search's ~99 ms/1024-batch into: coarse assign, state
gathers + mask, grouped ADC kernel, candidate select (exact vs approx),
and the exact rerank — to find where the non-kernel ~2/3 goes.
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

from gamma_tpu.ops import ivf_scan as iv, pq as pq_ops
from gamma_tpu.ops.pallas_gadc import grouped_adc
from gamma_tpu.realtime.invert_index import IVFState


def bench(fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    nlist, cap, d, m, ksub = 2048, 1953, 128, 32, 256
    b, p, rn, k = int(os.environ.get("B", 1024)), 64, 100, 10
    fill = 0.26
    print(f"devices={jax.devices()} B={b}", flush=True)

    x = rng.normal(size=(8192, d)).astype(np.float32)
    pq = pq_ops.train_pq(jnp.asarray(x), m, nbits=8, iters=2)
    cents = jnp.asarray(rng.normal(size=(nlist, d)).astype(np.float32))
    cnorms = jnp.sum(cents * cents, axis=1)
    codes = jnp.asarray(
        rng.integers(0, ksub, size=(nlist, cap, m)).astype(np.uint8))
    lens = jnp.asarray(np.full(nlist, int(cap * fill), np.int32))
    ids = np.full((nlist, cap), -1, np.int32)
    L = int(cap * fill)
    ids[:, :L] = np.arange(nlist * L, dtype=np.int32).reshape(nlist, L)
    state = IVFState(codes, jnp.asarray(ids), jnp.asarray(ids), lens)
    raw = jnp.asarray(rng.normal(size=(nlist * L, d)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    penalty = jnp.zeros(nlist * L, jnp.float32)
    live_n = jnp.int32(nlist * L)

    t = bench(jax.jit(lambda q: iv.coarse_assign(q, cents, cnorms, p,
                                                 "l2")), queries)
    print(f"coarse_assign:        {t:7.2f} ms", flush=True)

    @jax.jit
    def gathers(q):
        cd, lids = iv.coarse_assign(q, cents, cnorms, p, "l2")
        vg = jnp.take(state.vids, lids, axis=0)
        dg = jnp.take(state.docids, lids, axis=0)
        lg = jnp.take(state.lens, lids, axis=0)
        mask = iv._candidate_mask_validity(dg, lg, cap, live_n)
        return mask.sum()
    print(f"+ gathers & mask:     {bench(gathers, queries):7.2f} ms",
          flush=True)

    # big arrays ride as jit ARGUMENTS: closure capture would bake the
    # 128 MB code tensor into the HLO and blow up remote_compile
    @jax.jit
    def adc_only(st, q):
        cd, lids = iv.coarse_assign(q, cents, cnorms, p, "l2")
        return grouped_adc(st.codes, st.lens, lids, q, cents, pq)
    print(f"+ grouped ADC:        {bench(adc_only, state, queries):7.2f}"
          f" ms", flush=True)

    @jax.jit
    def adc_bias(st, q):
        cd, lids = iv.coarse_assign(q, cents, cnorms, p, "l2")
        bias = iv.list_bias(st.docids, st.lens, cap, live_n=live_n)
        return grouped_adc(st.codes, st.lens, lids, q, cents, pq,
                           bias=bias)
    print(f"+ grouped ADC+bias:   {bench(adc_bias, state, queries):7.2f}"
          f" ms", flush=True)

    for impl, note in (("pallas", "approx select"),):
        fn = jax.jit(lambda st, rw, q: iv.ivfpq_search(
            st, cents, cnorms, pq, q, penalty, rw,
            live_n=live_n, nprobe=p, recall_num=rn, k=k, metric="l2",
            rerank=False, scan_impl=impl))
        print(f"full no-rerank ({note}): "
              f"{bench(fn, state, raw, queries):7.2f} ms", flush=True)
        fn2 = jax.jit(lambda st, rw, q: iv.ivfpq_search(
            st, cents, cnorms, pq, q, penalty, rw,
            live_n=live_n, nprobe=p, recall_num=rn, k=k, metric="l2",
            rerank=True, scan_impl=impl))
        print(f"full + rerank   ({note}): "
              f"{bench(fn2, state, raw, queries):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
