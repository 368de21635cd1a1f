"""Component profile of the PQ-ADC pipelines at the 1M bench geometry:
where do the ~19-25k-QPS gather-class paths (8-bit ADC, 4-bit FastScan)
spend their time vs the 44k SQ8 tier?  Isolates: the grouped kernel
alone (8-bit / packed-4-bit / SQ8), the candidate select (exact top_k vs
approx pool), the ungroup gather, and the rerank.

Context (r5): exp_shardpq showed sharded-vs-single PQ parity (~8%); the
r4 "2.4x sharded gap" was PQ-pipeline-vs-SQ8-pipeline, not shard_map.
"""

import functools
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
from gamma_tpu.ops.pallas_gsq import grouped_sq_scan
from gamma_tpu.realtime.invert_index import IVFState


def _force(out):
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
    b, p, k, rn = 1024, 64, 10, 100
    fill = 0.48
    L = int(cap * fill)
    n = nlist * L
    ce = 512                       # pow2 ladder covering L
    print(f"devices={jax.devices()} n={n} B={b} cap_eff={ce}", flush=True)

    cents = rng.normal(size=(nlist, d)).astype(np.float32)
    cnorms = np.sum(cents.astype(np.float64) ** 2, -1).astype(np.float32)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    lens = jnp.asarray(np.full(nlist, L, np.int32))
    ids = np.full((nlist, ce), -1, np.int32)
    ids[:, :L] = (rng.permutation(nlist * L).astype(np.int32) % n
                  ).reshape(nlist, L)
    ids_d = jnp.asarray(ids)
    cents_d = jnp.asarray(cents)
    cnorms_d = jnp.asarray(cnorms)
    penalty = jnp.zeros(n, jnp.float32)
    raw_bf = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32),
                         jnp.bfloat16)

    def coarse(q, nprobe):
        return iv.coarse_assign(q, cents_d, cnorms_d, nprobe, "l2")

    cd, lids = jax.jit(coarse, static_argnums=1)(queries, p)
    jax.block_until_ready(lids)
    bias = iv.list_bias(ids_d, lens, ce, penalty=None, live_n=jnp.int32(n))
    jax.block_until_ready(bias)

    # ---- kernels alone (bias fused, ungroup gather included) ----
    for tag, m, ksub, w, packed in (("8-bit m=32", 32, 256, 32, False),
                                    ("4-bit M=64", 64, 16, 32, True)):
        cb = rng.normal(size=(m, ksub, d // m)).astype(np.float32) * 0.1
        pq = pq_ops.PQCodebooks(
            jnp.asarray(cb),
            jnp.asarray(np.sum(cb.astype(np.float64) ** 2, -1),
                        jnp.float32))
        codes = jnp.asarray(
            rng.integers(0, 256, size=(nlist, ce, w)).astype(np.uint8))

        def kern(codes_, pq_, q, lid):
            return grouped_adc(codes_, lens, lid, q, cents_d, pq_,
                               metric="l2", packed=packed, bias=bias)
        ms = bench(jax.jit(kern), codes, pq, queries, lids)
        print(f"kernel {tag:12s}: {ms:7.2f} ms", flush=True)

        st = IVFState(codes=codes, vids=ids_d, docids=ids_d, lens=lens)
        fn = iv.ivfpqfs_search if packed else iv.ivfpq_search

        # big arrays must be jit ARGS, not closure constants — closure
        # constants ship in the remote-compile request body (HTTP 413)
        def full(st_, pq_, raw_, q, rerank=True):
            return fn(st_, cents_d, cnorms_d, pq_, q, penalty, raw_,
                      live_n=n, nprobe=p, recall_num=rn, k=k,
                      metric="l2", rerank=rerank, scan_impl="pallas",
                      cap_eff=ce)
        jfull = jax.jit(full, static_argnames=("rerank",))
        ms = bench(jfull, st, pq, raw_bf, queries)
        print(f"full   {tag:12s}: {ms:7.2f} ms  ({b/ms*1e3:8,.0f} QPS)",
              flush=True)

        ms = bench(functools.partial(jfull, rerank=False),
                   st, pq, raw_bf, queries)
        print(f"norank {tag:12s}: {ms:7.2f} ms", flush=True)

    # ---- SQ8 tier (reference point) ----
    sq_codes = jnp.asarray(
        rng.integers(0, 256, size=(nlist, ce, d)).astype(np.uint8))
    sq_norms = jnp.asarray(
        rng.normal(size=(nlist, ce)).astype(np.float32) ** 2 * 100)
    scale = jnp.full((d,), 0.01, jnp.float32)
    off = jnp.full((d,), -1.28, jnp.float32)

    def sqk(sqc, sqn, q, lid):
        return grouped_sq_scan(sqc, sqn, lens, lid, q, scale,
                               off, centroids=cents_d, metric="l2",
                               bias=bias)
    ms = bench(jax.jit(sqk), sq_codes, sq_norms, queries, lids)
    print(f"kernel SQ8        : {ms:7.2f} ms", flush=True)

    st = IVFState(codes=jnp.zeros((nlist, ce, 1), jnp.uint8),
                  vids=ids_d, docids=ids_d, lens=lens)

    def sqfull(st_, sqc, sqn, q):
        return iv.ivfsq_search(st_, sqc, sqn, scale, off,
                               cents_d, cnorms_d, q, penalty,
                               live_n=n, nprobe=p, k=k, metric="l2",
                               scan_impl="pallas", cap_eff=ce)
    ms = bench(jax.jit(sqfull), st, sq_codes, sq_norms, queries)
    print(f"full   SQ8        : {ms:7.2f} ms  ({b/ms*1e3:8,.0f} QPS)",
          flush=True)

    # ---- selects alone over a [B, P, ce] distance tensor ----
    dist = jnp.asarray(rng.normal(size=(b, p, ce)).astype(np.float32))

    def sel_approx(ii, dd):
        return iv._select_late(dd, lids, ii, ii, ce, rn)

    def sel_exact(ii, dd):
        return iv._select_late(dd, lids, ii, ii, ce, rn, exact=True)

    print(f"select approx(rn=100): "
          f"{bench(jax.jit(sel_approx), ids_d, dist):7.2f} ms", flush=True)
    print(f"select exact (rn=100): "
          f"{bench(jax.jit(sel_exact), ids_d, dist):7.2f} ms", flush=True)

    def sel_exact_k(ii, dd):
        return iv._select_late(dd, lids, ii, ii, ce, k, exact=True)
    print(f"select exact (k=10)  : "
          f"{bench(jax.jit(sel_exact_k), ids_d, dist):7.2f} ms", flush=True)

    # ---- rerank alone ----
    rvid = jnp.asarray(rng.integers(0, n, size=(b, rn)).astype(np.int32))
    rd = jnp.abs(jnp.asarray(rng.normal(size=(b, rn)).astype(np.float32)))

    def rr(raw_, q):
        return iv._rerank(q, rd, rvid, rvid, raw_, penalty, k, "l2")
    print(f"rerank (R=100)       : "
          f"{bench(jax.jit(rr), raw_bf, queries):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
