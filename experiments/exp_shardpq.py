"""Find the sharded-PQ shard-body gap: 15.8k QPS on a 1x1 mesh vs the
single-chip gather pipeline's 33.8k at the SAME geometry (1M bench:
nlist=2048, cap=1024, d=128, m=32, B=1024, P=64, R=100, rerank).

Isolates: rerank on/off, raw dtype (f32 vs bf16 mirror), and the
single-chip ivfpq_search as the reference point.
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
from gamma_tpu.realtime.invert_index import IVFState
from gamma_tpu.parallel import (build_mesh, shard_ivfpq,
                                sharded_ivfpq_search_fn)


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
    nlist, cap, d, m, ksub = 2048, 1024, 128, 32, 256
    b, p, k, rn = 1024, 64, 10, 100
    fill = 0.48
    n = int(nlist * cap * fill)
    print(f"devices={jax.devices()} n={n} B={b}", flush=True)

    cents = rng.normal(size=(nlist, d)).astype(np.float32)
    cb = rng.normal(size=(m, ksub, d // m)).astype(np.float32) * 0.1
    codebooks = pq_ops.PQCodebooks(
        jnp.asarray(cb),
        jnp.asarray(np.sum(cb.astype(np.float64) ** 2, -1), jnp.float32))
    codes = rng.integers(0, ksub, size=(nlist, cap, m)).astype(np.uint8)
    L = int(cap * fill)
    lens = np.full(nlist, L, np.int32)
    ids = np.full((nlist, cap), -1, np.int32)
    perm = rng.permutation(nlist * L).astype(np.int32) % n
    ids[:, :L] = perm.reshape(nlist, L)
    state = IVFState(codes=jnp.asarray(codes), vids=jnp.asarray(ids),
                     docids=jnp.asarray(ids), lens=jnp.asarray(lens))
    raw = rng.normal(size=(n, d)).astype(np.float32)
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    penalty = jnp.zeros(n, jnp.float32)

    mesh1 = build_mesh(1, 1)

    ce = 256
    while ce < L:
        ce *= 2
    for tag, raw_in, rerank, cap_eff in (
            ("rerank f32 raw (bench cfg)", raw, True, 0),
            (f"rerank f32 cap_eff={ce}", raw, True, ce),
            ("no rerank", raw, False, 0),
            (f"no rerank cap_eff={ce}", raw, False, ce)):
        sh = shard_ivfpq(mesh1, state, cents, None, codebooks, raw_in,
                         cap_eff=cap_eff)
        fn = sharded_ivfpq_search_fn(
            mesh1, nprobe=p, recall_num=rn, k=k, metric="l2",
            rerank=rerank, v_per_shard=sh.v_per_shard,
            scan_impl="pallas", use_validity=True)
        pen = jnp.zeros(sh.raw.shape[0], jnp.float32)
        ms = bench(lambda q: fn(sh, q, pen, live_n=n), queries)
        print(f"sharded {tag:28s}: {ms:7.2f} ms  "
              f"({b / ms * 1e3:8,.0f} QPS)", flush=True)
        del sh, fn, pen

    # single-chip reference (same pipeline, no shard_map)
    cnorms = jnp.asarray(np.sum(cents.astype(np.float64) ** 2, -1),
                         np.float32)
    raw_bf = jnp.asarray(raw.astype(jnp.bfloat16))
    cents_j = jnp.asarray(cents)

    for cap_eff in (0, ce):
        def single(st, rw, q):
            return iv.ivfpq_search(
                st, cents_j, cnorms, codebooks, q, penalty, rw,
                live_n=n, nprobe=p, recall_num=rn, k=k, metric="l2",
                rerank=True, scan_impl="pallas", cap_eff=cap_eff)
        ms = bench(jax.jit(single), state, raw_bf, queries)
        print(f"single-chip gather cap_eff={cap_eff:4d}: {ms:7.2f} ms  "
              f"({b / ms * 1e3:8,.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
