"""Microbenchmark ADC scan formulations on the real chip.

Shapes: B=256 queries, nlist=2048, nprobe=64, cap=512 (balanced lists),
M=32, ksub=256, d=128, N=1M corpus.
"""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp

B, NLIST, P, CAP, M, KSUB, D, N = 256, 2048, 64, 512, 32, 256, 128, 1_000_000

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 256, (NLIST, CAP, M), dtype=np.uint8))
docids = jnp.asarray(rng.integers(0, N, (NLIST, CAP), dtype=np.int32))
lens = jnp.asarray(np.full(NLIST, CAP - 7, np.int32))
lut_full = jnp.asarray(rng.normal(size=(B, P, M, KSUB)).astype(np.float32))
list_ids = jnp.asarray(rng.integers(0, NLIST, (B, P), dtype=np.int32))
penalty = jnp.zeros(N, jnp.float32)
corpus = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)).astype(jnp.bfloat16)
cnorms = jnp.sum(corpus.astype(jnp.float32)**2, -1)
q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))


def bench(name, fn, *args, iters=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:28s} compile={compile_s:6.1f}s steady={dt*1000:8.2f} ms/batch "
          f"QPS={B/dt:10,.0f}", flush=True)
    return out


# 1. gather lists then per-m accumulate (fori over M)
@jax.jit
def adc_per_m(codes, docids, lens, lut, list_ids, penalty):
    codes_g = jnp.take(codes, list_ids, axis=0)       # [B,P,CAP,M]
    docids_g = jnp.take(docids, list_ids, axis=0)
    lens_g = jnp.take(lens, list_ids, axis=0)
    ci = codes_g.astype(jnp.int32)
    def body(m, acc):
        lut_m = jax.lax.dynamic_index_in_dim(lut, m, axis=2)  # [B,P,1,KSUB]
        idx = jax.lax.dynamic_index_in_dim(ci, m, axis=3, keepdims=False)  # [B,P,CAP]
        return acc + jnp.take_along_axis(lut_m, idx[...,None].swapaxes(-1,-2), axis=-1)[..., 0, :]
    # hmm: simpler: build picked via one take_along_axis per m on [B,P,KSUB]
    acc = jnp.zeros((B, P, CAP), jnp.float32)
    acc = jax.lax.fori_loop(0, M, body, acc)
    pos = jnp.arange(CAP, dtype=jnp.int32)
    pen = jnp.take(penalty, docids_g, mode='fill', fill_value=3e38)
    acc = acc + jnp.where(pos[None,None,:] < lens_g[...,None], pen, 3e38)
    d, i = jax.lax.top_k(-acc.reshape(B, -1), 100)
    return -d, jnp.take_along_axis(docids_g.reshape(B,-1), i, axis=1)


# 2. swapaxes take_along_axis (current impl) — memory hog, small B only
@jax.jit
def adc_current(codes, docids, lens, lut, list_ids, penalty):
    codes_g = jnp.take(codes, list_ids, axis=0)
    docids_g = jnp.take(docids, list_ids, axis=0)
    lens_g = jnp.take(lens, list_ids, axis=0)
    idx = jnp.swapaxes(codes_g.astype(jnp.int32), -1, -2)
    picked = jnp.take_along_axis(lut, idx, axis=-1)
    acc = jnp.sum(picked, axis=-2)
    pos = jnp.arange(CAP, dtype=jnp.int32)
    pen = jnp.take(penalty, docids_g, mode='fill', fill_value=3e38)
    acc = acc + jnp.where(pos[None,None,:] < lens_g[...,None], pen, 3e38)
    d, i = jax.lax.top_k(-acc.reshape(B, -1), 100)
    return -d, jnp.take_along_axis(docids_g.reshape(B,-1), i, axis=1)


# 3. one-hot matmul over gathered lists, chunked over P via lax.map
@jax.jit
def adc_onehot(codes, docids, lens, lut, list_ids, penalty):
    def per_p(args):
        lids_p, lut_p = args            # [B], [B,M,KSUB]
        codes_p = jnp.take(codes, lids_p, axis=0)   # [B,CAP,M]
        oh = jax.nn.one_hot(codes_p.astype(jnp.int32), KSUB, dtype=jnp.bfloat16)  # [B,CAP,M,KSUB]
        acc = jnp.einsum('bcmk,bmk->bc', oh, lut_p.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return acc
    accs = jax.lax.map(per_p, (list_ids.swapaxes(0,1), lut.swapaxes(0,1)))  # [P,B,CAP]
    acc = accs.swapaxes(0,1)  # [B,P,CAP]
    docids_g = jnp.take(docids, list_ids, axis=0)
    lens_g = jnp.take(lens, list_ids, axis=0)
    pos = jnp.arange(CAP, dtype=jnp.int32)
    pen = jnp.take(penalty, docids_g, mode='fill', fill_value=3e38)
    acc = acc + jnp.where(pos[None,None,:] < lens_g[...,None], pen, 3e38)
    d, i = jax.lax.top_k(-acc.reshape(B, -1), 100)
    return -d, jnp.take_along_axis(docids_g.reshape(B,-1), i, axis=1)


# 4. flat bf16 matmul over full 1M corpus (reference point)
@jax.jit
def flat(q, corpus, cnorms, penalty):
    cross = jax.lax.dot_general(q.astype(jnp.bfloat16), corpus,
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    dist = jnp.sum(q*q, -1, keepdims=True) - 2*cross + cnorms[None,:] + penalty[None,:]
    d, i = jax.lax.top_k(-dist, 10)
    return -d, i


# 5. gather only (codes_g) — isolate gather cost
@jax.jit
def gather_only(codes, list_ids):
    return jnp.take(codes, list_ids, axis=0).sum(axis=(2,3), dtype=jnp.int32)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "flat"):
    bench("flat_bf16_1M", flat, q, corpus, cnorms, penalty)
if which in ("all", "gather"):
    bench("gather_codes_only", gather_only, codes, list_ids)
if which in ("all", "perm"):
    bench("adc_per_m_fori", adc_per_m, codes, docids, lens, lut_full, list_ids, penalty)
if which in ("all", "onehot"):
    bench("adc_onehot_mxu", adc_onehot, codes, docids, lens, lut_full, list_ids, penalty)
if which in ("all", "current"):
    bench("adc_current_swapaxes", adc_current, codes, docids, lens, lut_full, list_ids, penalty)
