"""Is the recall cap from candidate containment or something else?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

sys.path.insert(0, "/root/repo")
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.vector.raw_store import RawVectorStore
from bench import make_corpus

n, d, nq, k = 200_000, 128, 512, 10
nlist, m = 512, 32
rng = np.random.default_rng(0)
corpus = make_corpus(n, d, 1024, rng)
queries = (corpus[rng.choice(n, nq, replace=False)]
           + 0.5 * rng.normal(size=(nq, d)).astype(np.float32)).astype(np.float32)
qd = jnp.asarray(queries)

store = RawVectorStore("vec", d, device_dtype=jnp.float32)
store.add(corpus); store.flush_device()

import functools
@functools.partial(jax.jit, static_argnames=('kk',))
def exact_topk(qb, x, xn, kk):
    cross = jax.lax.dot_general(qb, x, dimension_numbers=(((1,),(1,)),((),())),
                                preferred_element_type=jnp.float32)
    dist = jnp.sum(qb*qb,-1,keepdims=True) - 2*cross + xn[None,:]
    nd, idx = jax.lax.top_k(-dist, kk)
    return -nd, idx

xf = jnp.asarray(corpus); xn = jnp.sum(xf*xf, -1)
gt_d, gt = [], []
for s in range(0, nq, 256):
    dd, ii = exact_topk(qd[s:s+256], xf, xn, k)
    gt.append(np.asarray(ii)); gt_d.append(np.asarray(dd))
gt = np.concatenate(gt); gt_d = np.concatenate(gt_d)
print("GT ok; typical top1/top10 dists:", gt_d[:3, 0], gt_d[:3, -1], flush=True)

# sanity: flat search on the f32 mirror == GT
fl = np.concatenate([np.asarray(exact_topk(qd[s:s+256], store.device[:store.device.shape[0]], store.device_norms, k)[1]) for s in range(0, nq, 256)])
# store.device rows beyond n are zeros — exclude via penalty? just compare sets
def recall(found, kk=10):
    return float(np.mean([len(set(found[i][:kk].tolist()) & set(gt[i].tolist()))/k for i in range(nq)]))
print("flat-mirror recall:", recall(fl), flush=True)

idx = IVFPQIndex(store, {"ncentroids": nlist, "nsubvector": m,
                         "bucket_init_size": 4*n//nlist})
idx.train(corpus[:nlist*256])
ids = np.arange(n, dtype=np.int64)
for s in range(0, n, 65536):
    e = min(n, s+65536)
    idx.add(store.device_rows(s, e), ids[s:e], ids[s:e])
print("built", flush=True)

# containment: recon-distance exact top-K (true top_k, no approx)
@functools.partial(jax.jit, static_argnames=('kk',))
def recon_topk(qb, kk):
    cross = jax.lax.dot_general(qb.astype(jnp.bfloat16), idx.recon,
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    dist = (jnp.sum(qb*qb,-1,keepdims=True) - 2*cross
            + idx.recon_norms[None,:] + idx.recon_valid[None,:])
    nd, ii = jax.lax.top_k(-dist, kk)
    return ii

for K in (100, 400, 1000):
    cont = []
    for s in range(0, nq, 256):
        ii = np.asarray(recon_topk(qd[s:s+256], K))
        for i in range(ii.shape[0]):
            cont.append(len(set(ii[i].tolist()) & set(gt[s+i].tolist()))/k)
    print(f"containment of GT top-10 in recon-exact top-{K}: {np.mean(cont):.4f}", flush=True)

# recon quality
rec_err = np.asarray(jnp.mean(jnp.sum(
    (idx.recon[:2048].astype(jnp.float32) - store.device[:2048])**2, -1)))
sig = np.mean(np.sum(corpus[:2048]**2, -1))
print(f"recon MSE {rec_err:.3f} vs mean ||x||^2 {sig:.1f}; "
      f"gt gap top1->top10 {np.mean(gt_d[:,-1]-gt_d[:,0]):.3f}", flush=True)
