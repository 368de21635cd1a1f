"""Diagnose recall loss: approx topk vs PQ reconstruction error."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.vector.raw_store import RawVectorStore
from bench import make_corpus

n, d, nq, k = 500_000, 128, 512, 10
nlist, m = 1024, 32
rng = np.random.default_rng(0)
corpus = make_corpus(n, d, 1024, rng)
queries = (corpus[rng.choice(n, nq, replace=False)]
           + 0.5 * rng.normal(size=(nq, d)).astype(np.float32)).astype(np.float32)
qd = jnp.asarray(queries)

store = RawVectorStore("vec", d)
store.add(corpus); store.flush_device()

@jax.jit
def exact_topk(qb, x, xn, kk=100):
    cross = jax.lax.dot_general(qb, x, dimension_numbers=(((1,),(1,)),((),())),
                                preferred_element_type=jnp.float32)
    dist = jnp.sum(qb*qb,-1,keepdims=True) - 2*cross + xn[None,:]
    nd, idx = jax.lax.top_k(-dist, 100)
    return -nd, idx

xf = jnp.asarray(corpus); xn = jnp.sum(xf*xf, -1)
gt = np.concatenate([np.asarray(exact_topk(qd[s:s+256], xf, xn)[1])[:, :k]
                     for s in range(0, nq, 256)])
print("GT done", flush=True)

# bf16 flat exact recall (isolate bf16 effect)
xbn = store.device_norms
flat_ids = np.concatenate([np.asarray(exact_topk(qd[s:s+256].astype(jnp.bfloat16).astype(jnp.float32), store.device.astype(jnp.float32)[:n], xbn[:n])[1])[:, :k] for s in range(0, nq, 256)])
def recall(found):
    return float(np.mean([len(set(found[i].tolist()) & set(gt[i].tolist()))/k for i in range(nq)]))
print("bf16 flat exact recall:", recall(flat_ids), flush=True)

idx = IVFPQIndex(store, {"ncentroids": nlist, "nsubvector": m})
t0=time.time(); idx.train(corpus[:nlist*256]); print("train", time.time()-t0, flush=True)
ids = np.arange(n, dtype=np.int64)
for s in range(0, n, 65536):
    e = min(n, s+65536)
    idx.add(corpus[s:e], ids[s:e], ids[s:e])
print("added", flush=True)

pen = jnp.zeros(store.device.shape[0], jnp.float32)
def ev(name, **kw):
    sp = SearchParams.from_dict(dict(scan_mode="dense", has_rank=True, **kw))
    found = np.concatenate([np.asarray(idx.search(qd[s:s+256], pen, sp, k)[1])
                            for s in range(0, nq, 256)])
    print(f"{name}: recall@10 = {recall(found):.4f}", flush=True)

ev("dense r100 rt0.95", recall_num=100, recall_target=0.95)
ev("dense r100 rt0.999", recall_num=100, recall_target=0.999)
ev("dense r500 rt0.95", recall_num=500, recall_target=0.95)
ev("dense r1000 rt0.999", recall_num=1000, recall_target=0.999)

# exact top-k on recon distances (no approx): isolate PQ error
@jax.jit
def recon_exact(qb, kk=100):
    cross = jax.lax.dot_general(qb.astype(jnp.bfloat16), idx.recon,
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    dist = jnp.sum(qb*qb,-1,keepdims=True) - 2*cross + idx.recon_norms[None,:] + idx.recon_valid[None,:]
    nd, ridx = jax.lax.top_k(-dist, 100)
    rows = jnp.take(store.device, jnp.maximum(ridx,0), axis=0).astype(jnp.float32)
    ex = jnp.sum((qb[:,None,:]-rows)**2, -1)
    env, sel = jax.lax.top_k(-ex, k)
    return jnp.take_along_axis(ridx, sel, axis=1)
found = np.concatenate([np.asarray(recon_exact(qd[s:s+256])) for s in range(0, nq, 256)])
print("recon exact-topk r100 + rerank:", recall(found), flush=True)
