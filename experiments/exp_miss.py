"""Which GT rank goes missing, and does exact-topk selection fix it?"""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

sys.path.insert(0, "/root/repo")
from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.vector.raw_store import RawVectorStore
from bench import make_corpus

n, d, nq, k = 1_000_000, 128, 512, 10
nlist, m = 2048, 32
rng = np.random.default_rng(0)
corpus = make_corpus(n, d, 1024, rng)
queries = (corpus[rng.choice(n, nq, replace=False)]
           + 0.5 * rng.normal(size=(nq, d)).astype(np.float32)).astype(np.float32)
qd = jnp.asarray(queries)
store = RawVectorStore("vec", d, device_dtype=jnp.float32)
store.add(corpus); store.flush_device()

@functools.partial(jax.jit, static_argnames=('kk',))
def exact_topk(qb, x, xn, kk):
    cross = jax.lax.dot_general(qb, x, dimension_numbers=(((1,),(1,)),((),())),
                                preferred_element_type=jnp.float32)
    dist = jnp.sum(qb*qb,-1,keepdims=True) - 2*cross + xn[None,:]
    nd, ii = jax.lax.top_k(-dist, kk)
    return -nd, ii

xf = jnp.asarray(corpus); xn = jnp.sum(xf*xf, -1)
gt_d, gt = [], []
for s in range(0, nq, 256):
    ddv, ii = exact_topk(qd[s:s+256], xf, xn, 12)
    gt_d.append(np.asarray(ddv)); gt.append(np.asarray(ii))
gt = np.concatenate(gt); gt_d = np.concatenate(gt_d)
del xf, xn
print("GT ok", flush=True)

idx = IVFPQIndex(store, {"ncentroids": nlist, "nsubvector": m,
                         "bucket_init_size": 4*n//nlist})
idx.train(corpus[:nlist*256])
ids = np.arange(n, dtype=np.int64)
for s in range(0, n, 65536):
    e = min(n, s+65536)
    idx.add(store.device_rows(s, e), ids[s:e], ids[s:e])
print("built", flush=True)
pen = jnp.zeros(store.device.shape[0], jnp.float32)

sp = SearchParams.from_dict(dict(scan_mode="dense", recall_num=100,
                                 recall_target=0.95))
found = np.concatenate([np.asarray(idx.search(qd[s:s+256], pen, sp, k)[1])
                        for s in range(0, nq, 256)])
rank_hist = np.zeros(12, int)
gap_when_miss = []
for i in range(nq):
    missing = set(gt[i, :k].tolist()) - set(found[i].tolist())
    for mm in missing:
        r = list(gt[i]).index(mm)
        rank_hist[r] += 1
        if r >= 1:
            gap_when_miss.append(gt_d[i, min(r+1, 11)] - gt_d[i, r])
print("missing-GT rank histogram (0=top1):", rank_hist.tolist(), flush=True)
print("boundary gap when missing (gt[r+1]-gt[r]):",
      np.percentile(gap_when_miss, [10, 50, 90]) if gap_when_miss else "n/a",
      flush=True)

# exact-topk candidate selection control (args passed, not closed over)
@functools.partial(jax.jit, static_argnames=('r',))
def exact_pipe(qb, recon, rnorms, rvalid, raw, pen, r):
    cross = jax.lax.dot_general(qb.astype(jnp.bfloat16), recon,
        dimension_numbers=(((1,),(1,)),((),())),
        preferred_element_type=jnp.float32)
    dist = (jnp.sum(qb*qb,-1,keepdims=True) - 2*cross
            + rnorms[None,:] + rvalid[None,:] + pen[None,:])
    nd, ridx = jax.lax.top_k(-dist, r)
    rows = jnp.take(raw, jnp.maximum(ridx,0), axis=0)
    ex = jnp.sum((qb[:,None,:]-rows)**2, -1)
    env, sel = jax.lax.top_k(-ex, k)
    return jnp.take_along_axis(ridx, sel, axis=1)

found2 = np.concatenate([
    np.asarray(exact_pipe(qd[s:s+256], idx.recon, idx.recon_norms,
                          idx.recon_valid, store.device, pen, 100))
    for s in range(0, nq, 256)])
rec2 = np.mean([len(set(found2[i].tolist()) & set(gt[i, :k].tolist()))/k
                for i in range(nq)])
print(f"exact-topk pipeline recall: {rec2:.4f}", flush=True)
