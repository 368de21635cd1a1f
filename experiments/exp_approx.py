"""Characterize ApproxTopK candidate loss in the production dense path."""
import sys, time, functools
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

sys.path.insert(0, "/root/repo")
from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.ops.dense_scan import dense_scan_search
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
    return jax.lax.top_k(-dist, kk)[1]

xf = jnp.asarray(corpus); xn = jnp.sum(xf*xf, -1)
gt = np.concatenate([np.asarray(exact_topk(qd[s:s+256], xf, xn, k))
                     for s in range(0, nq, 256)])
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

def run(rt, r):
    sp = SearchParams.from_dict(dict(scan_mode="dense", recall_num=r,
                                     recall_target=rt))
    found = np.concatenate([np.asarray(idx.search(qd[s:s+256], pen, sp, k)[1])
                            for s in range(0, nq, 256)])
    per_q = np.array([len(set(found[i].tolist()) & set(gt[i].tolist()))/k
                      for i in range(nq)])
    # QPS
    t0 = time.time()
    for _ in range(20):
        out = idx.search(qd[:256], pen, sp, k)
    _ = np.asarray(out[0])
    qps = 20*256/(time.time()-t0)
    hist = np.bincount((per_q*10).astype(int), minlength=11)
    print(f"rt={rt} r={r}: recall={per_q.mean():.4f} QPS={qps:,.0f} "
          f"perfect={hist[10]}/{nq} miss1={hist[9]} miss>=2={hist[:9].sum()}",
          flush=True)

run(0.95, 100)
run(0.99, 100)


# exact-topk candidate selection inside the same pipeline (upper bound)
@functools.partial(jax.jit, static_argnames=('r',))
def exact_pipe(qb, r):
    cross = jax.lax.dot_general(qb.astype(jnp.bfloat16), idx.recon,
        dimension_numbers=(((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    dist = (jnp.sum(qb*qb,-1,keepdims=True) - 2*cross
            + idx.recon_norms[None,:] + idx.recon_valid[None,:] + pen[None,:])
    nd, ridx = jax.lax.top_k(-dist, r)
    rows = jnp.take(store.device, jnp.maximum(ridx,0), axis=0)
    ex = jnp.sum((qb[:,None,:]-rows)**2, -1)
    env, sel = jax.lax.top_k(-ex, k)
    return jnp.take_along_axis(ridx, sel, axis=1)
t0=time.time()
found = np.concatenate([np.asarray(exact_pipe(qd[s:s+256], 100))
                        for s in range(0, nq, 256)])
per_q = np.array([len(set(found[i].tolist()) & set(gt[i].tolist()))/k
                  for i in range(nq)])
for _ in range(20):
    out = exact_pipe(qd[:256], 100)
_ = np.asarray(out)
qps = 20*256/(time.time()-t0)
print(f"exact-topk pipeline: recall={per_q.mean():.4f} (QPS incl recall eval={qps:,.0f})", flush=True)
