"""Profile insert path + recall sweep at 1M with the manifold geometry."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

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

store = RawVectorStore("vec", d)
t0 = time.time(); store.add(corpus); print(f"host add {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); store.flush_device(); jax.block_until_ready(store.device)
print(f"flush_device {time.time()-t0:.1f}s", flush=True)

@jax.jit
def exact_topk(qb, x, xn):
    cross = jax.lax.dot_general(qb, x, dimension_numbers=(((1,),(1,)),((),())),
                                preferred_element_type=jnp.float32)
    dist = jnp.sum(qb*qb,-1,keepdims=True) - 2*cross + xn[None,:]
    nd, idx = jax.lax.top_k(-dist, k)
    return idx
xf = jnp.asarray(corpus); xn = jnp.sum(xf*xf, -1)
t0 = time.time()
gt = np.concatenate([np.asarray(exact_topk(qd[s:s+256], xf, xn))
                     for s in range(0, nq, 256)])
print(f"GT {time.time()-t0:.1f}s", flush=True)
del xf, xn

idx = IVFPQIndex(store, {"ncentroids": nlist, "nsubvector": m})
t0 = time.time(); idx.train(corpus[: nlist*256]); print(f"train {time.time()-t0:.1f}s", flush=True)

# profiled add
ids = np.arange(n, dtype=np.int64)
t_enc = t_place = t_app = 0.0
t0 = time.time()
for s in range(0, n, 65536):
    e = min(n, s + 65536)
    t1 = time.time()
    rows = store.device_rows(s, e)
    lids, codes, recon, rnorms = idx.encode_batch(rows)
    jax.block_until_ready(codes)
    t2 = time.time(); t_enc += t2 - t1
    # inline the rest of add()
    need = idx.placer.required_cap(lids)
    if need > idx.state.cap:
        cap2 = idx.state.cap
        while cap2 < need: cap2 *= 2
        from gamma_tpu.realtime import invert_index as rt
        idx.state = rt.grow(idx.state, cap2); idx.placer.cap = cap2
    positions, new_lens = idx.placer.place(lids, ids[s:e])
    t3 = time.time(); t_place += t3 - t2
    n_pad = codes.shape[0]
    def padded(a):
        out = np.full(n_pad, -1, np.int32); out[: e-s] = a
        return jnp.asarray(out)
    from gamma_tpu.realtime import invert_index as rt
    vids_d = padded(ids[s:e])
    idx.state = rt.append(idx.state, padded(lids), padded(positions), codes,
                          vids_d, padded(ids[s:e]), jnp.asarray(new_lens, jnp.int32))
    idx._grow_recon(e)
    from gamma_tpu.index.ivfpq import _recon_append, _valid_set
    idx.recon, idx.recon_norms, idx.recon_bias = _recon_append(
        idx.recon, idx.recon_norms, idx.recon_bias, vids_d, recon, rnorms)
    idx.recon_valid = _valid_set(idx.recon_valid, vids_d, 0.0)
    jax.block_until_ready(idx.state.lens)
    t_app += time.time() - t3
idx.indexed_count = n
dt = time.time() - t0
print(f"add total {dt:.1f}s ({n/dt:,.0f}/s): encode {t_enc:.1f} place {t_place:.1f} append {t_app:.1f}", flush=True)

pen = jnp.zeros(store.device.shape[0], jnp.float32)
def recall(found):
    return float(np.mean([len(set(found[i].tolist()) & set(gt[i].tolist()))/k
                          for i in range(nq)]))
def ev(name, **kw):
    sp = SearchParams.from_dict(dict(scan_mode="dense", has_rank=True, **kw))
    t0 = time.time()
    found = np.concatenate([np.asarray(idx.search(qd[s:s+256], pen, sp, k)[1])
                            for s in range(0, nq, 256)])
    # steady QPS
    sp2 = SearchParams.from_dict(dict(scan_mode="dense", has_rank=True, **kw))
    t0 = time.time()
    for _ in range(20):
        out = idx.search(qd[:256], pen, sp2, k)
    _ = np.asarray(out[0])
    qps = 20*256/(time.time()-t0)
    print(f"{name}: recall@10={recall(found):.4f} QPS={qps:,.0f}", flush=True)

ev("r100 rt0.95", recall_num=100, recall_target=0.95)
ev("r100 rt0.99", recall_num=100, recall_target=0.99)
ev("r200 rt0.99", recall_num=200, recall_target=0.99)
ev("r400 rt0.99", recall_num=400, recall_target=0.99)
