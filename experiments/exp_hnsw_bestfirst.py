"""Measure the best-first HNSW beam search at the bench's secondary
geometry (200k x 128): recall@10 + QPS at efSearch {64, 128}.
r5a baseline (re-score-all beam): 486 QPS @ recall@10 0.9219."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")
import numpy as np, jax, jax.numpy as jnp
from bench import make_corpus, host_gt

def measure_qps(fn, iters=10, reps=2, rows=1024):
    best = 0.0
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0][:1])
        best = max(best, iters * rows / (time.time() - t0))
    return best
from gamma_tpu.config import SearchParams
from gamma_tpu.vector.raw_store import RawVectorStore
from gamma_tpu.index.hnsw import HNSWIndex

n2, d, nq2, b2, k = 200_000, 128, 256, 1024, 10
rng = np.random.default_rng(7)
corpus, _ = make_corpus(1_000_000, d, 1024, rng)
x2 = np.ascontiguousarray(corpus[:n2])
q2 = (x2[rng.choice(n2, nq2, replace=False)]
      + 0.5 * rng.normal(size=(nq2, d))).astype(np.float32)
gt2 = host_gt(x2, q2, k)
qd2 = jnp.asarray(q2)
qb2 = qd2[np.arange(b2) % nq2]
ids2 = np.arange(n2, dtype=np.int64)

s2 = RawVectorStore("sec", d, init_cap=n2 + 1024)
s2.add(x2); s2.flush_device()
t0 = time.time()
ih = HNSWIndex(s2, {"nlinks": 32, "efSearch": 64})
ih.add(x2, ids2, ids2)
print(f"build: {time.time()-t0:.1f}s", flush=True)
pen = jnp.zeros(s2.device.shape[0], jnp.float32)
for ef in (64, 128):
    sp = SearchParams.from_dict({"ef_search": ef})
    found = []
    for s_ in range(0, nq2, 128):
        _, docs, _ = ih.search(qd2[s_: s_+128], pen, sp, k)
        found.append(np.asarray(docs))
    found = np.concatenate(found)
    rec = float(np.mean([len(set(found[i].tolist()) & set(gt2[i].tolist())) / k
                         for i in range(nq2)]))
    jax.block_until_ready(ih.search(qb2, pen, sp, k)[0])
    q_ = measure_qps(lambda: ih.search(qb2, pen, sp, k), iters=10, reps=2, rows=b2)
    print(f"ef={ef}: {q_:,.0f} QPS @ recall@10 {rec:.4f}", flush=True)
