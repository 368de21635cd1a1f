"""Grouped vs gather IVFFlat scan on the real chip (r5).

Measures the secondary-bench geometry (200k x 128, nlist=1024,
nprobe=80, batch 1024): XLA per-query gather path vs the grouped
pallas row kernel, QPS + recall@10 vs f64 host GT.
"""
import os, time
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")
import jax
import jax.numpy as jnp

from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfflat import IVFFlatIndex
from gamma_tpu.vector.raw_store import RawVectorStore

def main():
    rng = np.random.default_rng(0)
    n, d, nq, b, nlist, nprobe, k = 200_000, 128, 256, 1024, 1024, 80, 10
    nclu = 1000
    centers = rng.normal(size=(nclu, 16)).astype(np.float32)
    proj = rng.normal(size=(16, d)).astype(np.float32) / 4.0
    a = rng.integers(0, nclu, size=n)
    x = (centers[a] + 0.25 * rng.normal(size=(n, 16)).astype(np.float32)) @ proj
    x += 0.05 * rng.normal(size=(n, d)).astype(np.float32)
    x = np.ascontiguousarray(x, np.float32)
    rng.shuffle(x)
    q = (x[rng.choice(n, nq, replace=False)]
         + 0.02 * rng.normal(size=(nq, d))).astype(np.float32)
    dd = ((q[:, None, :1] * 0)) # placeholder
    # f64 GT
    gt = np.empty((nq, k), np.int64)
    xf = x.astype(np.float64)
    for i in range(nq):
        dist = ((xf - q[i].astype(np.float64)) ** 2).sum(-1)
        gt[i] = np.argsort(dist)[:k]

    store = RawVectorStore("ivfflat_exp", d, init_cap=n + 1024)
    store.add(x)
    store.flush_device()
    idx = IVFFlatIndex(store, {"ncentroids": nlist, "nprobe": nprobe,
                               "bucket_init_size": max(256, 4 * n // nlist)})
    idx.train(x[:nlist * 64])
    ids = np.arange(n, dtype=np.int64)
    for s in range(0, n, 50_000):
        e = min(n, s + 50_000)
        idx.add(x[s:e], ids[s:e], ids[s:e])
    pen = jnp.zeros(n + 64, jnp.float32)
    sp = SearchParams.from_dict({"nprobe": nprobe})
    qd = jnp.asarray(q)
    qb = qd[np.arange(b) % nq]

    from gamma_tpu.ops import ivf_scan
    from gamma_tpu.utils.growth import ladder_256
    ce = ladder_256(max(idx._max_len, 1), idx.state.cap)
    print("cap", idx.state.cap, "max_len", idx._max_len, "cap_eff", ce)

    for impl in ("pallas", "xla"):
        def run(qq):
            return ivf_scan.ivfflat_search(
                idx.state, idx.centroids, idx.cent_norms, qq, pen,
                nprobe=nprobe, k=k, d=d, metric="l2", scan_impl=impl,
                cap_eff=ce)
        t0 = time.time()
        out = run(qd[:128])
        jax.block_until_ready(out)
        print(impl, "compile+first:", round(time.time() - t0, 1), "s")
        found = []
        for s in range(0, nq, 128):
            _, docs, _ = run(qd[s:s+128])
            found.append(np.asarray(docs))
        found = np.concatenate(found)
        rec = float(np.mean([len(set(found[i].tolist()) & set(gt[i].tolist())) / k
                             for i in range(nq)]))
        # timed: queue iters then force one real device->host read
        out = run(qb); jax.block_until_ready(out)
        t0 = time.time()
        iters = 10
        for _ in range(iters):
            out = run(qb)
        _ = np.asarray(out[0][:1])
        dt = time.time() - t0
        print(f"{impl}: {iters * b / dt:,.0f} QPS @ recall@10 {rec:.4f}")

if __name__ == "__main__":
    main()
