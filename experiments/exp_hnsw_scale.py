"""HNSW graph build at multi-million rows on one chip.

Round-2 verdict: the exact self-join build materialized a [chunk, N]
distance tile (160 GB @ 10M) and re-ran O(N²d) per growth — the graph
build OOM'd in the low millions.  Round 3: the inner axis is tiled
(bounded transient) and past CLUSTER_BUILD_N the build switches to the
clustered partition self-join, O(N·capm·d).

This measures a 5M-row (env N) build end to end on the real chip and
spot-checks search recall vs a brute-force oracle on 64 queries.

Usage: python experiments/exp_hnsw_scale.py   [N=5000000 D=128]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import numpy as np


def main():
    n = int(os.environ.get("N", 5_000_000))
    d = int(os.environ.get("D", 128))
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")
    import jax.numpy as jnp
    from gamma_tpu.config import SearchParams
    from gamma_tpu.index.hnsw import HNSWIndex
    from gamma_tpu.vector.raw_store import RawVectorStore

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    print(f"devices={jax.devices()} n={n} d={d}", flush=True)

    rng = np.random.default_rng(0)
    # clustered low-intrinsic-dim corpus (same geometry as bench.py)
    intrinsic, n_clusters = 16, 1024
    basis = (rng.normal(size=(intrinsic, d)) / np.sqrt(intrinsic)
             ).astype(np.float32)
    centers = (rng.normal(size=(n_clusters, intrinsic)) * 4
               ).astype(np.float32)
    corpus = np.empty((n, d), np.float32)
    for s in range(0, n, 500_000):
        e = min(n, s + 500_000)
        a = rng.integers(0, n_clusters, size=e - s)
        z = centers[a] + rng.normal(size=(e - s, intrinsic)).astype(
            np.float32)
        corpus[s:e] = z @ basis + 0.05 * rng.normal(
            size=(e - s, d)).astype(np.float32)
    rng.shuffle(corpus, axis=0)

    store = RawVectorStore("vec", d, device_dtype=jnp.bfloat16)
    t0 = time.time()
    store.add(corpus)
    store.flush_device()
    print(f"store upload: {time.time()-t0:.1f}s", flush=True)

    idx = HNSWIndex(store, {"nlinks": 32, "efSearch": 128})
    ids = np.arange(n, dtype=np.int64)
    t0 = time.time()
    idx.add(corpus, ids, ids)          # one bulk build
    jax.block_until_ready(idx.links)
    build_s = time.time() - t0
    print(f"build: {build_s:.1f}s for {n:,} rows "
          f"({n/build_s:,.0f} rows/s)", flush=True)

    # spot-check recall vs exact oracle on 64 queries
    qi = rng.choice(n, 64, replace=False)
    queries = corpus[qi] + 0.05 * rng.normal(size=(64, d)).astype(
        np.float32)
    pen = jnp.zeros(store.device.shape[0], jnp.float32)
    sp = SearchParams.from_dict({"efSearch": 128})
    t0 = time.time()
    _, docs, _ = idx.search(jnp.asarray(queries), pen, sp, 10)
    docs = np.asarray(docs)
    search_s = time.time() - t0
    hits = 0
    q64 = queries.astype(np.float64)
    for i in range(64):
        best = None
        for s in range(0, n, 1_000_000):
            e = min(n, s + 1_000_000)
            c = corpus[s:e].astype(np.float64)
            dd = np.sum((c - q64[i]) ** 2, axis=1)
            part = np.argpartition(dd, 10)[:10]
            cand = np.stack([dd[part], part + s])
            best = cand if best is None else np.concatenate(
                [best, cand], axis=1)
        gt = set(best[1][np.argsort(best[0])[:10]].astype(int).tolist())
        hits += len(gt & set(docs[i].tolist()))
    print(f"recall@10 = {hits/640:.4f} "
          f"(64 queries incl. compile {search_s:.1f}s)", flush=True)
    print(f"RESULT n={n} build_s={build_s:.1f} recall={hits/640:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
