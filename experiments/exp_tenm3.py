"""10M capacity tier, round 3: the SHIPPING path (ivfsq_search with the
chunked-min select, optional sq_rerank) at rebalance=6 — recall + QPS +
HBM feasibility at B=512.  Decides the bench 10M config."""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

import bench
from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.vector.raw_store import RawVectorStore


def _force(out):
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])


def head_gb():
    try:
        st = jax.devices()[0].memory_stats()
        return (st["bytes_limit"] - st["bytes_in_use"]) / 2 ** 30
    except Exception:
        return None


def main():
    n10, d, nq10, k, nlist, m = 10_000_000, 128, 256, 10, 2048, 32
    rng = np.random.default_rng(0)
    corpus10, _ = bench.make_corpus(n10, d, 1024, rng)
    q10 = corpus10[rng.choice(n10, nq10, replace=False)] + \
        0.5 * rng.normal(size=(nq10, d)).astype(np.float32)
    q10 = q10.astype(np.float32)
    gt10 = bench.host_gt(corpus10, q10, k)
    qd10 = jnp.asarray(q10)
    print("data ready", flush=True)

    store = RawVectorStore("vec10", d, device_dtype=jnp.bfloat16,
                           init_cap=n10 + 1024)
    store.add(corpus10)
    store.flush_device()
    idx = IVFPQIndex(store, {
        "ncentroids": nlist, "nsubvector": m, "nprobe": 64,
        "gather_payload": "pq", "train_rebalance": 6,
        "bucket_init_size": max(1024, 3 * n10 // nlist)})
    t0 = time.time()
    idx.train(store.device_rows(0, nlist * 256))
    print(f"train: {time.time()-t0:.1f}s", flush=True)
    ids10 = np.arange(n10, dtype=np.int64)
    t0 = time.time()
    for s in range(0, n10, 65536):
        e = min(n10, s + 65536)
        idx.add(store.device_rows(s, e), ids10[s:e], ids10[s:e])
    jax.block_until_ready(idx.state.lens)
    print(f"add: {time.time()-t0:.1f}s", flush=True)
    idx.release_recon()
    t0 = time.time()
    ok = idx.build_sq_sidecar()
    lens_np = np.asarray(idx.state.lens)
    print(f"sidecar: {time.time()-t0:.1f}s active={ok} "
          f"max_len={lens_np.max()} mean={lens_np.mean():.0f} "
          f"cap_eff={idx._cap_eff()} head={head_gb()}", flush=True)

    pen10 = jnp.zeros(n10, jnp.float32)

    def run(sp, bsz, tag, iters=5):
        found = []
        try:
            for s in range(0, nq10, 64):
                _, docs, _ = idx.search(qd10[s: s + 64], pen10, sp, k,
                                        validity_n=n10)
                found.append(np.asarray(docs))
            f = np.concatenate(found)
            rec = float(np.mean([
                len(set(f[i].tolist()) & set(gt10[i].tolist())) / k
                for i in range(nq10)]))
            qb = qd10[np.arange(bsz) % nq10]
            _force(idx.search(qb, pen10, sp, k, validity_n=n10))
            t0 = time.time()
            for _ in range(iters):
                out = idx.search(qb, pen10, sp, k, validity_n=n10)
            _force(out)
            q_ = bsz * iters / (time.time() - t0)
            print(f"{tag:34s}: recall {rec:.4f}  {q_:,.0f} QPS "
                  f"(B={bsz}, head={head_gb()})", flush=True)
        except Exception as exc:
            print(f"{tag:34s}: FAILED {exc!r}", flush=True)
            gc.collect()

    sp0 = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 64,
                                  "recall_num": 100})
    sp1 = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 64,
                                  "recall_num": 100, "sq_rerank": True})
    run(sp0, 512, "chunkmin norerank B512")
    run(sp1, 512, "chunkmin +rr100 B512")
    run(sp1, 768, "chunkmin +rr100 B768")
    sp2 = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 80,
                                  "recall_num": 100, "sq_rerank": True})
    run(sp2, 512, "chunkmin +rr100 p80 B512")


if __name__ == "__main__":
    main()
