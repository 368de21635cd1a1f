"""10M SQ8 capacity tier: where did the recall go (0.9918 dense ->
0.9734 gather, BENCH_r04) and what does QPS cost to get it back?

Sweeps, on the real cached 10M corpus (bench-identical data + GT):
  * nprobe 64 vs 80 (reference SIFT10M runs nprobe=80, benchs/README.md)
  * the wide-width select: approx pool 256@0.99 (r4 shipping config) vs
    bigger pools / higher recall_target / f32 cross term
  * list balance: default kmeans (rebalance=2) vs rebalance=4 — cap_eff
    drives both the scan width and the [G, Q, cap] grouped buffer.
"""

import functools
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
from gamma_tpu.ops import ivf_scan as iv
from gamma_tpu.ops.distances import BIG
from gamma_tpu.ops.pallas_gsq import grouped_sq_scan
from gamma_tpu.vector.raw_store import RawVectorStore


def _force(out):
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])


def main():
    n10, d, nq10, k, nlist, m, nprobe = (10_000_000, 128, 256, 10, 2048,
                                         32, 64)
    rng = np.random.default_rng(0)
    corpus10, _ = bench.make_corpus(n10, d, 1024, rng)
    q10 = corpus10[rng.choice(n10, nq10, replace=False)] + \
        0.5 * rng.normal(size=(nq10, d)).astype(np.float32)
    q10 = q10.astype(np.float32)
    gt10 = bench.host_gt(corpus10, q10, k)
    qd10 = jnp.asarray(q10)
    print("data ready", flush=True)

    def build(rebalance=None):
        store = RawVectorStore("vec10", d, device_dtype=jnp.bfloat16,
                               init_cap=n10 + 1024)
        store.add(corpus10)
        store.flush_device()
        idx = IVFPQIndex(store, {
            "ncentroids": nlist, "nsubvector": m, "nprobe": nprobe,
            "gather_payload": "pq",
            "bucket_init_size": max(1024, 3 * n10 // nlist)})
        t0 = time.time()
        if rebalance is None:
            idx.train(store.device_rows(0, nlist * 256))
        else:
            from gamma_tpu.ops import kmeans as km
            from gamma_tpu.ops.distances import l2_norms
            xd = store.device_rows(0, nlist * 256).astype(jnp.float32)
            cents, _ = km.kmeans(xd, nlist, iters=10, seed=0,
                                 rebalance=rebalance)
            idx.train(store.device_rows(0, nlist * 256),
                      coarse=(cents, l2_norms(cents)))
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
        store.release_device()
        lens_np = np.asarray(idx.state.lens)
        print(f"sidecar: {time.time()-t0:.1f}s active={ok} "
              f"max_len={lens_np.max()} mean={lens_np.mean():.0f} "
              f"cap_eff={idx._cap_eff()}", flush=True)
        return store, idx

    store, idx = build()
    ce = idx._cap_eff()
    state_t = iv._trim_state(idx.state, ce)
    # sidecar may be narrower than the posting trim
    ce = min(ce, idx.sq_codes.shape[1])
    docids_ce = state_t.docids[:, :ce]
    vids_ce = state_t.vids[:, :ce]
    lens_d = idx.state.lens
    bias = iv.list_bias(docids_ce, lens_d, ce, penalty=None,
                        live_n=jnp.int32(n10))
    doc_flat = docids_ce.reshape(-1)

    # big arrays ride as jit ARGS (closure constants ship in the
    # remote-compile request body — HTTP 413 at 10M scale)
    @functools.partial(jax.jit,
                       static_argnames=("p", "pool", "rt", "precise",
                                        "exact"))
    def scan_sel(sqc, sqn, docf, bias_, q, *, p, pool, rt,
                 precise=False, exact=False):
        cd, lids = iv.coarse_assign(q, idx.centroids, idx.cent_norms,
                                    p, "l2")
        dist = grouped_sq_scan(
            sqc, sqn, lens_d, lids, q,
            idx.sq_scale, idx.sq_off, centroids=idx.centroids,
            metric="l2", bias=bias_, precise=precise)
        dist = jnp.minimum(dist, BIG)
        b = dist.shape[0]
        flat = dist.reshape(b, -1)
        if exact:
            nd, ridx = jax.lax.top_k(-flat, k)
            rd = -nd
        else:
            vd, vi = jax.lax.approx_min_k(flat, pool, recall_target=rt)
            nd, pos = jax.lax.top_k(-vd, k)
            rd = -nd
            ridx = jnp.take_along_axis(vi, pos, axis=1)
        pidx = ridx // ce
        slot = ridx % ce
        lst = jnp.take_along_axis(lids, pidx, axis=1)
        rdoc = jnp.take(docf, lst * ce + slot)
        return rd, jnp.where(rd >= BIG, -1, rdoc)

    sq_c = idx.sq_codes[:, :ce]
    sq_n = idx.sq_norms[:, :ce]

    def recall(p, pool, rt, precise=False, exact=False):
        outs = []
        for s in range(0, nq10, 64):
            _, docs = scan_sel(sq_c, sq_n, doc_flat, bias,
                               qd10[s: s + 64], p=p, pool=pool, rt=rt,
                               precise=precise, exact=exact)
            outs.append(np.asarray(docs))
        f = np.concatenate(outs)
        return float(np.mean([
            len(set(f[i].tolist()) & set(gt10[i].tolist())) / k
            for i in range(nq10)]))

    for tag, kw in (
            ("p64 pool256@0.99 (r4 ship)", dict(p=64, pool=256, rt=0.99)),
            ("p64 pool1024@0.99", dict(p=64, pool=1024, rt=0.99)),
            ("p64 pool4096@0.99", dict(p=64, pool=4096, rt=0.99)),
            ("p64 exact top_k", dict(p=64, pool=0, rt=0.99, exact=True)),
            ("p64 pool1024 precise", dict(p=64, pool=1024, rt=0.99,
                                          precise=True)),
            ("p80 pool256@0.99", dict(p=80, pool=256, rt=0.99)),
            ("p80 pool1024@0.99", dict(p=80, pool=1024, rt=0.99)),
            ("p96 pool1024@0.99", dict(p=96, pool=1024, rt=0.99)),
    ):
        t0 = time.time()
        r = recall(**kw)
        print(f"recall {tag:28s}: {r:.4f}  ({time.time()-t0:.0f}s)",
              flush=True)

    # ---- QPS at the contending configs (batch 512; the od4 shipping
    # width) ----
    def qps(bsz, p, pool, rt, exact=False, iters=5):
        qb = qd10[np.arange(bsz) % nq10]
        _force(scan_sel(sq_c, sq_n, doc_flat, bias, qb, p=p, pool=pool,
                        rt=rt, exact=exact))
        t0 = time.time()
        for _ in range(iters):
            out = scan_sel(sq_c, sq_n, doc_flat, bias, qb, p=p,
                           pool=pool, rt=rt, exact=exact)
        _force(out)
        return bsz * iters / (time.time() - t0)

    for tag, args in (
            ("B512 p64 pool256", (512, 64, 256, 0.99)),
            ("B512 p64 pool1024", (512, 64, 1024, 0.99)),
            ("B512 p80 pool1024", (512, 80, 1024, 0.99)),
            ("B768 p80 pool1024", (768, 80, 1024, 0.99)),
    ):
        try:
            print(f"qps {tag:22s}: {qps(*args):,.0f}", flush=True)
        except Exception as exc:
            print(f"qps {tag:22s}: FAILED {exc!r}", flush=True)

    # ---- balance: rebalance=4 rebuild ----
    del store, idx, state_t, docids_ce, vids_ce, bias, doc_flat
    del scan_sel, sq_c, sq_n
    import gc
    gc.collect()
    store, idx = build(rebalance=4)
    ce = min(idx._cap_eff(), idx.sq_codes.shape[1])
    print(f"rebalance=4: cap_eff={ce}", flush=True)
    pen = jnp.zeros(8, jnp.float32)   # unused w/ validity path
    sp = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 80})
    found = []
    pen10 = jnp.zeros(n10, jnp.float32)
    for s in range(0, nq10, 64):
        _, docs, _ = idx.search(qd10[s: s + 64], pen10, sp, k,
                                validity_n=n10)
        found.append(np.asarray(docs))
    f = np.concatenate(found)
    r = float(np.mean([len(set(f[i].tolist()) & set(gt10[i].tolist())) / k
                       for i in range(nq10)]))
    qb = qd10[np.arange(512) % nq10]
    _force(idx.search(qb, pen10, sp, k, validity_n=n10))
    t0 = time.time()
    for _ in range(5):
        out = idx.search(qb, pen10, sp, k, validity_n=n10)
    _force(out)
    print(f"rebalanced engine-path p80: recall {r:.4f}  "
          f"{512 * 5 / (time.time() - t0):,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
