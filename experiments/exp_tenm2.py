"""10M capacity tier, round 2: rebalanced lists + high-recall_target
pooled select + exact rerank from the KEPT bf16 store mirror.

exp_tenm.py findings this builds on:
  * nprobe is saturated at 64 on this corpus (p80/p96 identical);
  * the approx pool's recall_target drives the loss (bin count): pool256
    @0.99 = 0.9734, pool1024 @0.99 = 0.9855, exact select = 0.9891;
  * the remaining 0.9891 -> 0.9918 gap is SQ8 quantization — only an
    exact rerank recovers it;
  * pool-size-1024 @0.99 HALVED QPS (5,420 -> 2,840 at B=512) — buy
    recall with recall_target (more bins), not pool width;
  * cap_eff=14648 at 3x mean drives both scan cost and the [G, Q, cap]
    buffer (p80/B768 OOM'd).
"""

import functools
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
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.ops import ivf_scan as iv
from gamma_tpu.ops.distances import BIG
from gamma_tpu.ops.pallas_gsq import grouped_sq_scan
from gamma_tpu.vector.raw_store import RawVectorStore


def _force(out):
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])


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
        "gather_payload": "pq",
        "bucket_init_size": max(1024, 3 * n10 // nlist)})
    from gamma_tpu.ops import kmeans as km
    from gamma_tpu.ops.distances import l2_norms
    t0 = time.time()
    xd = store.device_rows(0, nlist * 256).astype(jnp.float32)
    cents, _ = km.kmeans(xd, nlist, iters=10, seed=0, rebalance=6)
    idx.train(store.device_rows(0, nlist * 256),
              coarse=(cents, l2_norms(cents)))
    del xd, cents
    print(f"train(rebalance=6): {time.time()-t0:.1f}s", flush=True)
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
    # KEEP the bf16 store mirror: the rerank stage reads it (2.6 GB)
    lens_np = np.asarray(idx.state.lens)
    print(f"sidecar: {time.time()-t0:.1f}s active={ok} "
          f"max_len={lens_np.max()} mean={lens_np.mean():.0f} "
          f"cap_eff={idx._cap_eff()}", flush=True)

    ce = min(idx._cap_eff(), idx.sq_codes.shape[1])
    state_t = iv._trim_state(idx.state, ce)
    docids_ce = state_t.docids[:, :ce]
    vids_ce = state_t.vids[:, :ce]
    lens_d = idx.state.lens
    bias = iv.list_bias(docids_ce, lens_d, ce, penalty=None,
                        live_n=jnp.int32(n10))
    doc_flat = docids_ce.reshape(-1)
    vid_flat = vids_ce.reshape(-1)

    @functools.partial(jax.jit,
                       static_argnames=("p", "pool", "rt", "rr", "exact"))
    def scan_sel(sqc, sqn, docf, vidf, bias_, raw, q, *, p, pool, rt,
                 rr=0, exact=False):
        """SQ8 scan -> pooled/exact select of max(rr, k) -> optional
        exact rerank from the bf16 mirror."""
        cd, lids = iv.coarse_assign(q, idx.centroids, idx.cent_norms,
                                    p, "l2")
        dist = grouped_sq_scan(
            sqc, sqn, lens_d, lids, q,
            idx.sq_scale, idx.sq_off, centroids=idx.centroids,
            metric="l2", bias=bias_)
        dist = jnp.minimum(dist, BIG)
        b = dist.shape[0]
        flat = dist.reshape(b, -1)
        sel = max(rr, k)
        if exact:
            nd, ridx = jax.lax.top_k(-flat, sel)
            rd = -nd
        else:
            vd, vi = jax.lax.approx_min_k(flat, pool, recall_target=rt)
            nd, pos = jax.lax.top_k(-vd, sel)
            rd = -nd
            ridx = jnp.take_along_axis(vi, pos, axis=1)
        pidx = ridx // ce
        slot = ridx % ce
        lst = jnp.take_along_axis(lids, pidx, axis=1)
        lin = lst * ce + slot
        rdoc = jnp.take(docf, lin)
        rdoc = jnp.where(rd >= BIG, -1, rdoc)
        if not rr:
            return rd[:, :k], rdoc[:, :k]
        rvid = jnp.where(rd >= BIG, -1, jnp.take(vidf, lin))
        ed, edoc, _ = iv.rerank_rows(
            q, rd, rdoc, rvid,
            jnp.take(raw, jnp.clip(rvid, 0, raw.shape[0] - 1), axis=0),
            k=k, metric="l2")
        return ed, edoc

    sq_c = idx.sq_codes[:, :ce]
    sq_n = idx.sq_norms[:, :ce]

    def recall(**kw):
        outs = []
        for s in range(0, nq10, 64):
            _, docs = scan_sel(sq_c, sq_n, doc_flat, vid_flat, bias,
                               store.device, qd10[s: s + 64], **kw)
            outs.append(np.asarray(docs))
        f = np.concatenate(outs)
        return float(np.mean([
            len(set(f[i].tolist()) & set(gt10[i].tolist())) / k
            for i in range(nq10)]))

    for tag, kw in (
            ("p64 pool256@0.99 (r4)", dict(p=64, pool=256, rt=0.99)),
            ("p64 pool256@0.999", dict(p=64, pool=256, rt=0.999)),
            ("p64 pool256@0.9995", dict(p=64, pool=256, rt=0.9995)),
            ("p64 pool256@0.999 +rr100",
             dict(p=64, pool=256, rt=0.999, rr=100)),
            ("p64 pool512@0.999 +rr100",
             dict(p=64, pool=512, rt=0.999, rr=100)),
            ("p64 exact +rr100", dict(p=64, pool=0, rt=0.99, rr=100,
                                      exact=True)),
    ):
        t0 = time.time()
        try:
            r = recall(**kw)
            print(f"recall {tag:26s}: {r:.4f}  ({time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"recall {tag:26s}: FAILED {exc!r}", flush=True)

    def qps(bsz, iters=5, **kw):
        qb = qd10[np.arange(bsz) % nq10]
        _force(scan_sel(sq_c, sq_n, doc_flat, vid_flat, bias,
                        store.device, qb, **kw))
        t0 = time.time()
        for _ in range(iters):
            out = scan_sel(sq_c, sq_n, doc_flat, vid_flat, bias,
                           store.device, qb, **kw)
        _force(out)
        return bsz * iters / (time.time() - t0)

    for tag, bsz, kw in (
            ("B512 pool256@0.99", 512, dict(p=64, pool=256, rt=0.99)),
            ("B512 pool256@0.999", 512, dict(p=64, pool=256, rt=0.999)),
            ("B512 pool256@0.999+rr100", 512,
             dict(p=64, pool=256, rt=0.999, rr=100)),
            ("B1024 pool256@0.999+rr100", 1024,
             dict(p=64, pool=256, rt=0.999, rr=100)),
    ):
        try:
            print(f"qps {tag:28s}: {qps(bsz, **kw):,.0f}", flush=True)
        except Exception as exc:
            print(f"qps {tag:28s}: FAILED {exc!r}", flush=True)


if __name__ == "__main__":
    main()
