"""Grouped SQ8 exact-scan prototype at the 1M bench geometry.

Validates the no-rerank capacity design (ops/pallas_gsq.py) end to end
before wiring it into the engine: recall@10 vs f64 ground truth,
containment ceiling per nprobe, and QPS at B=1024 — target >=20k QPS
at recall@10 >= 0.99 (VERDICT round-3 item 1).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench as benchmod
from gamma_tpu.ops import ivf_scan as iv, kmeans as km
from gamma_tpu.ops.pallas_gsq import train_sq, encode_sq, grouped_sq_scan
from gamma_tpu.ops.distances import BIG, l2_norms
from gamma_tpu.ops.topk import topk_min


def main():
    n, d, nq = 1_000_000, 128, 1024
    nlist, k = 2048, 10
    rng = np.random.default_rng(0)
    t0 = time.time()
    corpus, geom = benchmod.make_corpus(n, d, 1024, rng)
    queries = corpus[rng.choice(n, nq, replace=False)] + \
        0.5 * rng.normal(size=(nq, d)).astype(np.float32)
    queries = queries.astype(np.float32)
    print(f"corpus {time.time()-t0:.1f}s", flush=True)

    gt_path = "/tmp/gsq_gt_1m.npz"
    if os.path.exists(gt_path):
        gt = np.load(gt_path)["gt"]
    else:
        t0 = time.time()
        gt = benchmod.host_gt(corpus, queries, k)
        np.savez(gt_path, gt=gt)
        print(f"gt {time.time()-t0:.1f}s", flush=True)

    cache = "/tmp/gsq_cache_1m_v2.npz"
    CH = 65536
    if os.path.exists(cache):
        z = np.load(cache)
        cents = jnp.asarray(z["cents"])
        cnorms = l2_norms(cents)
        assign, codes_h, norms_h = z["assign"], z["codes"], z["norms"]
        scale, off = jnp.asarray(z["scale"]), jnp.asarray(z["off"])
        fn = jax.jit(lambda xc: jnp.argmin(
            jnp.sum(xc * xc, -1)[:, None] - 2.0 * xc @ cents.T
            + cnorms[None], axis=-1).astype(jnp.int32))
        print("cache hit", flush=True)
    else:
        # coarse quantizer
        t0 = time.time()
        sub = corpus[rng.choice(n, nlist * 64, replace=False)]
        cents, _ = km.kmeans(jnp.asarray(sub), nlist, iters=8, seed=0)
        cnorms = l2_norms(cents)
        print(f"kmeans {time.time()-t0:.1f}s", flush=True)

        # assign corpus (chunked on device)
        t0 = time.time()
        assign = np.empty(n, np.int32)
        fn = jax.jit(lambda xc: jnp.argmin(
            jnp.sum(xc * xc, -1)[:, None] - 2.0 * xc @ cents.T
            + cnorms[None], axis=-1).astype(jnp.int32))
        for s in range(0, n, CH):
            e = min(n, s + CH)
            x = np.zeros((CH, d), np.float32)
            x[: e - s] = corpus[s:e]
            assign[s:e] = np.asarray(fn(jnp.asarray(x)))[: e - s]
        print(f"assign {time.time()-t0:.1f}s", flush=True)

        # sq encode on device (chunked), lists on host — RESIDUAL coding
        sub_a = np.asarray(fn(jnp.asarray(np.pad(
            sub, ((0, (-len(sub)) % CH), (0, 0))))))[:len(sub)] \
            if len(sub) % CH else np.asarray(fn(jnp.asarray(sub)))
        sub_res = jnp.asarray(sub) - jnp.take(cents,
                                              jnp.asarray(sub_a), axis=0)
        scale, off = train_sq(sub_res)
        t0 = time.time()
        codes_h = np.empty((n, d), np.uint8)
        norms_h = np.empty(n, np.float32)
        enc = jax.jit(lambda x, co: encode_sq(x, scale, off, co,
                                              d_pad=d, residual=True))
        for s in range(0, n, CH):
            e = min(n, s + CH)
            x = np.zeros((CH, d), np.float32)
            x[: e - s] = corpus[s:e]
            co = jnp.take(cents, jnp.asarray(
                np.pad(assign[s:e], (0, CH - (e - s)))), axis=0)
            c, nr = enc(jnp.asarray(x), co)
            codes_h[s:e] = np.asarray(c)[: e - s]
            norms_h[s:e] = np.asarray(nr)[: e - s]
        print(f"sq encode {time.time()-t0:.1f}s", flush=True)
        np.savez(cache, cents=np.asarray(cents), assign=assign,
                 codes=codes_h, norms=norms_h, scale=np.asarray(scale),
                 off=np.asarray(off))

    # build padded lists
    t0 = time.time()
    counts = np.bincount(assign, minlength=nlist)
    maxlen = int(counts.max())
    cap = -(-maxlen // 512) * 512
    print(f"maxlen={maxlen} cap={cap} fill={n/(nlist*cap):.2f}", flush=True)
    order = np.argsort(assign, kind="stable")
    lens_np = counts.astype(np.int32)
    starts = np.zeros(nlist, np.int64)
    starts[1:] = np.cumsum(counts)[:-1]
    slots = np.arange(n) - starts[assign[order]]
    lcodes = np.zeros((nlist, cap, d), np.uint8)
    lnorms = np.zeros((nlist, cap), np.float32)
    ldocs = np.full((nlist, cap), -1, np.int32)
    lcodes[assign[order], slots] = codes_h[order]
    lnorms[assign[order], slots] = norms_h[order]
    ldocs[assign[order], slots] = order.astype(np.int32)
    print(f"lists {time.time()-t0:.1f}s", flush=True)

    codes_d = jnp.asarray(lcodes)
    norms_d = jnp.asarray(lnorms)
    docs_d = jnp.asarray(ldocs)
    lens_d = jnp.asarray(lens_np)
    qd = jnp.asarray(queries)
    live_n = jnp.int32(n)

    # host SQ8 quantization ceiling: exact f64 top-k against the
    # DEQUANTIZED corpus — no kernel, no select, no bf16
    nq_d = 256
    sc, of = np.asarray(scale, np.float64), np.asarray(off, np.float64)
    deq_dist = np.empty((nq_d, n), np.float32)
    q64 = queries[:nq_d].astype(np.float64)
    cents_h = np.asarray(cents, np.float64)
    for s in range(0, n, 200_000):
        e = min(n, s + 200_000)
        dq = (cents_h[assign[s:e]] + of[None, :]
              + sc[None, :] * codes_h[s:e].astype(np.float64))
        dn = np.einsum("nd,nd->n", dq, dq)
        deq_dist[:, s:e] = (np.einsum("bd,bd->b", q64, q64)[:, None]
                            - 2.0 * q64 @ dq.T + dn[None, :]).astype(
                                np.float32)
    part = np.argpartition(deq_dist, k - 1, axis=1)[:, :k]
    rec = np.mean([len(set(part[i]) & set(gt[i])) / k
                   for i in range(nq_d)])
    print(f"host sq8-dequant ceiling recall@10: {rec:.4f}", flush=True)
    del deq_dist

    import functools

    @functools.partial(jax.jit,
                       static_argnames=("nprobe", "tile", "sel", "t",
                                        "precise"))
    def search(q, codes_d, norms_d, docs_d, lens_d, cents, cnorms,
               scale, off, live_n, *, nprobe, tile, sel, t,
               precise=False):
        b = q.shape[0]
        cd, lids = iv.coarse_assign(q, cents, cnorms, nprobe, "l2")
        dist = grouped_sq_scan(codes_d, norms_d, lens_d, lids, q,
                               scale, off, centroids=cents, tile=tile,
                               precise=precise)
        dg = jnp.take(docs_d, lids, axis=0)
        lg = jnp.take(lens_d, lids, axis=0)
        mask = iv._candidate_mask_validity(dg, lg, cap, live_n)
        dist = jnp.minimum(dist + mask, BIG)
        if sel == "flat":
            flat = dist.reshape(b, -1)
            doc_f = dg.reshape(b, -1)
            rd, ridx = jax.lax.approx_min_k(flat, 100, recall_target=t)
            ed, eidx = topk_min(rd, ridx, k)
            return jnp.take_along_axis(doc_f, eidx, axis=1)
        if sel == "exact":
            flat = dist.reshape(b, -1)
            doc_f = dg.reshape(b, -1)
            ids = jnp.broadcast_to(jnp.arange(
                flat.shape[1], dtype=jnp.int32)[None], flat.shape)
            rd, ridx = topk_min(flat, ids, k)
            return jnp.take_along_axis(doc_f, ridx, axis=1)
        if sel == "probe_topk":
            nd, nidx = jax.lax.top_k(-dist, t)       # [B, P, t]
        else:                                        # probe_approx
            nd, nidx = jax.lax.approx_max_k(-dist, t,
                                            recall_target=0.99)
        docs_t = jnp.take_along_axis(dg, nidx, axis=2)   # [B, P, t]
        rd, ridx = topk_min((-nd).reshape(b, -1),
                            docs_t.reshape(b, -1), k)
        return ridx

    variants = [
        ("exact", 0, True),
    ]
    for sel, t, prec in variants:
        def f(q, s_=sel, t_=t, p_=prec):
            return search(q, codes_d, norms_d, docs_d, lens_d,
                          cents, cnorms, scale, off, live_n,
                          nprobe=64, tile=1024, sel=s_, t=t_,
                          precise=p_)
        docs = np.asarray(f(qd))
        rec = np.mean([len(set(docs[i]) & set(gt[i])) / k
                       for i in range(nq)])
        # timed: queue iters dispatches, ONE device read at end
        f(qd)
        t0 = time.time()
        it = 5
        for _ in range(it):
            out = f(qd)
        _ = np.asarray(out)[:4]
        dt = (time.time() - t0) / it
        print(f"sel={sel} t={t} precise={prec}: recall@10={rec:.4f}  "
              f"{nq/dt:,.0f} QPS ({dt*1e3:.1f} ms/batch)", flush=True)

    # wide-batch QPS (grouping amortizes per-list work across the batch)
    qwide = jnp.concatenate([qd, qd])                    # B = 2048
    def fw(q):
        return search(q, codes_d, norms_d, docs_d, lens_d,
                      cents, cnorms, scale, off, live_n,
                      nprobe=64, tile=1024, sel="exact", t=0,
                      precise=False)
    fw(qwide)
    t0 = time.time()
    for _ in range(5):
        out = fw(qwide)
    _ = np.asarray(out)[:4]
    dt = (time.time() - t0) / 5
    print(f"B=2048 exact: {2048/dt:,.0f} QPS ({dt*1e3:.1f} ms/batch)",
          flush=True)


if __name__ == "__main__":
    main()
