"""10M capacity tier, round 4: grouped-kernel grid tuning.

At cap_eff=12288 / tile=512 the gsq grid is g_pad x 24 tiles ≈ 74k
steps per batch; skipped tiles still write their [Q, tile] output block
(the og buffer is [G, Q, cap] = 4.8 GB at B=512).  Sweeps (tile, q_pad)
to find where per-step overhead and og write amplification stop
dominating: bigger tiles cut grid steps 4x; smaller q_pad cuts og rows.
Measures the FULL pipeline (scan + strided chunkmin select + rerank)
recall once and QPS per variant.
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
        "gather_payload": "pq", "train_rebalance": 6,
        "bucket_init_size": max(1024, 3 * n10 // nlist)})
    idx.train(store.device_rows(0, nlist * 256))
    ids10 = np.arange(n10, dtype=np.int64)
    t0 = time.time()
    for s in range(0, n10, 65536):
        e = min(n10, s + 65536)
        idx.add(store.device_rows(s, e), ids10[s:e], ids10[s:e])
    jax.block_until_ready(idx.state.lens)
    print(f"add: {time.time()-t0:.1f}s", flush=True)
    idx.release_recon()
    ok = idx.build_sq_sidecar()
    print(f"sidecar active={ok} cap_eff={idx._cap_eff()}", flush=True)

    ce = min(idx._cap_eff(), idx.sq_codes.shape[1])
    state_t = iv._trim_state(idx.state, ce)
    docids_ce = state_t.docids[:, :ce]
    vids_ce = state_t.vids[:, :ce]
    lens_d = idx.state.lens
    bias = iv.list_bias(docids_ce, lens_d, ce, penalty=None,
                        live_n=jnp.int32(n10))
    doc_flat = docids_ce.reshape(-1)
    vid_flat = vids_ce.reshape(-1)
    sq_c = idx.sq_codes[:, :ce]
    sq_n = idx.sq_norms[:, :ce]

    @functools.partial(jax.jit,
                       static_argnames=("p", "tile", "q_pad", "rr"))
    def full(sqc, sqn, docf, vidf, bias_, raw, q, *, p, tile, q_pad,
             rr=100):
        cd, lids = iv.coarse_assign(q, idx.centroids, idx.cent_norms,
                                    p, "l2")
        dist = grouped_sq_scan(
            sqc, sqn, lens_d, lids, q, idx.sq_scale, idx.sq_off,
            centroids=idx.centroids, metric="l2", bias=bias_,
            tile=tile, q_pad=q_pad)
        dist = jnp.minimum(dist, BIG)
        rd, rdoc, rvid = iv._select_late(dist, lids, docids_ce, vids_ce,
                                         ce, rr, exact=True)
        ed, edoc, _ = iv.rerank_rows(
            q, rd, rdoc, rvid,
            jnp.take(raw, jnp.clip(rvid, 0, raw.shape[0] - 1), axis=0),
            k=k, metric="l2")
        return ed, edoc

    def measure(tag, bsz=512, iters=5, **kw):
        try:
            outs = []
            for s in range(0, nq10, 64):
                _, docs = full(sq_c, sq_n, doc_flat, vid_flat, bias,
                               store.device, qd10[s: s + 64], **kw)
                outs.append(np.asarray(docs))
            f = np.concatenate(outs)
            rec = float(np.mean([
                len(set(f[i].tolist()) & set(gt10[i].tolist())) / k
                for i in range(nq10)]))
            qb = qd10[np.arange(bsz) % nq10]
            _force(full(sq_c, sq_n, doc_flat, vid_flat, bias,
                        store.device, qb, **kw))
            t0 = time.time()
            for _ in range(iters):
                out = full(sq_c, sq_n, doc_flat, vid_flat, bias,
                           store.device, qb, **kw)
            _force(out)
            q_ = bsz * iters / (time.time() - t0)
            print(f"{tag:30s}: recall {rec:.4f}  {q_:,.0f} QPS (B={bsz})",
                  flush=True)
        except Exception as exc:
            print(f"{tag:30s}: FAILED {exc!r}", flush=True)
            import gc
            gc.collect()

    measure("tile512 q32 (base)", p=64, tile=512, q_pad=32)
    measure("tile2048 q32", p=64, tile=2048, q_pad=32)
    measure("tile2048 q16", p=64, tile=2048, q_pad=16)
    measure("tile4096 q16", p=64, tile=4096, q_pad=16)
    measure("tile2048 q16 B1024", bsz=1024, p=64, tile=2048, q_pad=16)


if __name__ == "__main__":
    main()
