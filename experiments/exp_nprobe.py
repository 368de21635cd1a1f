"""Reproduce the reference's nprobe-saturation experiment on the
synthetic corpus (VERDICT r4 item 9: validate the synthetic recall
claims against published curve SHAPES absent real SIFT files).

Reference: benchs/README.md "Nprobe experiments" — SIFT1M, ncentroids
=256, 32 B codes: recall@1 rises steeply then saturates by nprobe≈25,
while QPS stays roughly flat for 1M sets.  If the synthetic corpus has
SIFT-like IVF hardness, the same geometry must reproduce that shape:
saturation by nprobe ~25 and a plateau recall@1 close to the
reference's (~0.98 with rerank).

Also sweeps FastScan recall_num at the 1M bench geometry (is the exact
select's rn=100 paying for recall that rn=32 already delivers?).

Writes docs/nprobe_curve.md with the table.
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

import bench
from gamma_tpu.config import SearchParams
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.vector.raw_store import RawVectorStore


def _force(out):
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])


def main():
    n, d, nq, k = 1_000_000, 128, 1024, 10
    rng = np.random.default_rng(0)
    corpus, _ = bench.make_corpus(n, d, 1024, rng)
    queries = corpus[rng.choice(n, nq, replace=False)] + \
        0.5 * rng.normal(size=(nq, d)).astype(np.float32)
    queries = queries.astype(np.float32)
    gt = bench.host_gt(corpus, queries, k)
    nn = gt[:, 0]
    qd = jnp.asarray(queries)
    print("data ready", flush=True)

    store = RawVectorStore("vec", d, device_dtype=jnp.float32,
                           init_cap=n + 1024)
    store.add(corpus)
    store.flush_device()

    # ---- reference geometry: ncentroids=256, 32-byte codes ----
    idx = IVFPQIndex(store, {
        "ncentroids": 256, "nsubvector": 32, "gather_payload": "pq",
        "bucket_init_size": max(1024, 4 * n // 256)})
    t0 = time.time()
    idx.train(store.device_rows(0, 256 * 256))
    print(f"train: {time.time()-t0:.1f}s", flush=True)
    ids = np.arange(n, dtype=np.int64)
    t0 = time.time()
    for s in range(0, n, 65536):
        e = min(n, s + 65536)
        idx.add(store.device_rows(s, e), ids[s:e], ids[s:e])
    jax.block_until_ready(idx.state.lens)
    print(f"add: {time.time()-t0:.1f}s cap_eff={idx._cap_eff()}",
          flush=True)
    pen = jnp.zeros(store.device.shape[0], jnp.float32)

    rows = []
    for p in (1, 5, 10, 15, 20, 25, 30, 40, 60, 80):
        sp = SearchParams.from_dict({
            "scan_mode": "gather", "nprobe": p, "recall_num": 100,
            "has_rank": True})
        found = []
        for s in range(0, nq, 256):
            _, docs, _ = idx.search(qd[s: s + 256], pen, sp, k,
                                    validity_n=n)
            found.append(np.asarray(docs))
        f = np.concatenate(found)
        r1 = float(np.mean(f[:, 0] == nn))
        r10 = float(np.mean([
            len(set(f[i].tolist()) & set(gt[i].tolist())) / k
            for i in range(nq)]))
        qb = qd[np.arange(512) % nq]
        _force(idx.search(qb, pen, sp, k, validity_n=n))
        t0 = time.time()
        for _ in range(5):
            out = idx.search(qb, pen, sp, k, validity_n=n)
        _force(out)
        qps = 512 * 5 / (time.time() - t0)
        rows.append((p, r1, r10, qps))
        print(f"nprobe {p:3d}: recall@1 {r1:.4f}  recall@10 {r10:.4f}  "
              f"{qps:,.0f} QPS", flush=True)

    os.makedirs("docs", exist_ok=True)
    with open("docs/nprobe_curve.md", "w") as fh:
        fh.write(
            "# nprobe saturation on the synthetic corpus\n\n"
            "Reproduces the reference's \"Nprobe experiments\" "
            "(benchs/README.md: SIFT1M, ncentroids=256, 32 B codes — "
            "recall@1 saturates by nprobe ≈ 25, QPS roughly flat) on "
            "the synthetic clustered corpus, validating that the "
            "synthetic recall numbers live in the same hardness "
            "regime as real SIFT.  IVFPQ + exact rerank "
            "(recall_num=100), 1M x 128-d, measured on one v5e chip "
            "(batch 512, gather/ADC scan mode).\n\n"
            "| nprobe | recall@1 | recall@10 | QPS |\n"
            "|---|---|---|---|\n")
        for p, r1, r10, qps in rows:
            fh.write(f"| {p} | {r1:.4f} | {r10:.4f} | {qps:,.0f} |\n")
        sat = next((p for p, r1, _, _ in rows
                    if r1 >= max(r[1] for r in rows) - 0.003), None)
        fh.write(
            f"\nSaturation point: recall@1 within 0.3 pts of its "
            f"plateau from nprobe = {sat} (reference: ≈25).  The QPS "
            f"column falls with nprobe (each probe scans a padded "
            f"list; the reference's flat QPS reflects CPU thread "
            f"under-utilization at small nprobe, not scan cost).\n\n"
            f"Honest read: the curve has the same saturating SHAPE as "
            f"the reference's but saturates earlier — coarse "
            f"assignment on this corpus is easier than real SIFT's "
            f"(synthetic clusters are well-separated at the coarse "
            f"level), so probe-coverage recall is not where its "
            f"hardness lives.  Its hardness is near-tie DENSITY: at "
            f"10M rows the quantization-ordering losses dominate "
            f"(dense tier 0.9918, SQ8-without-rerank 0.9891, see "
            f"experiments/exp_tenm*.py) — the regime the reference's "
            f"rerank exists for (recall@1 0.9814 vs faiss-ivfpq's "
            f"0.8201).  Recall claims in BENCH_r*.json should be read "
            f"with both facts in mind.\n")
    print("wrote docs/nprobe_curve.md", flush=True)
    del idx
    import gc
    gc.collect()

    # ---- FastScan recall_num sweep at the 1M bench geometry ----
    from gamma_tpu.index.ivfpq_fastscan import IVFPQFastScanIndex
    fs = IVFPQFastScanIndex(store, {
        "ncentroids": 2048, "nsubvector": 64, "nprobe": 64,
        "bucket_init_size": max(1024, 4 * n // 2048)})
    t0 = time.time()
    fs.train(store.device_rows(0, 2048 * 64))
    print(f"fs train: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for s in range(0, n, 65536):
        e = min(n, s + 65536)
        fs.add(store.device_rows(s, e), ids[s:e], ids[s:e])
    jax.block_until_ready(fs.state.lens)
    print(f"fs add: {time.time()-t0:.1f}s cap_eff={fs._cap_eff()}",
          flush=True)
    for rn in (32, 48, 64, 100):
        sp = SearchParams.from_dict({
            "scan_mode": "gather", "nprobe": 64, "recall_num": rn,
            "has_rank": True})
        found = []
        for s in range(0, nq, 256):
            _, docs, _ = fs.search(qd[s: s + 256], pen, sp, k,
                                   validity_n=n)
            found.append(np.asarray(docs))
        f = np.concatenate(found)
        r10 = float(np.mean([
            len(set(f[i].tolist()) & set(gt[i].tolist())) / k
            for i in range(nq)]))
        qb = qd[np.arange(1024) % nq]
        _force(fs.search(qb, pen, sp, k, validity_n=n))
        t0 = time.time()
        for _ in range(5):
            out = fs.search(qb, pen, sp, k, validity_n=n)
        _force(out)
        qps = 1024 * 5 / (time.time() - t0)
        print(f"fastscan rn={rn:3d}: recall@10 {r10:.4f}  "
              f"{qps:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
