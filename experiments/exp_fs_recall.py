"""FastScan recall_num sweep: find the smallest rerank width that
clears recall@10 >= 0.99 at the bench geometry (VERDICT round-2 item 3:
0.9714 then; by_residual=true lifted it to ~0.987 at recall_num=100).

Run on the real chip:  python experiments/exp_fs_recall.py  [N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import host_gt, make_corpus  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from gamma_tpu.config import SearchParams
    from gamma_tpu.index.ivfpq_fastscan import IVFPQFastScanIndex
    from gamma_tpu.vector.raw_store import RawVectorStore

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d, nq, nlist, m, nprobe, k = 128, 256, 2048, 32, 64, 10
    rng = np.random.default_rng(0)
    corpus, _ = make_corpus(n, d, 1024, rng)
    queries = corpus[rng.choice(n, nq, replace=False)] + \
        0.5 * rng.normal(size=(nq, d)).astype(np.float32)
    queries = queries.astype(np.float32)
    gt = host_gt(corpus, queries, k)

    store = RawVectorStore("vec", d)
    store.add(corpus)
    store.flush_device()
    fs = IVFPQFastScanIndex(store, {
        "ncentroids": nlist, "nsubvector": 2 * m, "nprobe": nprobe,
        "bucket_init_size": max(1024, 4 * n // nlist)})
    fs.train(corpus[: nlist * 64])
    ids = np.arange(n, dtype=np.int64)
    for s in range(0, n, 65536):
        e = min(n, s + 65536)
        fs.add(store.device_rows(s, e), ids[s:e], ids[s:e])
    jax.block_until_ready(fs.state.lens)
    qd = jnp.asarray(queries)
    pen = jnp.zeros(store.device.shape[0], jnp.float32)

    for recall_num in (100, 150, 200, 300, 400):
        sp = SearchParams.from_dict({
            "scan_mode": "gather", "recall_num": recall_num,
            "has_rank": True, "nprobe": nprobe})

        def run(qb):
            return fs.search(qb, pen, sp, k, validity_n=n)

        found = []
        for s in range(0, nq, 128):
            _, docs, _ = run(qd[s: s + 128])
            found.append(np.asarray(docs))
        found = np.concatenate(found)
        rec = float(np.mean([
            len(set(found[i].tolist()) & set(gt[i].tolist())) / k
            for i in range(nq)]))
        qb = qd[np.arange(1024) % nq]
        jax.block_until_ready(run(qb))
        best = 0.0
        for _ in range(2):
            t0 = time.time()
            for _ in range(5):
                out = run(qb)
            _ = np.asarray(out[0][:1])
            best = max(best, 5 * 1024 / (time.time() - t0))
        print(f"recall_num={recall_num}: recall@10={rec:.4f} "
              f"qps={best:,.0f}", flush=True)


if __name__ == "__main__":
    main()
