"""ScaNN (VEARCH) model: anisotropic quantization + MIPS lifecycle.

Reference behavior contract: index/impl/scann/ (vendored ScaNN engine);
technique: Guo et al. 2020 anisotropic loss (ops/avq.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gamma_tpu.config import SearchParams
from gamma_tpu.index import create_model
from gamma_tpu.index.scann import ScaNNIndex
from gamma_tpu.ops import avq, pq as pq_ops
from gamma_tpu.vector.raw_store import RawVectorStore

from tests.conftest import make_blobs


@pytest.fixture(scope="module")
def corpus():
    x = make_blobs(np.random.default_rng(31), 6000, 32, n_clusters=32)
    # MIPS corpora are usually scale-varied; keep norms in [0.5, 1.5]
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x *= np.random.default_rng(5).uniform(0.5, 1.5, (x.shape[0], 1))
    return x.astype(np.float32)


def test_registry_names():
    store = RawVectorStore("v", 16)
    for name in ("SCANN", "VEARCH"):
        m = create_model(name, store, {"ncentroids": 8})
        assert isinstance(m, ScaNNIndex)
        assert m.p.metric_type.name == "INNER_PRODUCT"
        assert m.eta > 0.0
    # eta grows with dimension (Guo et al. eta(T) = (d-1)T^2/(1-T^2))
    assert (avq.eta_from_threshold(0.2, 128)
            > avq.eta_from_threshold(0.2, 16))


def test_avq_parallel_error_reduced(corpus):
    """The anisotropic codebooks trade orthogonal error for parallel
    error: mean squared PARALLEL residual must drop vs plain PQ."""
    x = jnp.asarray(corpus[:3000])
    M = 8
    plain = pq_ops.train_pq(x, M, nbits=4, iters=10)
    aniso = avq.train_avq(x, M, nbits=4, iters=10)

    def par_err(pq):
        codes = pq_ops.encode_pq(pq, x)
        rec = pq_ops.decode_pq(pq, codes)[:, : x.shape[1]]
        r = np.asarray(x - rec)
        xh = np.asarray(x) / np.linalg.norm(np.asarray(x), axis=1,
                                            keepdims=True)
        return float(np.mean(np.sum(r * xh, axis=1) ** 2))

    assert par_err(aniso) < par_err(plain)


def test_mips_recall(corpus):
    store = RawVectorStore("v", 32)
    store.add(corpus)
    store.flush_device()
    idx = ScaNNIndex(store, {"ncentroids": 64, "nsubvector": 8,
                             "nprobe": 16})
    idx.train(corpus)
    ids = np.arange(corpus.shape[0], dtype=np.int64)
    idx.add(corpus, ids, ids)

    rng = np.random.default_rng(3)
    queries = corpus[rng.choice(6000, 32, replace=False)]
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    gt = np.argsort(-(queries @ corpus.T), axis=1)[:, :10]
    pen = jnp.zeros(store.device.shape[0], jnp.float32)
    sp = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 16,
                                 "recall_num": 100, "has_rank": True})
    _, docs, _ = idx.search(jnp.asarray(queries), pen, sp, 10)
    docs = np.asarray(docs)
    recall = np.mean([len(set(docs[i]) & set(gt[i])) / 10
                      for i in range(32)])
    assert recall >= 0.85, recall
    # rank-1 equals the true MIPS argmax (NOT necessarily the query's own
    # doc: larger-norm docs in the same direction legitimately win)
    gt1 = int(np.argmax(corpus @ corpus[5]))
    sp_all = SearchParams.from_dict({"scan_mode": "gather", "nprobe": 64,
                                     "recall_num": 200, "has_rank": True})
    _, d5, _ = idx.search(jnp.asarray(corpus[5:6]), pen, sp_all, 5)
    assert gt1 in np.asarray(d5)[0].tolist()


def test_dense_mode_and_dump_load(corpus, tmp_path):
    store = RawVectorStore("v", 32)
    store.add(corpus)
    store.flush_device()
    idx = ScaNNIndex(store, {"ncentroids": 64, "nsubvector": 8,
                             "nprobe": 64})
    idx.train(corpus)
    ids = np.arange(corpus.shape[0], dtype=np.int64)
    idx.add(corpus, ids, ids)
    pen = jnp.zeros(store.device.shape[0], jnp.float32)
    spd = SearchParams.from_dict({"scan_mode": "dense",
                                  "recall_num": 100})
    q = jnp.asarray(corpus[:8])
    _, before, _ = idx.search(q, pen, spd, 10)
    idx.dump(str(tmp_path))
    idx2 = ScaNNIndex(store, {"ncentroids": 64, "nsubvector": 8,
                              "nprobe": 64})
    assert idx2.load(str(tmp_path)) == idx.indexed_count
    _, after, _ = idx2.search(q, pen, spd, 10)
    assert (np.asarray(before) == np.asarray(after)).all()
