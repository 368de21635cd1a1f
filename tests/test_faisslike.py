"""faiss-like standalone facade (reference: FAISSLIKE_INDEX build)."""

import numpy as np
import pytest

from gamma_tpu.faisslike import (IndexFlat, IndexHNSW, IndexIVFFlat,
                                 IndexIVFPQ)


def test_flat_exact(corpus_small):
    idx = IndexFlat(corpus_small.shape[1])
    idx.add(corpus_small)
    D, I = idx.search(corpus_small[:8], k=3)
    assert (I[:, 0] == np.arange(8)).all()
    assert np.all(D[:, 0] < 0.5)   # self-distance, bf16 mirror


def test_ivfpq_lifecycle(tmp_path, corpus_medium):
    d = corpus_medium.shape[1]
    idx = IndexIVFPQ(d, nlist=64, m=8)
    assert not idx.is_trained
    idx.train(corpus_medium[:10000])
    assert idx.is_trained
    idx.add(corpus_medium)
    assert idx.ntotal == corpus_medium.shape[0]
    # blob clusters are tighter than the PQ cell size, so whole clusters
    # tie at one quantized distance; recall_num must exceed the cluster
    # size for the exact rerank to see the true neighbor (the reference's
    # ADC heap has the same tie behavior)
    D, I = idx.search(corpus_medium[:16], k=5, recall_num=512)
    assert (I[:, 0] == np.arange(16)).mean() >= 0.9
    idx.remove_ids(np.array([0, 1]))
    _, I2 = idx.search(corpus_medium[:2], k=3, recall_num=512)
    assert 0 not in I2[0] and 1 not in I2[1]
    idx.dump(str(tmp_path))
    idx2 = IndexIVFPQ(d, nlist=64, m=8)
    idx2.load(str(tmp_path))
    _, I3 = idx2.search(corpus_medium[4:8], k=3, recall_num=512)
    assert all(4 + i in I3[i].tolist() for i in range(4))


def test_ivfflat_and_hnsw(corpus_small):
    d = corpus_small.shape[1]
    for cls, kw in ((IndexIVFFlat, {"nlist": 16}),
                    (IndexHNSW, {"nlinks": 16})):
        idx = cls(d, **kw)
        idx.train(corpus_small)
        idx.add(corpus_small)
        _, I = idx.search(corpus_small[:8], k=3)
        assert np.mean([i in I[i].tolist() for i in range(8)]) >= 0.9


def test_ip_metric(corpus_small):
    idx = IndexFlat(corpus_small.shape[1], metric="ip")
    idx.add(corpus_small)
    D, I = idx.search(corpus_small[:4], k=1)
    # for IP, D returns the (positive) inner product; self has max IP
    # among near-duplicates most of the time
    expect = np.einsum("nd,nd->n", corpus_small[:4], corpus_small[:4])
    got_rows = corpus_small[I[:, 0]]
    got = np.einsum("nd,nd->n", corpus_small[:4], got_rows)
    assert np.all(got >= expect - 1e-2)
