"""Disk-tier raw vectors (store_type="RocksDB"/"Disk"): no device mirror,
gather-mode scan over HBM codes, exact rerank reads candidates through
from the host memmap.

Reference behavior contract: vector/rocksdb_raw_vector.{h,cc} (vectors
beyond RAM; GetVector served from the KV store during rerank)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import Request, VectorQuery
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo,
                              SearchParams, TableInfo, VectorInfo)
from gamma_tpu.engine import GammaEngine
from gamma_tpu.index.ivfpq import IVFPQIndex
from gamma_tpu.index.ivfpq_fastscan import IVFPQFastScanIndex
from gamma_tpu.vector.raw_store import RawVectorStore

from tests.conftest import make_blobs


@pytest.fixture(scope="module")
def corpus():
    return make_blobs(np.random.default_rng(11), 6000, 48, n_clusters=48)


def _gt(corpus, queries, k):
    d2 = (np.sum(queries**2, 1)[:, None] - 2 * queries @ corpus.T
          + np.sum(corpus**2, 1)[None, :])
    return np.argsort(d2, axis=1)[:, :k]


def test_disk_store_has_no_mirror(tmp_path, corpus):
    s = RawVectorStore("v", 48, store_type="RocksDB",
                       root_path=str(tmp_path))
    assert s.tier == "disk"
    s.add(corpus)
    assert s.flush_device() == 0
    assert s.device.shape[0] == 8         # placeholder only
    assert s.flushed == 0
    # host master is a disk memmap
    assert isinstance(s._host, np.memmap)
    np.testing.assert_allclose(s.get(np.array([5])), corpus[5:6],
                               rtol=1e-6)


def test_disk_ivfpq_recall(tmp_path, corpus):
    s = RawVectorStore("v", 48, store_type="Disk", root_path=str(tmp_path))
    s.add(corpus)
    idx = IVFPQIndex(s, {"ncentroids": 48, "nsubvector": 12, "nprobe": 12})
    assert not idx.keep_recon
    idx.train(corpus)
    ids = np.arange(corpus.shape[0], dtype=np.int64)
    idx.add(corpus, ids, ids)
    assert idx.recon.shape[0] == 8        # mirror never grew
    assert idx.scan_mode(SearchParams()) == "gather"

    rng = np.random.default_rng(5)
    queries = corpus[rng.choice(6000, 32, replace=False)]
    gt = _gt(corpus, queries, 10)
    pen = jnp.zeros(8192, jnp.float32)
    sp = SearchParams.from_dict({"recall_num": 100, "has_rank": True})
    _, docs, _ = idx.search(jnp.asarray(queries), pen, sp, 10)
    docs = np.asarray(docs)
    recall = np.mean([len(set(docs[i]) & set(gt[i])) / 10
                      for i in range(32)])
    assert recall >= 0.9, recall


def test_disk_fastscan_and_delete(tmp_path, corpus):
    s = RawVectorStore("v", 48, store_type="Disk", root_path=str(tmp_path))
    s.add(corpus)
    idx = IVFPQFastScanIndex(s, {"ncentroids": 48, "nsubvector": 24,
                                 "nprobe": 48})
    idx.train(corpus)
    ids = np.arange(corpus.shape[0], dtype=np.int64)
    idx.add(corpus, ids, ids)
    pen = jnp.zeros(8192, jnp.float32)
    sp = SearchParams.from_dict({"recall_num": 100})
    q = jnp.asarray(corpus[7:8])
    _, docs, _ = idx.search(q, pen, sp, 5)
    assert int(np.asarray(docs)[0, 0]) == 7
    # the read-through rerank must rank by true exact distance
    queries = corpus[16:32]
    gt = _gt(corpus, queries, 5)
    _, dr, _ = idx.search(jnp.asarray(queries), pen, sp, 5)
    dr = np.asarray(dr)
    recall = np.mean([len(set(dr[i]) & set(gt[i])) / 5
                      for i in range(16)])
    assert recall >= 0.9, recall
    idx.delete(np.array([7]))
    _, docs2, _ = idx.search(q, pen, sp, 5)
    assert 7 not in np.asarray(docs2)[0].tolist()


def test_disk_untrained_brute_streaming(tmp_path, corpus):
    s = RawVectorStore("v", 48, store_type="Disk", root_path=str(tmp_path))
    s.add(corpus)
    idx = IVFPQIndex(s, {"ncentroids": 48, "nsubvector": 12})
    pen = jnp.zeros(8192, jnp.float32)
    queries = corpus[:8]
    gt = _gt(corpus, queries, 5)
    d, docs, _ = idx.search(jnp.asarray(queries), pen, SearchParams(), 5)
    assert (np.asarray(docs) == gt).all()


def test_engine_e2e_disk_tier(tmp_path, corpus):
    eng = GammaEngine(EngineConfig(path=str(tmp_path / "eng")))
    eng.create_table(TableInfo(
        name="t",
        fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("emb", 48, store_type="RocksDB")],
        indexing_size=3000,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 48, "nsubvector": 12,
                           "nprobe": 12}]))
    docs = [Doc(key=f"k{i}", fields={"price": float(i % 100)},
                vectors={"emb": corpus[i]}) for i in range(6000)]
    for s0 in range(0, 6000, 1000):
        eng.add_or_update_docs(docs[s0:s0 + 1000])
    eng.build_index()
    eng.flush()

    req = Request(topn=5, vec_fields=[VectorQuery("emb", corpus[3:4])])
    resp = eng.search(req)
    items = resp.results[0].result_items
    assert items and items[0].key == "k3"

    # deletes respected through the read-through path
    eng.delete("k3")
    resp = eng.search(req)
    assert all(it.key != "k3" for it in resp.results[0].result_items)
    eng.close()


def test_row_block_lru(tmp_path, corpus):
    s = RawVectorStore("v", 48, store_type="Disk", root_path=str(tmp_path))
    s.add(corpus)
    cache = s._row_cache
    assert cache is not None
    vids = np.array([[0, 1, 4097], [5000, 4098, 2]])
    rows = s.get_padded(vids)
    assert rows.shape == (2, 3, 48)
    np.testing.assert_allclose(rows[0, 0], corpus[0], rtol=1e-6)
    np.testing.assert_allclose(rows[1, 0], corpus[5000], rtol=1e-6)
    m0 = cache.misses
    s.get_padded(vids)                    # all blocks now resident
    assert cache.misses == m0 and cache.hits > 0
    # updates invalidate their block
    new_row = np.ones(48, np.float32)
    s.update(np.array([1]), new_row[None])
    np.testing.assert_allclose(s.get_padded(np.array([[1]]))[0, 0],
                               new_row)
    # runtime resize (SetConfig semantics): shrink to ~1 block
    s.set_cache_bytes(4 * 48 * 4096)
    assert s.cache_mem_bytes() <= 4 * 48 * 4096


def test_cache_setconfig_roundtrip(tmp_path, corpus):
    from gamma_tpu import c_api
    from gamma_tpu.idl import wire
    h = c_api.Init(wire.pack_config(EngineConfig(
        path=str(tmp_path / "e3"), vector_cache_mb=32)))
    c_api.CreateTable(h, wire.pack_table(TableInfo(
        name="t3", fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("emb", 48, store_type="Disk")],
        indexing_size=100000,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 16, "nsubvector": 12}])))
    cfg = wire.unpack_config(c_api.GetConfig(h))
    assert cfg.vector_cache_mb == 32
    cfg.vector_cache_mb = 8
    assert c_api.SetConfig(h, wire.pack_config(cfg)) == 0
    cfg2 = wire.unpack_config(c_api.GetConfig(h))
    assert cfg2.vector_cache_mb == 8
    c_api.Close(h)


def test_disk_rejects_mirror_dependent_models(tmp_path):
    eng = GammaEngine(EngineConfig(path=str(tmp_path / "eng2")))
    with pytest.raises(ValueError):
        eng.create_table(TableInfo(
            name="t2",
            fields=[FieldInfo("price", DataType.FLOAT, True)],
            vectors=[VectorInfo("emb", 16, store_type="Disk")],
            indexing_size=100,
            retrieval_types=["HNSW"],
            retrieval_params=[{}]))
    eng.close()
