"""HNSW-equivalent neighbor-graph index: build, beam search, realtime
tail coverage, persistence."""

import jax.numpy as jnp
import numpy as np
import pytest

from gamma_tpu.config import SearchParams
from gamma_tpu.index import create_model, model_names
from gamma_tpu.index.hnsw import HNSWIndex
from gamma_tpu.ops.distances import BIG
from gamma_tpu.vector.raw_store import RawVectorStore


def _build(corpus, **kw):
    store = RawVectorStore("vec", corpus.shape[1])
    store.add(corpus)
    store.flush_device()
    idx = HNSWIndex(store, {"nlinks": 16, "efSearch": 48, **kw})
    ids = np.arange(corpus.shape[0], dtype=np.int64)
    idx.add(corpus, ids, ids)
    return store, idx


@pytest.fixture(scope="module")
def built(corpus_small):
    return _build(corpus_small)


def test_registered():
    assert "HNSW" in model_names()


def test_graph_built(built):
    store, idx = built
    assert idx.n_nodes == store.n
    links = np.asarray(idx.links[: idx.n_nodes])
    # every node keeps at least a few surviving edges after pruning
    assert (links >= 0).sum(axis=1).min() >= 1
    # no self-loops
    rows = np.arange(idx.n_nodes)[:, None]
    assert not np.any(links == rows)
    # undirected reachability: reverse edges ensure no in-degree-0 nodes
    indeg = np.bincount(links[links >= 0].ravel(),
                        minlength=idx.n_nodes)
    assert (indeg == 0).sum() == 0, f"{(indeg == 0).sum()} stranded nodes"


def test_beam_search_recall(built, rng):
    store, idx = built
    n = store.n
    q_idx = rng.choice(n, 32, replace=False)
    q = jnp.asarray(store.header(0, n)[q_idx])
    pen = jnp.zeros(n + 64, jnp.float32)
    sp = SearchParams.from_dict({"efSearch": 64})
    d, docs, _ = idx.search(q, pen, sp, 10)
    docs = np.asarray(docs)
    # oracle
    x = store.header(0, n)
    hits = 0
    for i, qi in enumerate(q_idx):
        ref = np.argsort(((x[qi] - x) ** 2).sum(-1))[:10]
        hits += len(set(docs[i].tolist()) & set(ref.tolist()))
    recall = hits / (10 * len(q_idx))
    assert recall >= 0.85, f"graph recall@10 {recall}"
    # self-retrieval at rank 1
    assert (docs[:, 0] == q_idx).mean() >= 0.9


def test_realtime_tail_merge(corpus_small, rng):
    """Vectors added after the last graph build must still be found
    (exact tail scan merged into beam results)."""
    store, idx = _build(corpus_small[:1500])
    # add a tail without triggering a rebuild (below the 1.25x threshold)
    tail = corpus_small[1500:1700]
    vids = np.arange(1500, 1700, dtype=np.int64)
    store.add(tail)
    store.flush_device()
    idx.add(tail, vids, vids)
    assert idx.n_nodes == 1500          # no rebuild yet
    pen = jnp.zeros(2048, jnp.float32)
    q = jnp.asarray(tail[:8])
    d, docs, _ = idx.search(q, pen, SearchParams(), 1)
    assert list(np.asarray(docs)[:, 0]) == list(range(1500, 1508))


def test_penalty_respected(built, rng):
    store, idx = built
    pen = np.zeros(store.n + 64, np.float32)
    pen[::2] = BIG
    q = jnp.asarray(rng.normal(size=(4, store.d)).astype(np.float32))
    _, docs, _ = idx.search(q, jnp.asarray(pen), SearchParams(), 10)
    live = np.asarray(docs)[np.asarray(docs) >= 0]
    assert live.size and np.all(live % 2 == 1)


def test_dump_load(tmp_path, built, corpus_small):
    store, idx = built
    idx.dump(str(tmp_path))
    idx2 = HNSWIndex(store, {"nlinks": 16})
    assert idx2.load(str(tmp_path)) == store.n
    np.testing.assert_array_equal(
        np.asarray(idx2.links[: idx2.n_nodes]),
        np.asarray(idx.links[: idx.n_nodes]))
    q = jnp.asarray(corpus_small[:4])
    pen = jnp.zeros(store.n + 64, jnp.float32)
    _, docs, _ = idx2.search(q, pen, SearchParams(), 1)
    assert list(np.asarray(docs)[:, 0]) == [0, 1, 2, 3]


def test_alias_models_create(corpus_small):
    store = RawVectorStore("vec", corpus_small.shape[1])
    for name in ("IVFPQ_FASTSCAN", "VEARCH", "SCANN"):
        m = create_model(name, store, {"ncentroids": 16, "nsubvector": 4})
        assert m is not None


def test_pump_terminates_on_unflushed_rows(rng):
    """Rows ingested between flush_device() and the pump must not
    livelock the pump loop: indexed_count advances past store.flushed
    (only the graph-rebuild extent is clamped to flushed)."""
    x = rng.normal(size=(600, 16)).astype(np.float32)
    store = RawVectorStore("vec", 16)
    store.add(x[:500])
    store.flush_device()
    idx = HNSWIndex(store, {"nlinks": 8})
    store.add(x[500:])          # NOT flushed — the race window
    spins = 0
    while idx.indexed_count < store.n:     # the vm pump loop
        start = idx.indexed_count
        end = min(start + 128, store.n)
        vids = np.arange(start, end, dtype=np.int64)
        idx.add(store.header(start, end), vids, vids)
        spins += 1
        assert spins < 100, "pump livelocked"
    assert idx.indexed_count == store.n
    # after the next flush, the tail is searchable via the flat merge
    store.flush_device()
    pen = jnp.zeros(store.device.shape[0], jnp.float32)
    d, ids, _ = idx.search(jnp.asarray(x[550:551]), pen,
                           SearchParams.from_dict({}), 3)
    assert int(np.asarray(ids)[0, 0]) == 550


def test_incremental_growth(corpus_small, rng, monkeypatch):
    """Past INCR_THRESHOLD, growth merges new rows without a full
    rebuild: old out-links are untouched, new rows get out-links and are
    reachable (reverse-patched), and search finds them."""
    import gamma_tpu.index.hnsw as hnsw_mod
    monkeypatch.setattr(hnsw_mod, "INCR_THRESHOLD", 64)
    # shrink the build chunk so row0 (chunk-aligned rebuild start) lands
    # INSIDE the existing graph — the real incremental path
    monkeypatch.setattr(hnsw_mod, "BUILD_CHUNK", 512)
    n0 = corpus_small.shape[0]
    store, idx = _build(corpus_small)
    before = np.asarray(idx.links[:n0]).copy()
    assert idx.n_nodes == n0
    row0 = (n0 // 512) * 512
    extra = corpus_small[:600] + 0.05 * rng.normal(
        size=(600, corpus_small.shape[1])).astype(np.float32)
    vids = np.arange(n0, n0 + 600, dtype=np.int64)
    store.add(extra)
    store.flush_device()
    idx.add(extra, vids, vids)
    assert idx.n_nodes == n0 + 600
    after = np.asarray(idx.links[: n0 + 600])
    # rows before the chunk-aligned rebuild start: out-link columns
    # unchanged (only reverse slots may move)
    r = idx.nlinks
    assert (after[:row0, :r] == before[:row0, :r]).all()
    # new rows have real out-links into [0, end)
    assert (after[n0:, :r] >= 0).any(axis=1).all()
    # new rows are referenced by someone (reverse patch landed)
    refs = set(after[after >= 0].ravel().tolist())
    frac = np.mean([v in refs for v in range(n0, n0 + 600)])
    assert frac >= 0.9, frac
    # search near a new row finds it
    q = jnp.asarray(extra[:8])
    pen = jnp.zeros(idx.links.shape[0] + 64, jnp.float32)
    sp = SearchParams.from_dict({"efSearch": 64})
    _, docs, _ = idx.search(q, pen, sp, 5)
    docs = np.asarray(docs)
    found = np.mean([(docs[i] >= n0).any() for i in range(8)])
    assert found >= 0.8, found


def test_clustered_build_recall(corpus_small, rng, monkeypatch):
    """Past CLUSTER_BUILD_N the graph builds from overlapping kmeans
    partitions; search recall must stay close to the exact-join build."""
    import gamma_tpu.index.hnsw as hnsw_mod
    monkeypatch.setattr(hnsw_mod, "CLUSTER_BUILD_N", 500)
    monkeypatch.setattr(hnsw_mod, "CLUSTER_TARGET", 256)
    store, idx = _build(corpus_small)
    n = store.n
    links = np.asarray(idx.links[:n])
    assert (links[:, : idx.nlinks] >= 0).any(axis=1).mean() > 0.98
    q_idx = rng.choice(n, 32, replace=False)
    q = jnp.asarray(store.header(0, n)[q_idx])
    pen = jnp.zeros(n + 64, jnp.float32)
    sp = SearchParams.from_dict({"efSearch": 64})
    _, docs, _ = idx.search(q, pen, sp, 10)
    docs = np.asarray(docs)
    x = store.header(0, n)
    hits = 0
    for i, qi in enumerate(q_idx):
        d2 = np.sum((x - x[qi]) ** 2, axis=1)
        gt = set(np.argsort(d2)[:10].tolist())
        hits += len(gt & set(docs[i].tolist()))
    assert hits / (32 * 10) >= 0.8, hits / 320
