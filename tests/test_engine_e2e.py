"""End-to-end engine lifecycle matrix.

Mirrors the reference suite's composite scenario (tests/test.h:1131-1164
TestIndexes: create → add → build-index → search (with range + term
filters) → dump → close → load → search again), parameterized over
retrieval model and store type like tests/test_files.cc:46-388.
"""

import numpy as np
import pytest

from gamma_tpu import (Doc, EngineConfig, FieldInfo, GammaEngine,
                       RangeFilter, Request, TableInfo, TermFilter,
                       VectorInfo, VectorQuery)
from gamma_tpu.config import DataType


N_DOCS = 3000
DIM = 32


def make_engine(tmp_path, model, store_type="MemoryOnly", metric="L2"):
    cfg = EngineConfig(path=str(tmp_path))
    eng = GammaEngine(cfg)
    info = TableInfo(
        name="ts",
        fields=[
            FieldInfo("_id", DataType.STRING),
            FieldInfo("url", DataType.STRING),
            FieldInfo("cid1", DataType.INT, is_index=True),
            FieldInfo("cid2", DataType.INT, is_index=True),
            FieldInfo("price", DataType.FLOAT, is_index=True),
            FieldInfo("tag", DataType.STRING, is_index=True),
        ],
        vectors=[VectorInfo("vec", DIM, store_type=store_type)],
        indexing_size=1000,
        retrieval_types=[model],
        # 4-bit FastScan needs finer subspaces for the same quality (the
        # reference defaults it to d/2 subquantizers, ivfpqfs.h)
        retrieval_params=[{"ncentroids": 32,
                           "nsubvector": (DIM // 2
                                          if model == "IVFPQ_FASTSCAN"
                                          else 8),
                           "nprobe": 12, "metric_type": metric}],
    )
    eng.create_table(info)
    return eng


def corpus(rng, n=N_DOCS, d=DIM):
    centers = rng.normal(size=(16, d)).astype(np.float32)
    x = (centers[rng.integers(0, 16, n)]
         + 0.1 * rng.normal(size=(n, d))).astype(np.float32)
    return x


def add_docs(eng, x):
    docs = []
    for i in range(x.shape[0]):
        docs.append(Doc(
            key=f"key_{i}",
            fields={"url": f"http://x/{i}", "cid1": i % 10,
                    "cid2": i % 100, "price": float(i),
                    "tag": f"t{i % 5}"},
            vectors={"vec": x[i]},
        ))
    return eng.add_or_update_docs(docs)


@pytest.mark.parametrize("model,store_type", [
    # the reference's lifecycle matrix (tests/test_files.cc:46-388):
    # model x store, full cycle twice (fresh + reload)
    ("IVFPQ", "MemoryOnly"),
    ("IVFPQ", "Mmap"),
    ("IVFPQ", "RocksDB"),
    ("IVFPQ_FASTSCAN", "MemoryOnly"),
    ("SCANN", "MemoryOnly"),
    ("FLAT", "MemoryOnly"),
    ("IVFFLAT", "MemoryOnly"),
    ("BINARYIVF", "MemoryOnly"),
    ("HNSW", "MemoryOnly"),
])
def test_lifecycle(tmp_path, model, store_type):
    rng = np.random.default_rng(3)
    x = corpus(rng)
    eng = make_engine(tmp_path, model, store_type)
    codes = add_docs(eng, x)
    assert all(c == 0 for c in codes)
    eng.build_index()
    eng.flush()
    status = eng.engine_status()
    assert status.doc_count == N_DOCS
    assert status.min_indexed_num >= (0 if model == "FLAT" else N_DOCS)

    # self-retrieval (reference SearchThread checks the query's own doc
    # comes back, test.h:565-718)
    qi = rng.integers(0, N_DOCS, 16)
    req = Request(topn=10,
                  vec_fields=[VectorQuery("vec", x[qi])],
                  fields=["url", "price"],
                  retrieval_params={"recall_num": 100})
    resp = eng.search(req)
    assert len(resp.results) == 16
    hits = 0
    for b, sr in enumerate(resp.results):
        assert sr.total > 0
        got = [it.docid for it in sr.result_items]
        if int(qi[b]) in got:
            hits += 1
    # binary codes are lossy (sign bits); others should be near-perfect
    min_hits = 8 if model == "BINARYIVF" else 14
    assert hits >= min_hits, f"{model}: self-retrieval {hits}/16"

    # filtered search: price range + term filter, verified vs oracle
    req_f = Request(
        topn=10,
        vec_fields=[VectorQuery("vec", x[:4])],
        range_filters=[RangeFilter("price", 100.0, 2000.0)],
        term_filters=[TermFilter("tag", "t1\x01t2", is_union=1)],
        retrieval_params={"recall_num": 200},
    )
    resp_f = eng.search(req_f)
    for sr in resp_f.results:
        for it in sr.result_items:
            assert 100.0 <= it.docid <= 2000.0   # price == docid
            assert it.docid % 5 in (1, 2)        # tag t1/t2

    # delete one doc, ensure it stops matching
    target = int(qi[0])
    assert eng.delete(f"key_{target}") == 0
    resp2 = eng.search(Request(
        topn=5, vec_fields=[VectorQuery("vec", x[target])],
        retrieval_params={"recall_num": 50}))
    assert all(it.docid != target
               for it in resp2.results[0].result_items)

    # get-doc API
    doc = eng.get_doc_by_key("key_5", ["url", "cid1"])
    assert doc["url"] == "http://x/5"

    # dump → fresh engine → load → search parity
    eng.dump()
    eng.close()

    eng2 = GammaEngine(EngineConfig(path=str(tmp_path)))
    assert eng2.load() == 0
    resp3 = eng2.search(Request(
        topn=10, vec_fields=[VectorQuery("vec", x[qi])],
        retrieval_params={"recall_num": 100}))
    hits2 = sum(1 for b, sr in enumerate(resp3.results)
                if int(qi[b]) in [it.docid for it in sr.result_items]
                and int(qi[b]) != target)
    assert hits2 >= min_hits - 2
    # the delete must SURVIVE the restart (reference loads the bitmap
    # file on Setup, gamma_engine.cc:253-271): absent from search,
    # get_doc, and still counted
    assert eng2.get_doc_by_key(f"key_{target}") is None
    assert eng2.engine_status().delete_num == 1
    for sr in resp3.results:
        assert all(it.docid != target for it in sr.result_items)
    eng2.close()


def test_delete_persists_across_restart(tmp_path):
    """Delete → dump → close → reopen → load: the deleted doc must NOT
    resurrect (round-1 confirmed bug: the engine re-wrote a fresh
    all-zero bitmap over the existing file on open)."""
    rng = np.random.default_rng(29)
    x = corpus(rng, n=50)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    assert eng.delete("key_3") == 0
    eng.dump()
    eng.close()

    eng2 = GammaEngine(EngineConfig(path=str(tmp_path)))
    assert eng2.load() == 0
    assert eng2.bitmap.test(3)
    assert eng2.engine_status().delete_num == 1
    assert eng2.get_doc_by_key("key_3") is None
    resp = eng2.search(Request(
        topn=5, vec_fields=[VectorQuery("vec", x[3])]))
    assert all(it.docid != 3 for it in resp.results[0].result_items)
    # deleting again reports "already deleted"
    assert eng2.delete("key_3") == -1
    eng2.close()


def test_upsert_and_update(tmp_path):
    rng = np.random.default_rng(11)
    x = corpus(rng, n=1500)
    eng = make_engine(tmp_path, "IVFPQ")
    add_docs(eng, x)
    eng.build_index()
    # update doc 7's vector to equal doc 9's → searching old vec misses 7
    new_vec = x[9] + 0.001
    eng.add_or_update_doc(Doc(key="key_7",
                              fields={"price": 7777.0},
                              vectors={"vec": new_vec}))
    eng.flush()
    assert eng.get_doc_by_key("key_7")["price"] == 7777.0
    resp = eng.search(Request(
        topn=3, vec_fields=[VectorQuery("vec", new_vec)],
        retrieval_params={"recall_num": 50}))
    got = [it.docid for it in resp.results[0].result_items]
    assert 7 in got and 9 in got
    eng.close()


def test_brute_force_flag(tmp_path):
    rng = np.random.default_rng(13)
    x = corpus(rng, n=500)
    eng = make_engine(tmp_path, "IVFPQ")
    add_docs(eng, x)
    eng.flush()    # NOT trained — brute force must still work
    resp = eng.search(Request(
        topn=5, vec_fields=[VectorQuery("vec", x[3])],
        brute_force_search=True))
    assert resp.results[0].result_items[0].docid == 3
    eng.close()


def test_del_doc_by_query(tmp_path):
    rng = np.random.default_rng(17)
    x = corpus(rng, n=1200)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    n_del = eng.del_doc_by_query(Request(
        range_filters=[RangeFilter("price", 0.0, 99.0)]))
    assert n_del == 100
    st = eng.engine_status()
    assert st.delete_num == 100
    assert st.doc_count == 1100
    eng.close()


def test_migration(tmp_path):
    rng = np.random.default_rng(19)
    x = corpus(rng, n=300)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    eng.begin_migrate()
    # writes during migration land in the incremental queue
    eng.add_or_update_doc(Doc(key="key_live",
                              fields={"price": 1.0, "cid1": 0, "cid2": 0,
                                      "url": "u", "tag": "t0"},
                              vectors={"vec": x[0]}))
    eng.delete("key_5")
    seen, deletes = 0, 0
    while True:
        batch = eng.get_migrate_doc(64)
        if not batch:
            break
        for doc, is_del in batch:
            if is_del:
                deletes += 1
            else:
                seen += 1
    assert seen >= 300   # snapshot + the live add
    assert deletes == 1
    eng.terminate_migrate()
    eng.close()


def test_multi_vectors_per_doc(tmp_path):
    """A doc may carry several vectors per field (reference caps at 10,
    raw_vector_common.h:17); a query matching ANY of them returns the doc
    once (vid→docid dedup, vector_manager.cc:386-429)."""
    rng = np.random.default_rng(17)
    eng = make_engine(tmp_path, "FLAT")
    x = corpus(rng, n=300)
    docs = []
    for i in range(300):
        vecs = np.stack([x[i], -x[i]])      # two vectors per doc
        docs.append(Doc(key=f"key_{i}",
                        fields={"url": "", "cid1": 0, "cid2": 0,
                                "price": float(i), "tag": "t"},
                        vectors={"vec": vecs}))
    assert all(c == 0 for c in eng.add_or_update_docs(docs))
    eng.flush()
    # query the SECOND vector of doc 5: doc must come back, deduped
    resp = eng.search(Request(topn=5,
                              vec_fields=[VectorQuery("vec", -x[5])]))
    items = resp.results[0].result_items
    assert items[0].docid == 5
    assert len([it for it in items if it.docid == 5]) == 1
    eng.close()


def test_multi_vector_update_rewrites_all_vids(tmp_path):
    """Upserting a multi-vector doc must rewrite EVERY vid of the field
    (reference re-adds all of a doc's vids on update) — searching near
    vector #2's NEW value finds the doc; near its OLD value does not."""
    rng = np.random.default_rng(29)
    eng = make_engine(tmp_path, "FLAT")
    x = corpus(rng, n=200)
    old2 = rng.normal(size=DIM).astype(np.float32) * 0.1 + 3.0
    new2 = rng.normal(size=DIM).astype(np.float32) * 0.1 - 3.0
    docs = []
    for i in range(200):
        v2 = old2 if i == 7 else x[i] + 0.001
        docs.append(Doc(key=f"key_{i}",
                        fields={"url": "", "cid1": 0, "cid2": 0,
                                "price": float(i), "tag": "t"},
                        vectors={"vec": np.stack([x[i], v2])}))
    assert all(c == 0 for c in eng.add_or_update_docs(docs))
    eng.flush()
    resp = eng.search(Request(topn=1,
                              vec_fields=[VectorQuery("vec", old2)]))
    assert resp.results[0].result_items[0].docid == 7
    # upsert doc 7: vector #1 unchanged, vector #2 moved to new2
    eng.add_or_update_doc(Doc(key="key_7",
                              fields={"url": "", "cid1": 0, "cid2": 0,
                                      "price": 7.0, "tag": "t"},
                              vectors={"vec": np.stack([x[7], new2])}))
    eng.flush()
    resp = eng.search(Request(topn=1,
                              vec_fields=[VectorQuery("vec", new2)]))
    assert resp.results[0].result_items[0].docid == 7
    resp = eng.search(Request(topn=1,
                              vec_fields=[VectorQuery("vec", old2)]))
    assert resp.results[0].result_items[0].docid != 7
    # vector #1 still matches after the update
    resp = eng.search(Request(topn=1,
                              vec_fields=[VectorQuery("vec", x[7])]))
    assert resp.results[0].result_items[0].docid == 7
    eng.close()


def test_multi_vector_delete_tombstones_all_vids(tmp_path):
    """Deleting a multi-vector doc must drop ALL its vectors from
    results, including on the unfiltered validity path."""
    rng = np.random.default_rng(31)
    eng = make_engine(tmp_path, "FLAT")
    x = corpus(rng, n=100)
    docs = []
    for i in range(100):
        docs.append(Doc(key=f"key_{i}",
                        fields={"url": "", "cid1": 0, "cid2": 0,
                                "price": float(i), "tag": "t"},
                        vectors={"vec": np.stack([x[i], -x[i]])}))
    assert all(c == 0 for c in eng.add_or_update_docs(docs))
    eng.flush()
    eng.delete("key_9")
    eng.flush()
    for qv in (x[9], -x[9]):
        resp = eng.search(Request(topn=3,
                                  vec_fields=[VectorQuery("vec", qv)]))
        assert all(it.docid != 9 for it in resp.results[0].result_items)
    eng.close()


def test_device_dtype_store_param(tmp_path):
    """store_param device_dtype=float32 selects an f32 device mirror."""
    import jax.numpy as jnp
    from gamma_tpu.config import (DataType, EngineConfig, FieldInfo,
                                  TableInfo, VectorInfo)
    eng = GammaEngine(EngineConfig(path=str(tmp_path)))
    eng.create_table(TableInfo(
        name="f32", fields=[FieldInfo("p", DataType.FLOAT)],
        vectors=[VectorInfo("vec", DIM,
                            store_param={"device_dtype": "float32"})],
        indexing_size=10_000, retrieval_types=["FLAT"],
        retrieval_params=[{}]))
    assert eng.vm.stores["vec"].device.dtype == jnp.float32
    rng = np.random.default_rng(1)
    x = corpus(rng, n=100)
    add_docs(eng, x)
    eng.flush()
    resp = eng.search(Request(topn=1, vec_fields=[VectorQuery("vec",
                                                              x[3])]))
    assert resp.results[0].result_items[0].docid == 3
    eng.close()


def test_host_dtype_f16_compression_tier(tmp_path):
    """store_param host_dtype=float16 halves the host store footprint
    (reference GammaZFP in-memory compression analog) with search
    results unchanged at test scale."""
    import numpy as _np
    from gamma_tpu.config import (DataType, EngineConfig, FieldInfo,
                                  TableInfo, VectorInfo)
    eng = GammaEngine(EngineConfig(path=str(tmp_path)))
    eng.create_table(TableInfo(
        name="f16", fields=[FieldInfo("p", DataType.FLOAT)],
        vectors=[VectorInfo("vec", DIM,
                            store_param={"host_dtype": "float16"})],
        indexing_size=10_000, retrieval_types=["FLAT"],
        retrieval_params=[{}]))
    store = eng.vm.stores["vec"]
    assert store.host_dtype == _np.float16
    rng = np.random.default_rng(5)
    x = corpus(rng, n=200)
    add_docs(eng, x)
    eng.flush()
    resp = eng.search(Request(topn=1, vec_fields=[VectorQuery("vec",
                                                              x[7])]))
    assert resp.results[0].result_items[0].docid == 7
    # the host tier really is half-width
    assert store._host.dtype == _np.float16
    # stored vector comes back as f32 (upcast on read)
    got = store.get(np.array([7]))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got[0], x[7], rtol=2e-3, atol=2e-3)
    eng.close()


def test_partial_dump_cleanup(tmp_path):
    """Crash recovery: incomplete dump dirs (no dump.done) are removed on
    load and the newest complete dump wins (reference:
    gamma_engine.cc:1271-1276)."""
    import os
    import time as _time
    rng = np.random.default_rng(23)
    x = corpus(rng, n=300)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    eng.dump()
    _time.sleep(0.02)
    # simulate a crash mid-dump: a newer dir without dump.done
    partial = os.path.join(str(tmp_path), "dump_99999999999999_999999")
    os.makedirs(partial)
    open(os.path.join(partial, "table.pkl"), "w").close()
    eng.close()

    eng2 = GammaEngine(EngineConfig(path=str(tmp_path)))
    assert eng2.load() == 0
    assert not os.path.exists(partial)          # partial dir cleaned
    assert eng2.engine_status().doc_count == 300
    resp = eng2.search(Request(topn=1, vec_fields=[VectorQuery("vec",
                                                               x[3])]))
    assert resp.results[0].result_items[0].docid == 3
    eng2.close()


def test_vector_fields_in_results(tmp_path):
    """Requested vector fields come back per hit (reference:
    Response::PackResultItem, gamma_response.cc:217-260), and survive
    the wire round-trip."""
    from gamma_tpu.idl import wire
    rng = np.random.default_rng(31)
    x = corpus(rng, n=400)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    resp = eng.search(Request(
        topn=3, vec_fields=[VectorQuery("vec", x[7])],
        fields=["url", "vec"]))
    it = resp.results[0].result_items[0]
    assert it.docid == 7
    assert it.attributes["url"] == "http://x/7"
    np.testing.assert_allclose(np.asarray(it.attributes["vec"]), x[7],
                               rtol=1e-6)
    # wire round-trip: vector values arrive as lists
    rt = wire.unpack_response(wire.pack_response(resp))
    got = rt.results[0].result_items[0].attributes["vec"]
    np.testing.assert_allclose(np.asarray(got, np.float32), x[7],
                               rtol=1e-6)
    eng.close()


def test_multi_vector_rank_order(tmp_path):
    """With two vector clauses, merged results come back in docid order
    by default and in score order when multi_vector_rank=1
    (reference: vector_manager.cc:512-576)."""
    rng = np.random.default_rng(37)
    d = DIM
    x = corpus(rng, n=600)
    eng = GammaEngine(EngineConfig(path=str(tmp_path)))
    eng.create_table(TableInfo(
        name="mv",
        fields=[FieldInfo("price", DataType.FLOAT)],
        vectors=[VectorInfo("va", d), VectorInfo("vb", d)],
        indexing_size=100_000,   # stay brute-force-ish (FLAT)
        retrieval_types=["FLAT"], retrieval_params=[{}]))
    y = corpus(rng, n=600)
    eng.add_or_update_docs([
        Doc(key=f"k{i}", fields={"price": float(i)},
            vectors={"va": x[i], "vb": y[i]}) for i in range(600)])
    eng.flush()
    req_kw = dict(topn=8, vec_fields=[VectorQuery("va", x[42]),
                                      VectorQuery("vb", y[42])],
                  retrieval_params={"recall_num": 64})
    r_doc = eng.search(Request(**req_kw, multi_vector_rank=0))
    ids_doc = [it.docid for it in r_doc.results[0].result_items]
    assert 42 in ids_doc
    assert ids_doc == sorted(ids_doc), "default order must be by docid"
    r_rank = eng.search(Request(**req_kw, multi_vector_rank=1))
    items = r_rank.results[0].result_items
    assert items[0].docid == 42, "best summed score must rank first"
    scores = [it.score for it in items]
    assert scores == sorted(scores)
    eng.close()


@pytest.mark.parametrize("model", ["IVFPQ", "FLAT"])
def test_score_range_returns_full_topn(tmp_path, model):
    """A tight score range must still return topn hits when enough
    in-range docs exist (fused IsSimilarScoreValid; round-1 weakness:
    post-filter on the final k returned fewer)."""
    rng = np.random.default_rng(41)
    x = corpus(rng, n=3000)
    eng = make_engine(tmp_path, model)
    add_docs(eng, x)
    eng.build_index()
    eng.flush()
    q = x[5]
    # exact distances to ALL docs → pick a band excluding the ~40
    # nearest but containing plenty of docs
    d = np.sort(((x.astype(np.float64) - q) ** 2).sum(-1))
    lo, hi = float(d[40]), float(d[400])
    topn = 10
    resp = eng.search(Request(
        topn=topn,
        vec_fields=[VectorQuery("vec", q, min_score=lo, max_score=hi)],
        retrieval_params={"recall_num": 500}))
    items = resp.results[0].result_items
    assert len(items) == topn, f"{model}: got {len(items)}/{topn}"
    for it in items:
        assert lo <= it.score <= hi
    eng.close()


def test_del_doc_by_query_term_filters(tmp_path):
    rng = np.random.default_rng(43)
    x = corpus(rng, n=1000)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    # tag == t2 AND price in [0, 499] → docids ≡ 2 (mod 5) below 500
    n_del = eng.del_doc_by_query(Request(
        range_filters=[RangeFilter("price", 0.0, 499.0)],
        term_filters=[TermFilter("tag", "t2", is_union=1)]))
    assert n_del == 100
    assert eng.engine_status().delete_num == 100
    assert eng.get_doc_by_key("key_2") is None
    assert eng.get_doc_by_key("key_3") is not None
    # no filters at all deletes nothing (not everything)
    assert eng.del_doc_by_query(Request()) == 0
    eng.close()


def test_term_filter_update_reindexes(tmp_path):
    """Updating a doc's term field must drop it from the OLD term's
    postings (round-1 gap: stale postings kept matching)."""
    rng = np.random.default_rng(47)
    x = corpus(rng, n=300)
    eng = make_engine(tmp_path, "FLAT")
    add_docs(eng, x)
    eng.flush()
    # key_7 has tag t2 (7 % 5); move it to tag "moved"
    eng.add_or_update_doc(Doc(key="key_7", fields={"tag": "moved"},
                              vectors={"vec": x[7]}))
    eng.flush()
    old = eng.search(Request(topn=10, vec_fields=[VectorQuery("vec", x[7])],
                             term_filters=[TermFilter("tag", "t2")]))
    assert all(it.docid != 7 for it in old.results[0].result_items)
    new = eng.search(Request(topn=10, vec_fields=[VectorQuery("vec", x[7])],
                             term_filters=[TermFilter("tag", "moved")]))
    assert [it.docid for it in new.results[0].result_items] == [7]
    eng.close()


def test_term_filter_device_mask_paths(tmp_path):
    """Hot terms use the incrementally-maintained device mask; cold terms
    the sparse scatter — both must agree with the host oracle, including
    after post-cache ingests (pending-delta scatter)."""
    rng = np.random.default_rng(53)
    n = 6000
    x = corpus(rng, n=n)
    eng = make_engine(tmp_path, "FLAT")
    docs = [Doc(key=f"key_{i}",
                fields={"url": "", "cid1": 0, "cid2": 0,
                        "price": float(i),
                        # two hot tags (3000 docs each ≥ threshold) and
                        # one cold tag on a few docs
                        "tag": ("hot0" if i % 2 == 0 else "hot1")
                               + ("\x01rare" if i % 997 == 0 else "")},
                vectors={"vec": x[i]}) for i in range(n)]
    eng.add_or_update_docs(docs)
    eng.flush()
    # hot path: the cache must exist for hot terms
    assert ("tag", "hot0") in eng.range_index._term_cache
    r = eng.search(Request(topn=20, vec_fields=[VectorQuery("vec", x[0])],
                           term_filters=[TermFilter("tag", "hot0")],
                           retrieval_params={"recall_num": 200}))
    got = [it.docid for it in r.results[0].result_items]
    assert got and all(d % 2 == 0 for d in got)
    # cold path
    r2 = eng.search(Request(topn=20, vec_fields=[VectorQuery("vec", x[0])],
                            term_filters=[TermFilter("tag", "rare")],
                            retrieval_params={"recall_num": 500}))
    got2 = [it.docid for it in r2.results[0].result_items]
    assert got2 and all(d % 997 == 0 for d in got2)
    # NOT filter
    r3 = eng.search(Request(topn=20, vec_fields=[VectorQuery("vec", x[1])],
                            term_filters=[TermFilter("tag", "hot0",
                                                     is_union=2)],
                            retrieval_params={"recall_num": 200}))
    got3 = [it.docid for it in r3.results[0].result_items]
    assert got3 and all(d % 2 == 1 for d in got3)
    # pending-delta: ingest more hot0 docs AFTER the cache exists
    eng.add_or_update_docs([
        Doc(key=f"new_{i}",
            fields={"url": "", "cid1": 0, "cid2": 0, "price": 0.0,
                    "tag": "hot0"},
            vectors={"vec": x[0] + 0.001 * i}) for i in range(1, 4)])
    eng.flush()
    r4 = eng.search(Request(topn=5, vec_fields=[VectorQuery("vec", x[0])],
                            term_filters=[TermFilter("tag", "hot0")]))
    got4 = [it.docid for it in r4.results[0].result_items]
    assert n in got4, f"newly ingested hot0 doc missing: {got4}"
    eng.close()
