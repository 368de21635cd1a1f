"""Realtime semantics: search during insert, updates, NOT filters.

The reference's core contribution is lock-free search-during-insert
(realtime/realtime_mem_data.cc).  Here searches run against immutable
device-state snapshots, so a search that started before an insert batch
must neither crash nor return corrupted results, and once flushed the
new docs must be findable.
"""

import threading
import time

import numpy as np
import pytest

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import Request, TermFilter, VectorQuery
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo, TableInfo,
                              VectorInfo)
from gamma_tpu.engine import GammaEngine

D = 32


def make_engine(tmp_path, model="IVFPQ", indexing_size=1000):
    eng = GammaEngine(EngineConfig(path=str(tmp_path)))
    eng.create_table(TableInfo(
        name="rt",
        fields=[FieldInfo("price", DataType.FLOAT, True),
                FieldInfo("tag", DataType.STRING, True)],
        vectors=[VectorInfo("vec", D)],
        indexing_size=indexing_size,
        retrieval_types=[model],
        retrieval_params=[{"ncentroids": 16, "nsubvector": 8}]))
    return eng


def docs_for(x, start=0):
    return [Doc(key=f"k{start+i}",
                fields={"price": float(start + i),
                        "tag": f"t{(start+i) % 3}"},
                vectors={"vec": x[i]}) for i in range(x.shape[0])]


def test_search_during_insert(tmp_path, rng):
    x = rng.normal(size=(6000, D)).astype(np.float32)
    eng = make_engine(tmp_path)
    eng.add_or_update_docs(docs_for(x[:2000]))
    eng.flush()
    eng.start_background_indexer(interval_s=0.05)

    errors = []
    stop = threading.Event()

    def searcher():
        qi = 0
        while not stop.is_set():
            q = x[qi % 2000]
            try:
                r = eng.search(Request(
                    topn=5, vec_fields=[VectorQuery("vec", q)]))
                sr = r.results[0]
                if sr.result_code.name != "SUCCESS" or sr.total == 0:
                    errors.append(f"bad result {sr.result_code} "
                                  f"{sr.total}")
                    return
                # self-retrieval must hold for already-flushed docs
                if sr.result_items[0].docid != qi % 2000:
                    # tolerate near-duplicates; distance must be ~0
                    if sr.result_items[0].score > 1e-2:
                        errors.append(
                            f"lost doc {qi % 2000}: top={sr.result_items[0]}")
                        return
            except Exception as e:       # noqa: BLE001
                errors.append(repr(e))
                return
            qi += 1

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    # concurrent ingest
    for s in range(2000, 6000, 500):
        eng.add_or_update_docs(docs_for(x[s: s + 500], start=s))
        time.sleep(0.05)
    eng.flush()
    time.sleep(0.3)
    stop.set()
    for t in threads:
        t.join()
    eng.stop_background_indexer()
    assert not errors, errors[:3]
    # everything ingested during the run is now searchable
    r = eng.search(Request(topn=1, vec_fields=[VectorQuery("vec",
                                                           x[5999])]))
    assert r.results[0].result_items[0].docid == 5999
    eng.close()


def test_not_term_filter(tmp_path, rng):
    x = rng.normal(size=(1200, D)).astype(np.float32)
    eng = make_engine(tmp_path)
    eng.add_or_update_docs(docs_for(x))
    eng.flush()
    req = Request(topn=20, vec_fields=[VectorQuery("vec", x[0])],
                  term_filters=[TermFilter("tag", ["t0"], is_union=2)],
                  fields=["tag"])
    r = eng.search(req)
    items = r.results[0].result_items
    assert items
    for it in items:
        assert it.attributes["tag"] != "t0"
    eng.close()


def test_update_refreshes_filter_mirror(tmp_path, rng):
    x = rng.normal(size=(1200, D)).astype(np.float32)
    eng = make_engine(tmp_path)
    eng.add_or_update_docs(docs_for(x))
    eng.flush()
    from gamma_tpu.api.request import RangeFilter
    # doc 10 starts at price=10; move it to 99999 and verify the filter
    # mirror sees the update after flush
    eng.add_or_update_doc(Doc(key="k10",
                              fields={"price": 99999.0, "tag": "t1"},
                              vectors={"vec": x[10]}))
    eng.flush()
    req = Request(topn=5, vec_fields=[VectorQuery("vec", x[10])],
                  range_filters=[RangeFilter("price", 99998.0, 100000.0)])
    r = eng.search(req)
    assert r.results[0].result_items
    assert r.results[0].result_items[0].docid == 10
    # and it no longer matches its old range
    req2 = Request(topn=5, vec_fields=[VectorQuery("vec", x[10])],
                   range_filters=[RangeFilter("price", 9.5, 10.5)])
    r2 = eng.search(req2)
    assert all(it.docid != 10 for it in r2.results[0].result_items)
    eng.close()
