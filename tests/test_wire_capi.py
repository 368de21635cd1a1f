"""Wire-format round trips + the C-API-shaped surface lifecycle."""

import numpy as np
import pytest

from gamma_tpu import c_api
from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import (Request, RangeFilter, TermFilter,
                                   VectorQuery)
from gamma_tpu.api.response import Response, ResultItem, SearchResult
from gamma_tpu.api.status import EngineStatus, IndexStatus
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo, TableInfo,
                              VectorInfo)
from gamma_tpu.idl import wire


def test_request_roundtrip(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    req = Request(
        topn=7, req_num=4,
        vec_fields=[VectorQuery("vec", q, min_score=0.1, boost=2.0,
                                has_boost=True)],
        fields=["a", "b"],
        range_filters=[RangeFilter("price", 1.0, 9.0,
                                   include_upper=False)],
        term_filters=[TermFilter("tag", ["x", "y"], is_union=0)],
        retrieval_params={"nprobe": 5, "metric_type": "L2"},
        brute_force_search=True, l2_sqrt=True)
    data = wire.pack_request(req)
    out = wire.unpack_request(data)
    np.testing.assert_array_equal(out.vec_fields[0].value, q)
    assert out.topn == 7 and out.req_num == 4
    assert out.vec_fields[0].min_score == pytest.approx(0.1)
    assert out.vec_fields[0].max_score == float("inf")
    assert out.vec_fields[0].boost == 2.0 and out.vec_fields[0].has_boost
    assert out.range_filters[0].upper_value == 9.0
    assert not out.range_filters[0].include_upper
    assert out.term_filters[0].terms() == ["x", "y"]
    assert out.term_filters[0].is_union == 0
    assert out.retrieval_params["nprobe"] == 5
    assert out.brute_force_search and out.l2_sqrt


def test_docs_roundtrip(rng):
    docs = [Doc(key=f"k{i}", fields={"price": float(i), "tag": "t"},
                vectors={"vec": rng.normal(size=8).astype(np.float32)})
            for i in range(3)]
    out = wire.unpack_docs(wire.pack_docs(docs))
    assert [d.key for d in out] == ["k0", "k1", "k2"]
    np.testing.assert_allclose(out[2].vectors["vec"],
                               docs[2].vectors["vec"])


def test_response_status_roundtrip():
    resp = Response(results=[SearchResult(
        total=1, result_items=[ResultItem(score=0.5, docid=3, key="k3",
                                          attributes={"p": 1.5})])],
        online_log_message="t")
    out = wire.unpack_response(wire.pack_response(resp))
    assert out.results[0].result_items[0].key == "k3"
    assert out.results[0].result_items[0].attributes["p"] == 1.5
    st = EngineStatus(index_status=IndexStatus.INDEXED, doc_count=9)
    out2 = wire.unpack_status(wire.pack_status(st))
    assert out2.index_status == IndexStatus.INDEXED
    assert out2.doc_count == 9


def test_bad_wire_data():
    with pytest.raises(ValueError):
        wire.unpack_request(b"\x00" * 32)
    data = wire.pack_docs([])
    with pytest.raises(ValueError):
        wire.unpack_request(data)   # wrong message type


def test_c_api_lifecycle(tmp_path, rng):
    cfg = wire.pack_config(EngineConfig(path=str(tmp_path)))
    h = c_api.Init(cfg)
    info = TableInfo(
        name="t",
        fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("vec", 16)],
        indexing_size=500,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 16, "nsubvector": 4}])
    assert c_api.CreateTable(h, wire.pack_table(info)) == 0
    x = rng.normal(size=(800, 16)).astype(np.float32)
    docs = [Doc(key=f"k{i}", fields={"price": float(i)},
                vectors={"vec": x[i]}) for i in range(800)]
    codes = wire.unpack_batch_result(
        c_api.AddOrUpdateDocs(h, wire.pack_docs(docs)))
    assert all(c == 0 for c in codes)
    c_api.BuildIndex(h)
    c_api.Flush(h)
    st = wire.unpack_status(c_api.GetEngineStatus(h))
    assert st.index_status == IndexStatus.INDEXED
    assert st.doc_count == 800

    req = Request(topn=3, vec_fields=[VectorQuery("vec", x[5])],
                  fields=["price"])
    resp = wire.unpack_response(c_api.Search(h, wire.pack_request(req)))
    assert resp.results[0].result_items[0].key == "k5"

    got = c_api.GetDocByID(h, b"k9")
    doc9 = wire.unpack_doc(got)
    assert doc9.fields["price"] == 9.0
    np.testing.assert_allclose(doc9.vectors["vec"], x[9], atol=1e-6)

    assert c_api.DeleteDoc(h, b"k5") == 0
    assert c_api.DeleteDoc(h, b"k5") == -1
    assert c_api.GetDocByID(h, b"k5") is None

    assert c_api.Dump(h) == 0
    assert c_api.Close(h) == 0
    assert c_api.Close(h) == -1

    # reload through the C surface
    h2 = c_api.Init(cfg)
    assert c_api.Load(h2) == 0
    resp = wire.unpack_response(c_api.Search(h2, wire.pack_request(
        Request(topn=1, vec_fields=[VectorQuery("vec", x[7])]))))
    assert resp.results[0].result_items[0].key == "k7"
    c_api.Close(h2)


def test_capi_full_surface_parity(tmp_path):
    """The remaining reference entry points (gamma_api.h): GetDocByDocID,
    DelDocByFilter, and the PrepareDocs/AddOrUpdateDocsNum/Finish
    staged-ingest trio."""
    import numpy as np
    from gamma_tpu import c_api
    from gamma_tpu.api.doc import Doc
    from gamma_tpu.api.request import Request, RangeFilter, VectorQuery
    from gamma_tpu.config import (DataType, EngineConfig, FieldInfo,
                                  TableInfo, VectorInfo)
    from gamma_tpu.idl import wire

    h = c_api.Init(wire.pack_config(EngineConfig(path=str(tmp_path))))
    c_api.CreateTable(h, wire.pack_table(TableInfo(
        name="t", fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("emb", 16)], indexing_size=10_000,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 16, "nsubvector": 4}])))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(60, 16)).astype(np.float32)
    docs = [Doc(key=f"k{i}", fields={"price": float(i)},
                vectors={"emb": x[i]}) for i in range(60)]

    # staged ingest trio
    assert c_api.PrepareDocs(h, wire.pack_docs(docs)) == 0
    assert c_api.AddOrUpdateDocsNum(h, 25) == 0
    assert c_api.AddOrUpdateDocsFinish(h) == 0
    assert c_api.AddOrUpdateDocsFinish(h) == -1      # nothing staged
    c_api.Flush(h)
    st = wire.unpack_status(c_api.GetEngineStatus(h))
    assert st.doc_count == 60

    # GetDocByDocID
    d7 = wire.unpack_doc(c_api.GetDocByDocID(h, 7))
    assert d7.key == "k7" and d7.fields["price"] == 7.0
    assert c_api.GetDocByDocID(h, 10_000) is None

    # DelDocByFilter (filter-only delete)
    n = c_api.DelDocByFilter(h, wire.pack_request(Request(
        range_filters=[RangeFilter("price", 0.0, 4.0)])))
    assert n == 5
    assert c_api.GetDocByID(h, b"k2") is None
    c_api.Close(h)
