"""Out-of-process serving surface: frame protocol + wire format over a
unix socket, full lifecycle through GammaClient."""

import os

import numpy as np
import pytest

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import Request, RangeFilter, VectorQuery
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo, TableInfo,
                              VectorInfo)
from gamma_tpu.server import GammaClient, ServerError, serve


def test_server_lifecycle(tmp_path, rng):
    addr = os.path.join(str(tmp_path), "gamma.sock")
    srv = serve(addr)
    try:
        cli = GammaClient(addr)
        assert cli.init(EngineConfig(path=str(tmp_path / "db"))) == 0
        assert cli.create_table(TableInfo(
            name="t", fields=[FieldInfo("price", DataType.FLOAT, True)],
            vectors=[VectorInfo("vec", 16)], indexing_size=400,
            retrieval_types=["IVFPQ"],
            retrieval_params=[{"ncentroids": 16, "nsubvector": 4}])) == 0
        x = rng.normal(size=(600, 16)).astype(np.float32)
        codes = cli.add_or_update_docs([
            Doc(key=f"k{i}", fields={"price": float(i)},
                vectors={"vec": x[i]}) for i in range(600)])
        assert all(c == 0 for c in codes)
        cli.build_index()
        cli.flush()
        st = cli.status()
        assert st.doc_count == 600
        assert st.index_status.name == "INDEXED"

        resp = cli.search(Request(
            topn=3, vec_fields=[VectorQuery("vec", x[5])],
            fields=["price"]))
        assert resp.results[0].result_items[0].key == "k5"

        # filtered through the socket too
        resp2 = cli.search(Request(
            topn=5, vec_fields=[VectorQuery("vec", x[5])],
            range_filters=[RangeFilter("price", 100.0, 200.0)]))
        for it in resp2.results[0].result_items:
            assert 100 <= it.docid <= 200

        doc = cli.get_doc("k9")
        assert doc.fields["price"] == 9.0
        assert cli.get_doc("missing") is None
        assert cli.delete("k5") == 0
        assert cli.delete("k5") == -1
        assert cli.dump() == 0
        cli.close()

        # second connection: fresh engine handle, load the dump
        cli2 = GammaClient(addr)
        cli2.init(EngineConfig(path=str(tmp_path / "db")))
        assert cli2.load() == 0
        r = cli2.search(Request(topn=1,
                                vec_fields=[VectorQuery("vec", x[7])]))
        assert r.results[0].result_items[0].key == "k7"
        cli2.close()
    finally:
        srv.stop()


def test_server_error_paths_and_restart(tmp_path, rng):
    addr = os.path.join(str(tmp_path), "g.sock")
    srv = serve(addr)
    cli = GammaClient(addr)
    # payload call before init raises a typed error, not a parse crash
    with pytest.raises(ServerError):
        cli.search(Request(topn=1))
    cli.close()
    srv.stop()
    # unix-socket path is reusable after stop()
    srv2 = serve(addr)
    cli2 = GammaClient(addr)
    assert cli2.init(EngineConfig(path=str(tmp_path / "db2"))) == 0
    cli2.close()
    srv2.stop()


def test_faisslike_deletions_survive_reload(tmp_path, corpus_small):
    from gamma_tpu.faisslike import IndexFlat
    idx = IndexFlat(corpus_small.shape[1])
    idx.add(corpus_small)
    idx.remove_ids(np.array([0, 10**9, -5]))   # OOR ids ignored
    idx.dump(str(tmp_path))
    idx2 = IndexFlat(corpus_small.shape[1])
    idx2.load(str(tmp_path))
    _, I = idx2.search(corpus_small[:1], k=3)
    assert 0 not in I[0]
