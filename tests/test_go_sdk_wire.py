"""Cross-language wire-contract pin for the Go SDK (go/gamma/gamma.go).

The image has no Go toolchain (documented in go/README.md), so the Go
side cannot be executed here.  This test pins the contract from the
tested side instead:

1. Golden frames: canonical GWIR messages are generated with the
   engine's own wire.py and checked into go/gamma/testdata/.  The Go
   test (go/gamma/gamma_test.go) parses the same files, so any wire.py
   change that breaks the goldens fails HERE, and any Go decode drift
   fails THERE the moment a toolchain runs it.

2. Go-style frames: gamma.go packs JSON headers with Go's json.Marshal
   semantics — map keys sorted, null for unset min/max score.  This
   test re-creates frames exactly that way (sort_keys=True, explicit
   nulls) and asserts the engine's unpack functions accept them with
   identical results, so the Go SDK's output is known-parseable.
"""

import json
import struct
from pathlib import Path

import numpy as np
import pytest

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import (Request, RangeFilter, TermFilter,
                                   VectorQuery)
from gamma_tpu.idl import wire

TESTDATA = Path(__file__).resolve().parent.parent / "go" / "gamma" / "testdata"

_VEC = np.arange(8, dtype=np.float32) / 4.0
_VEC2 = np.linspace(-1.0, 1.0, 8).astype(np.float32)


def _golden_docs() -> bytes:
    return wire.pack_docs([
        Doc(key="doc-1", fields={"color": "red", "price": 9},
            vectors={"emb": _VEC}),
        Doc(key=7, fields={}, vectors={"emb": _VEC2}),
    ])


def _golden_request() -> bytes:
    return wire.pack_request(Request(
        topn=5, req_num=1,
        vec_fields=[VectorQuery(name="emb", value=_VEC, min_score=-np.inf,
                                max_score=np.inf, boost=1.0,
                                has_boost=False)],
        range_filters=[RangeFilter(field="price", lower_value=1,
                                   upper_value=10, include_lower=True,
                                   include_upper=False)],
        term_filters=[TermFilter(field="color", value=["red", "blue"],
                                 is_union=1)],
        retrieval_params={"nprobe": 16},
        fields=["color"],
    ))


_GOLDENS = {
    "docs.bin": _golden_docs,
    "request.bin": _golden_request,
}


@pytest.mark.parametrize("name", sorted(_GOLDENS))
def test_goldens_current(name):
    """The checked-in golden bytes match what wire.py emits today."""
    got = _GOLDENS[name]()
    path = TESTDATA / name
    assert path.exists(), (
        f"golden {name} missing — regenerate with "
        f"python -m tests.test_go_sdk_wire")
    assert path.read_bytes() == got, (
        f"golden {name} is stale: wire.py output changed — regenerate "
        f"the goldens AND update go/gamma/gamma_test.go expectations")


def _go_style_pack(msg_type: int, header: dict, blobs) -> bytes:
    """Byte-for-byte what go/gamma/gamma.go WirePack emits: JSON via
    json.Marshal (sorted keys, no spaces), then the GWIR framing."""
    hj = json.dumps(header, separators=(",", ":"), sort_keys=True).encode()
    out = [struct.pack("<IBBHI", wire.MAGIC, wire.VERSION, msg_type, 0,
                       len(hj)), hj, struct.pack("<I", len(blobs))]
    for b in blobs:
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def test_go_style_docs_parse():
    blob = _VEC.tobytes()
    data = _go_style_pack(wire.MSG_DOCS, {
        "docs": [{
            "fields": {"color": "red", "price": 9},
            "key": "doc-1",
            "vectors": {"emb": {"$blob": 0, "dtype": "float32",
                                "shape": [8]}},
        }],
    }, [blob])
    docs = wire.unpack_docs(data)
    assert len(docs) == 1
    assert docs[0].key == "doc-1"
    assert docs[0].fields == {"color": "red", "price": 9}
    np.testing.assert_array_equal(docs[0].vectors["emb"], _VEC)


def test_go_style_request_parse():
    """A request packed the Go way (sorted keys, null min/max score,
    boolean JSON) decodes to the same Request wire.py's own pack does."""
    blob = _VEC.tobytes()
    data = _go_style_pack(wire.MSG_REQUEST, {
        "brute_force_search": False,
        "fields": ["color"],
        "l2_sqrt": False,
        "multi_vector_rank": 0,
        "online_log_level": "",
        "range_filters": [{"field": "price", "include_lower": True,
                           "include_upper": False, "lower_value": 1,
                           "upper_value": 10}],
        "req_num": 1,
        "retrieval_params": {"nprobe": 16},
        "term_filters": [{"field": "color", "is_union": 1,
                          "value": ["red", "blue"]}],
        "topn": 5,
        "vec_fields": [{"boost": 1.0, "has_boost": False,
                        "max_score": None, "min_score": None,
                        "name": "emb",
                        "value": {"$blob": 0, "dtype": "float32",
                                  "shape": [8]}}],
    }, [blob])
    got = wire.unpack_request(data)
    want = wire.unpack_request(_golden_request())
    assert got.topn == want.topn == 5
    assert got.retrieval_params == want.retrieval_params
    assert [rf.__dict__ for rf in got.range_filters] == \
           [rf.__dict__ for rf in want.range_filters]
    assert [tf.terms() for tf in got.term_filters] == \
           [tf.terms() for tf in want.term_filters]
    assert got.vec_fields[0].min_score == -np.inf
    assert got.vec_fields[0].max_score == np.inf
    np.testing.assert_array_equal(got.vec_fields[0].value,
                                  want.vec_fields[0].value)


def test_go_response_fields_roundtrip():
    """The response JSON the server emits carries exactly the keys the
    Go Response struct decodes (json tags in gamma.go)."""
    from gamma_tpu.api.response import (Response, ResultItem, SearchResult,
                                        SearchResultCode)
    resp = Response(results=[SearchResult(
        total=3, result_code=SearchResultCode.SUCCESS, msg="",
        result_items=[ResultItem(score=0.25, docid=4, key="doc-1",
                                 attributes={"color": "red"})],
    )])
    h, _ = wire._unpack(wire.pack_response(resp), wire.MSG_RESPONSE)
    assert set(h) == {"online_log_message", "results"}
    sr = h["results"][0]
    assert set(sr) == {"total", "result_code", "msg", "items"}
    it = sr["items"][0]
    assert set(it) == {"score", "docid", "key", "attributes"}


def test_go_status_fields_roundtrip():
    from gamma_tpu.api.status import EngineStatus, IndexStatus
    st = EngineStatus(index_status=IndexStatus.INDEXED, doc_count=42,
                      max_docid=41, delete_num=1)
    h, _ = wire._unpack(wire.pack_status(st), wire.MSG_STATUS)
    # every json tag in gamma.go's EngineStatus struct must be present
    for key in ("index_status", "table_mem_bytes", "index_mem_bytes",
                "vector_mem_bytes", "field_range_mem_bytes",
                "bitmap_mem_bytes", "doc_count", "max_docid",
                "min_indexed_num", "delete_num"):
        assert key in h, key
    assert h["index_status"] == 2 and h["doc_count"] == 42


def _regenerate():
    TESTDATA.mkdir(parents=True, exist_ok=True)
    for name, fn in _GOLDENS.items():
        (TESTDATA / name).write_bytes(fn())
        print(f"wrote {TESTDATA / name}")


if __name__ == "__main__":
    _regenerate()
