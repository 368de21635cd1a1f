"""matching_docids: the delete-by-query matcher must agree with a host
oracle across device mirrors, unflushed tail rows, and never-mirrored
(non-indexed) fields (reference: DelDocByQuery routes through
MultiFieldsRangeIndex::Search, field_range_index.cc:1015-1115)."""

import numpy as np

from gamma_tpu.api.request import RangeFilter, TermFilter
from gamma_tpu.config import DataType, FieldInfo
from gamma_tpu.table.range_index import MultiFieldsRangeIndex
from gamma_tpu.table.table import Table


def _mk(n, flush_at=None):
    fields = [FieldInfo("price", DataType.FLOAT, is_index=True),
              FieldInfo("qty", DataType.INT, is_index=False),
              FieldInfo("tag", DataType.STRING, is_index=True)]
    t = Table(fields)
    ri = MultiFieldsRangeIndex(t)
    ri.add_field("price", DataType.FLOAT)
    ri.add_field("tag", DataType.STRING)
    for i in range(n):
        t.add(f"k{i}", {"price": float(i % 100), "qty": i % 7,
                        "tag": "red" if i % 3 == 0 else "blue"})
        ri.add_doc(i, {"tag": "red" if i % 3 == 0 else "blue"})
        if flush_at is not None and i + 1 == flush_at:
            ri.flush_device()
    return t, ri


def _oracle(n, price=None, qty=None, tag=None):
    m = np.ones(n, bool)
    for i in range(n):
        if price is not None and not (price[0] <= (i % 100) <= price[1]):
            m[i] = False
        if qty is not None and not (qty[0] <= (i % 7) <= qty[1]):
            m[i] = False
        if tag is not None and (("red" if i % 3 == 0 else "blue") != tag):
            m[i] = False
    return np.flatnonzero(m)


def test_matching_device_path():
    t, ri = _mk(500, flush_at=500)
    got = ri.matching_docids([RangeFilter("price", 10.0, 30.0)],
                             [TermFilter("tag", "red", is_union=1)], t.n)
    np.testing.assert_array_equal(got, _oracle(500, price=(10, 30),
                                               tag="red"))


def test_matching_unflushed_tail():
    # 300 rows mirrored, 200 added after the last flush → host tail
    t, ri = _mk(500, flush_at=300)
    got = ri.matching_docids([RangeFilter("price", 50.0, 99.0)], [], t.n)
    np.testing.assert_array_equal(got, _oracle(500, price=(50, 99)))


def test_matching_never_mirrored_field_falls_back():
    # qty is not an indexed field (no device mirror) → host evaluation
    t, ri = _mk(400, flush_at=400)
    got = ri.matching_docids(
        [RangeFilter("qty", 2.0, 4.0), RangeFilter("price", 0.0, 50.0)],
        [], t.n)
    np.testing.assert_array_equal(got, _oracle(400, qty=(2, 4),
                                               price=(0, 50)))


def test_matching_no_flush_at_all():
    t, ri = _mk(200)            # flush_device never called
    got = ri.matching_docids([RangeFilter("price", 0.0, 10.0)],
                             [TermFilter("tag", "blue", is_union=1)], t.n)
    np.testing.assert_array_equal(got, _oracle(200, price=(0, 10),
                                               tag="blue"))
