"""Cross-request batch aggregation (reference: the GPU path's dedicated
search thread, gamma_index_ivfpq_gpu.cc:52,557-640)."""

import threading

import numpy as np

from gamma_tpu.batcher import BatchAggregator


def test_coalesces_compatible_requests():
    """8 concurrent 1-query requests with the same key run as ONE batch,
    and each caller gets exactly its own rows back."""
    agg = BatchAggregator()
    agg.pause()
    calls = []

    def fn(q):
        calls.append(q.shape[0])
        return q * 2.0, (q[:, :1] + 1.0)

    results = {}

    def worker(i):
        q = np.full((1, 4), float(i), np.float32)
        results[i] = agg.submit(("k",), fn, q)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    # wait until all 8 are enqueued, then release the dispatcher
    for _ in range(1000):
        with agg._cv:
            if len(agg._pending) == 8:
                break
        threading.Event().wait(0.005)
    agg.resume()
    for t in ts:
        t.join()
    assert agg.batches_run == 1 and agg.requests_served == 8
    assert calls == [8]
    for i in range(8):
        d, ids = results[i]
        assert d.shape == (1, 4) and float(d[0, 0]) == 2.0 * i
        assert float(ids[0, 0]) == i + 1.0
    agg.stop()


def test_incompatible_keys_run_separately():
    agg = BatchAggregator()
    agg.pause()
    out = {}

    def fn(q):
        return q, q

    def worker(i):
        out[i] = agg.submit(("k", i % 2), fn,
                            np.full((1, 2), float(i), np.float32))

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for _ in range(1000):
        with agg._cv:
            if len(agg._pending) == 4:
                break
        threading.Event().wait(0.005)
    agg.resume()
    for t in ts:
        t.join()
    assert agg.batches_run == 2 and agg.requests_served == 4
    agg.stop()


def test_error_propagates_to_all_waiters():
    agg = BatchAggregator()
    agg.pause()
    errs = []

    def bad(q):
        raise ValueError("boom")

    def worker():
        try:
            agg.submit(("k",), bad, np.zeros((1, 2), np.float32))
        except ValueError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker) for _ in range(3)]
    for t in ts:
        t.start()
    for _ in range(1000):
        with agg._cv:
            if len(agg._pending) == 3:
                break
        threading.Event().wait(0.005)
    agg.resume()
    for t in ts:
        t.join()
    assert errs == ["boom"] * 3
    agg.stop()


def test_row_cap_splits_batches():
    agg = BatchAggregator(max_batch_rows=4)
    agg.pause()
    done = []

    def fn(q):
        return q, q

    def worker(i):
        agg.submit(("k",), fn, np.zeros((2, 2), np.float32))
        done.append(i)

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for _ in range(1000):
        with agg._cv:
            if len(agg._pending) == 4:
                break
        threading.Event().wait(0.005)
    agg.resume()
    for t in ts:
        t.join()
    assert len(done) == 4
    assert agg.batches_run == 2          # 8 rows / cap 4
    agg.stop()


def test_engine_concurrent_searches_coalesce(tmp_path):
    """Engine-level: concurrent searches against the same snapshot
    coalesce into fewer device batches and return correct results."""
    from gamma_tpu import (Doc, EngineConfig, FieldInfo, GammaEngine,
                           Request, TableInfo, VectorInfo, VectorQuery)
    from gamma_tpu.config import DataType
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1000, 16)).astype(np.float32)
    eng = GammaEngine(EngineConfig(path=str(tmp_path)))
    eng.create_table(TableInfo(
        name="bt", fields=[FieldInfo("p", DataType.FLOAT)],
        vectors=[VectorInfo("vec", 16)], indexing_size=100_000,
        retrieval_types=["FLAT"], retrieval_params=[{}]))
    eng.add_or_update_docs([Doc(key=f"k{i}", fields={"p": 0.0},
                                vectors={"vec": x[i]})
                            for i in range(1000)])
    eng.flush()
    eng.search(Request(topn=3, vec_fields=[VectorQuery("vec", x[0])]))
    eng._batcher.pause()
    results = {}

    def worker(i):
        r = eng.search(Request(topn=3,
                               vec_fields=[VectorQuery("vec", x[i])]))
        results[i] = r.results[0].result_items[0].docid

    before = eng._batcher.batches_run
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for _ in range(2000):
        with eng._batcher._cv:
            if len(eng._batcher._pending) == 8:
                break
        threading.Event().wait(0.005)
    eng._batcher.resume()
    for t in ts:
        t.join()
    assert eng._batcher.batches_run - before == 1
    for i in range(8):
        assert results[i] == i
    eng.close()
