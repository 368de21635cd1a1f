"""Multi-host partition tier: router hash-sharding, scatter/gather merge,
replica failover, re-replication.

Reference architecture contract: Vearch router + partition servers above
the gamma C ABI (docs/MULTIHOST.md tier 2); merge semantics mirror the
multi-shard aggregation of gamma_index_ivfpq_gpu.cc:588-640."""

import os

import numpy as np
import pytest

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import Request, RangeFilter, VectorQuery
from gamma_tpu.cluster import GammaRouter, launch_local
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo, TableInfo,
                              VectorInfo)

from tests.conftest import make_blobs

D = 32
N = 3000


@pytest.fixture(scope="module")
def corpus():
    return make_blobs(np.random.default_rng(21), N, D, n_clusters=32)


@pytest.fixture(scope="module")
def cluster(tmp_path_factory, corpus):
    base = tmp_path_factory.mktemp("cluster")
    lc = launch_local(3, str(base / "socks"))
    # partition 0 runs TWO replicas (both served by server 0 — replica
    # isolation is per engine handle, not per process, in this test)
    router = GammaRouter([[lc.sockets[0], lc.sockets[1]],
                          [lc.sockets[2]]])
    table = TableInfo(
        name="t",
        fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("emb", D)],
        indexing_size=800,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 32, "nsubvector": 8,
                           "nprobe": 16}])
    cfgs = [[EngineConfig(path=str(base / "p0r0")),
             EngineConfig(path=str(base / "p0r1"))],
            [EngineConfig(path=str(base / "p1r0"))]]
    router.bootstrap(cfgs, table)
    docs = [Doc(key=f"k{i}", fields={"price": float(i % 500)},
                vectors={"emb": corpus[i]}) for i in range(N)]
    for s in range(0, N, 500):
        router.add_or_update_docs(docs[s:s + 500])
    router.build_index()
    router.flush()
    yield router, base, lc, cfgs
    router.close()
    lc.stop_all()


def test_doc_count_and_placement(cluster, corpus):
    router, *_ = cluster
    sts = router.status()
    assert len(sts) == 2                      # one status per partition
    assert router.doc_count() == N
    # every doc routed consistently
    pi = router.partition_of("k17")
    assert router.get_doc("k17") is not None
    assert 0 <= pi < 2


def test_search_merge_matches_global_topk(cluster, corpus):
    router, *_ = cluster
    q = corpus[42]
    resp = router.search(Request(
        topn=10, vec_fields=[VectorQuery("emb", q)]))
    items = resp.results[0].result_items
    assert items[0].key == "k42"              # self-hit survives the merge
    # scores ascend (l2) and k is filled from the union of partitions
    scores = [it.score for it in items]
    assert scores == sorted(scores)
    assert len(items) == 10
    # global ground truth: merged top-10 ⊇ true top-3
    d2 = np.sum((corpus - q) ** 2, axis=1)
    true3 = {f"k{i}" for i in np.argsort(d2)[:3]}
    assert true3 <= {it.key for it in items}


def test_filters_cross_partition(cluster, corpus):
    router, *_ = cluster
    resp = router.search(Request(
        topn=10, vec_fields=[VectorQuery("emb", corpus[10])],
        range_filters=[RangeFilter("price", 0.0, 99.0)]))
    for it in resp.results[0].result_items:
        assert 0.0 <= it.attributes.get("price", 0.0) <= 99.0 or \
            it.attributes == {}


def test_delete_routed(cluster, corpus):
    router, *_ = cluster
    q = corpus[77]
    assert router.delete("k77") == 0
    resp = router.search(Request(
        topn=5, vec_fields=[VectorQuery("emb", q)]))
    assert all(it.key != "k77" for it in resp.results[0].result_items)
    assert router.get_doc("k77") is None


def test_replica_failover_and_recovery(cluster, corpus):
    router, base, lc, cfgs = cluster
    # kill replica 0 of partition 0: stop its server and sever the live
    # connection (a dead host resets TCP; in-process handler threads
    # outlive shutdown, so the drop emulates the reset)
    lc.stop(0)
    router._drop_client(0, 0)
    q = corpus[100]
    resp = router.search(Request(
        topn=5, vec_fields=[VectorQuery("emb", q)]))
    assert resp.results[0].result_items
    assert router.partitions[0].alive == [False, True]
    # writes continue against the surviving replica
    router.add_or_update_docs([Doc(
        key="fresh1", fields={"price": 1.0},
        vectors={"emb": corpus[0] + 0.01})])
    assert router.get_doc("fresh1") is not None or \
        router.partition_of("fresh1") == 1
    # divergence window is visible: the dead replica's missed writes
    # accrue as lag until recovery
    if router.partition_of("fresh1") == 0:
        assert router.replica_status()[0]["lag"][0] >= 1
    else:   # route a write onto partition 0 so the lag is observable
        for i in range(50):
            key = f"lagprobe{i}"
            if router.partition_of(key) == 0:
                router.add_or_update_docs([Doc(
                    key=key, fields={"price": 1.0},
                    vectors={"emb": corpus[1] + 0.02})])
                break
        assert router.replica_status()[0]["lag"][0] >= 1
    # re-replicate replica 0 from the survivor onto server 1's socket
    router.recover_replica(
        0, 0, new_addr=lc.sockets[1],
        new_config=EngineConfig(path=str(base / "p0r0_recovered")),
        source_path=str(base / "p0r1"),
        dest_path=str(base / "p0r0_recovered"))
    assert router.partitions[0].alive == [True, True]
    assert router.replica_status()[0]["lag"] == [0, 0]
    resp = router.search(Request(
        topn=5, vec_fields=[VectorQuery("emb", q)]))
    assert resp.results[0].result_items
