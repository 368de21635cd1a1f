"""In-memory vector compression tiers (reference: GammaZFP,
storage/compress/): bf16 default, fp8 opt-in via store_param
device_dtype — halves the HBM mirror at bounded recall cost."""

import numpy as np
import pytest

import jax.numpy as jnp

from gamma_tpu.api.doc import Doc
from gamma_tpu.api.request import Request, VectorQuery
from gamma_tpu.config import (DataType, EngineConfig, FieldInfo, TableInfo,
                              VectorInfo)
from gamma_tpu.engine import GammaEngine

from tests.conftest import make_blobs

D, N = 32, 3000


@pytest.mark.parametrize("dd", ["bfloat16", "float8"])
def test_compressed_mirror_recall(tmp_path, dd):
    corpus = make_blobs(np.random.default_rng(13), N, D, n_clusters=32)
    eng = GammaEngine(EngineConfig(path=str(tmp_path / dd)))
    eng.create_table(TableInfo(
        name="t",
        fields=[FieldInfo("price", DataType.FLOAT, True)],
        vectors=[VectorInfo("emb", D,
                            store_param={"device_dtype": dd})],
        indexing_size=1500,
        retrieval_types=["IVFPQ"],
        retrieval_params=[{"ncentroids": 32, "nsubvector": 8,
                           "nprobe": 16}]))
    docs = [Doc(key=f"k{i}", fields={"price": float(i)},
                vectors={"emb": corpus[i]}) for i in range(N)]
    for s in range(0, N, 1000):
        eng.add_or_update_docs(docs[s:s + 1000])
    eng.flush()
    store = eng.vm.stores["emb"]
    if dd == "float8":
        assert store.device.dtype == jnp.float8_e4m3fn
        assert store.device.dtype.itemsize == 1     # half of bf16
    # exact GT recall through the compressed-mirror rerank
    rng = np.random.default_rng(3)
    qs = corpus[rng.choice(N, 32, replace=False)]
    d2 = (np.sum(qs**2, 1)[:, None] - 2 * qs @ corpus.T
          + np.sum(corpus**2, 1)[None, :])
    gt = np.argsort(d2, axis=1)[:, :10]
    hits = 0
    for i in range(32):
        r = eng.search(Request(topn=10,
                               vec_fields=[VectorQuery("emb", qs[i])]))
        keys = {it.key for it in r.results[0].result_items}
        hits += len(keys & {f"k{j}" for j in gt[i]})
    recall = hits / 320
    # fp8's ~6% per-element rounding flows into the exact rerank: ~0.85
    # recall@10 on near-tie-heavy blobs is the measured ceiling — the
    # documented capacity/precision tradeoff of the compression tier
    assert recall >= (0.95 if dd == "bfloat16" else 0.80), (dd, recall)
    eng.close()
