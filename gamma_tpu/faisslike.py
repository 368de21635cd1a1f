"""faiss-like standalone facade.

Reference: index/gamma_index.{h,cc} (FAISSLIKE_INDEX build) — `Index` /
`IndexIVFPQ` / `IndexIVFFlat` classes with faiss-style train/add/search
that self-create their bitmap and raw-vector store (gamma_index.cc:56-119)
so the engine machinery can be used without tables or documents.

Usage (mirrors faiss):
    index = IndexIVFPQ(d=128, nlist=1024, m=32)
    index.train(xt)
    index.add(xb)
    D, I = index.search(xq, k=10)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from gamma_tpu.config import SearchParams
from gamma_tpu.index import create_model
from gamma_tpu.ops.distances import BIG
from gamma_tpu.vector.raw_store import RawVectorStore


class Index:
    """Base: flat exact index (faiss IndexFlat analog)."""

    model_name = "FLAT"

    def __init__(self, d: int, metric: str = "l2", **params):
        self.d = d
        self.metric = metric
        self.store = RawVectorStore("x", d)
        params = dict(params)
        params.setdefault("metric_type",
                          "IP" if metric == "ip" else "L2")
        self.model = create_model(self.model_name, self.store, params)
        self.ntotal = 0
        self._removed: list[int] = []

    @property
    def is_trained(self) -> bool:
        return self.model.trained()

    def train(self, x: np.ndarray) -> None:
        self.model.train(np.asarray(x, np.float32))

    def add(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32).reshape(-1, self.d)
        vids = self.store.add(x)
        self.store.flush_device()
        self.model.add(x, vids, vids)
        self.ntotal += x.shape[0]

    def remove_ids(self, ids: np.ndarray) -> None:
        ids = np.asarray(ids, np.int64)
        self.model.delete(ids)
        self._removed.extend(int(i) for i in ids)

    def _penalty(self) -> jnp.ndarray:
        cap = max(self.store.device.shape[0], self.ntotal)
        pen = np.zeros(cap, np.float32)
        pen[self.ntotal:] = BIG
        if self._removed:
            pen[np.asarray(self._removed)] = BIG
        return jnp.asarray(pen)

    def search(self, x: np.ndarray, k: int, **search_params):
        """→ (D [nq, k] f32, I [nq, k] i64); empty slots I = -1."""
        x = np.asarray(x, np.float32).reshape(-1, self.d)
        sp = SearchParams.from_dict(search_params)
        if sp.metric_type is None:
            sp = SearchParams.from_dict(
                dict(search_params,
                     metric_type="IP" if self.metric == "ip" else "L2"))
        d, ids, _ = self.model.search(jnp.asarray(x), self._penalty(),
                                      sp, k)
        d = np.asarray(d)
        ids = np.asarray(ids, np.int64)
        ids = np.where(d >= BIG, -1, ids)
        if self.metric == "ip":
            d = -d
        return d, ids

    def reconstruct(self, vid: int) -> np.ndarray:
        return self.store.get(np.array([vid]))[0]

    def dump(self, path: str) -> None:
        self.store.dump(path)
        self.model.dump(path)

    def load(self, path: str) -> int:
        self.store.load(path)
        n = self.model.load(path)
        self.ntotal = self.store.n
        return n


class IndexFlat(Index):
    model_name = "FLAT"


class IndexIVFPQ(Index):
    model_name = "IVFPQ"

    def __init__(self, d: int, nlist: int = 2048, m: int = 64,
                 nbits: int = 8, metric: str = "l2", **params):
        super().__init__(d, metric, ncentroids=nlist, nsubvector=m,
                         nbits_per_idx=nbits, **params)


class IndexIVFFlat(Index):
    model_name = "IVFFLAT"

    def __init__(self, d: int, nlist: int = 2048, metric: str = "l2",
                 **params):
        super().__init__(d, metric, ncentroids=nlist, **params)


class IndexHNSW(Index):
    model_name = "HNSW"

    def __init__(self, d: int, nlinks: int = 32, metric: str = "l2",
                 **params):
        super().__init__(d, metric, nlinks=nlinks, **params)


class IndexBinaryIVF(Index):
    model_name = "BINARYIVF"
