"""IVFPQ — the flagship model.

Reference: index/impl/gamma_index_ivfpq.{h,cc} (2011 LoC over faiss
IndexIVFPQ + RTInvertIndex).  Capability contract kept:
  * coarse quantizer over ncentroids cells         (Init .cc:119-214)
  * PQ codes over residuals, nsubvector x nbits    (Add .cc:424-512)
  * train-set clamp [nlist*39, nlist*256]          (.cc:281-296)
  * realtime posting lists w/ tombstone updates    (RTInvertIndex)
  * search = assign → ADC scan w/ fused filters →
    recall_num heap → exact rerank                 (.cc:514-890)
  * brute-force fallback when untrained or
    request.brute_force_search                     (.cc:529-537)

TPU-first substitutions (documented deviations):
  * the HNSW coarse-quantizer option (ivfpq.cc:146-156) is replaced by
    flat assign — one (B x d x nlist) MXU matmul beats graph traversal on
    TPU for nlist <= ~64k;
  * OPQ rotation is a matmul prologue (applied to both the stored
    residual path at encode time and to queries);
  * training is on-device k-means (ops/kmeans.py) instead of faiss CPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gamma_tpu.config import IVFPQParams, MetricType, SearchParams
from gamma_tpu.index.model import RetrievalModel
from gamma_tpu.index.registry import register_model
from gamma_tpu.ops import ivf_scan, kmeans as km, pq as pq_ops
from gamma_tpu.ops.distances import l2_norms, pairwise_l2
from gamma_tpu.ops.flat_scan import flat_search
from gamma_tpu.realtime import invert_index as rt
from gamma_tpu.vector.raw_store import RawVectorStore

TRAIN_MIN_PER_LIST = 39     # faiss/gamma clamp (ivfpq.cc:281-296)
TRAIN_MAX_PER_LIST = 256


def _assign_chunked(x: jnp.ndarray, cents: jnp.ndarray,
                    cent_norms: jnp.ndarray, chunk: int = 4096):
    n = x.shape[0]
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    def one(xc):
        d = pairwise_l2(xc, cents, cent_norms)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    out = jax.lax.map(one, xp.reshape(-1, chunk, x.shape[1]))
    return out.reshape(-1)[:n]


@register_model("IVFPQ")
class IVFPQIndex(RetrievalModel):
    def __init__(self, raw_store: RawVectorStore,
                 params: Optional[Dict[str, Any]] = None):
        super().__init__(raw_store, params)
        self.p = IVFPQParams.from_dict(params)
        self.d = raw_store.d
        self._trained = False
        self.centroids: Optional[jnp.ndarray] = None      # [nlist, d]
        self.cent_norms: Optional[jnp.ndarray] = None
        self.pq: Optional[pq_ops.PQCodebooks] = None
        self.opq_rot: Optional[jnp.ndarray] = None         # [d, d] or None
        init_cap = max(64, self.p.bucket_init_size)
        self.state = rt.init_state(self.p.ncentroids, init_cap,
                                   self.p.nsubvector)
        self.placer = rt.HostPlacer(self.p.ncentroids, init_cap)

    # ---- training ----

    def trained(self) -> bool:
        return self._trained

    def clamp_train_set(self, x: np.ndarray) -> np.ndarray:
        nlist = self.p.ncentroids
        n = x.shape[0]
        hi = nlist * TRAIN_MAX_PER_LIST
        if n > hi:
            rng = np.random.default_rng(0)
            x = x[rng.choice(n, hi, replace=False)]
        return x

    def train(self, x: np.ndarray) -> None:
        x = self.clamp_train_set(np.asarray(x, np.float32))
        xd = jnp.asarray(x)
        if self.p.has_opq:
            self.opq_rot = self._train_opq_init(xd)
            xd = xd @ self.opq_rot
        cents, _ = km.kmeans(xd, self.p.ncentroids, iters=10, seed=0)
        self.centroids = cents
        self.cent_norms = l2_norms(cents)
        assign = _assign_chunked(xd, cents, self.cent_norms)
        residuals = xd - jnp.take(cents, assign, axis=0)
        self.pq = pq_ops.train_pq(residuals, self.p.nsubvector,
                                  nbits=self.p.nbits_per_idx, iters=12)
        if self.p.has_opq:
            self._refine_opq(xd, residuals)
        self._trained = True

    def _train_opq_init(self, x: jnp.ndarray) -> jnp.ndarray:
        """OPQ rotation init: PCA-orthonormal basis (reference trains a
        faiss OPQMatrix; full alternating refinement lands with
        _refine_opq).  Deterministic, d x d orthogonal."""
        xc = x - jnp.mean(x, axis=0, keepdims=True)
        cov = (xc.T @ xc).astype(jnp.float32)
        _, vecs = jnp.linalg.eigh(cov)
        return vecs[:, ::-1].astype(jnp.float32)   # descending eigenvalue

    def _refine_opq(self, x: jnp.ndarray, residuals: jnp.ndarray,
                    iters: int = 4) -> None:
        """Alternating OPQ refinement: encode/decode under current rotation,
        then procrustes-solve R = argmin ||xR - decode(encode(xR))||."""
        R = self.opq_rot
        for _ in range(iters):
            codes = pq_ops.encode_pq(self.pq, residuals)
            recon = pq_ops.decode_pq(self.pq, codes)[:, : self.d]
            # procrustes: R = UV^T from SVD of X^T Y
            m = (x.T @ recon).astype(jnp.float32)
            u, _, vt = jnp.linalg.svd(m, full_matrices=False)
            R = (u @ vt).astype(jnp.float32)
            xr = x @ R
            assign = _assign_chunked(xr, self.centroids, self.cent_norms)
            residuals = xr - jnp.take(self.centroids, assign, axis=0)
            self.pq = pq_ops.train_pq(residuals, self.p.nsubvector,
                                      nbits=self.p.nbits_per_idx, iters=6)
        self.opq_rot = R

    # ---- realtime add / update / delete ----

    def _rotate(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.opq_rot is not None:
            return (x.astype(jnp.float32) @ self.opq_rot)
        return x

    def encode_batch(self, x: np.ndarray
                     ) -> Tuple[np.ndarray, jnp.ndarray]:
        """→ (list_ids np [n], codes device [n, M])."""
        xd = self._rotate(jnp.asarray(x, jnp.float32))
        assign = _assign_chunked(xd, self.centroids, self.cent_norms)
        residuals = xd - jnp.take(self.centroids, assign, axis=0)
        codes = pq_ops.encode_pq(self.pq, residuals)
        return np.asarray(assign), codes

    def add(self, x: np.ndarray, vids: np.ndarray,
            docids: np.ndarray) -> None:
        assert self._trained, "IVFPQ.add before train"
        n = x.shape[0]
        if n == 0:
            return
        list_ids, codes = self.encode_batch(x)
        need = self.placer.required_cap(list_ids)
        if need > self.state.cap:
            new_cap = self.state.cap
            while new_cap < need:
                new_cap *= 2
            new_cap = min(max(new_cap, need), self.p.bucket_max_size)
            self.state = rt.grow(self.state, new_cap)
            self.placer.cap = new_cap
        positions, new_lens = self.placer.place(list_ids, vids)
        self.state = rt.append(
            self.state,
            jnp.asarray(list_ids, jnp.int32),
            jnp.asarray(positions, jnp.int32),
            codes,
            jnp.asarray(vids, jnp.int32),
            jnp.asarray(docids, jnp.int32),
            jnp.asarray(new_lens, jnp.int32))
        self.indexed_count += n

    def delete(self, vids: np.ndarray) -> None:
        vids = np.asarray(vids, dtype=np.int64)
        if vids.size == 0:
            return
        ls, ps = self.placer.locate(vids)
        live = ls >= 0
        if live.any():
            self.state = rt.tombstone(
                self.state,
                jnp.asarray(ls[live], jnp.int32),
                jnp.asarray(ps[live], jnp.int32))
            self.placer.mark_deleted(vids[live])

    def compact(self, threshold: float = 0.3) -> None:
        """Reclaim tombstoned slots when ≥30% dead (reference policy:
        realtime_mem_data.cc:373-377)."""
        if self.placer.deleted_fraction() < threshold:
            return
        self.state = rt.compact_state(self.state)
        self.placer.resync_after_compact(
            np.asarray(self.state.docids), np.asarray(self.state.vids),
            np.asarray(self.state.lens))

    # ---- search ----

    def search(self, queries, penalty, sp: SearchParams, k: int):
        metric = self.metric_name(sp, self.p.metric_type)
        if not self._trained:
            # brute-force fallback (reference: ivfpq.cc:529-537)
            d, rows = flat_search(self.store.device, self.store.device_norms,
                                  queries, penalty, k=k, metric=metric)
            return d, rows, rows
        nprobe = min(sp.nprobe or self.p.nprobe, self.p.ncentroids)
        recall_num = max(sp.recall_num, k)
        q = self._rotate(queries)
        return ivf_scan.ivfpq_search(
            self.state, self.centroids, self.cent_norms, self.pq,
            q, penalty, self.store.device,
            nprobe=nprobe, recall_num=recall_num, k=k, metric=metric,
            rerank=sp.has_rank)

    # ---- persistence (reference: gamma_index_io.cc "ilar" format) ----

    def dump(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        f = os.path.join(path, f"{self.store.name}.ivfpq.npz")
        if not self._trained:
            np.savez(f, trained=np.array(0))
            return
        np.savez(
            f,
            trained=np.array(1),
            centroids=np.asarray(self.centroids),
            codebooks=np.asarray(self.pq.codebooks),
            opq_rot=(np.asarray(self.opq_rot)
                     if self.opq_rot is not None else np.zeros(0)),
            codes=np.asarray(self.state.codes),
            vids=np.asarray(self.state.vids),
            docids=np.asarray(self.state.docids),
            lens=np.asarray(self.state.lens),
            indexed_count=np.array(self.indexed_count),
        )

    def load(self, path: str) -> int:
        f = os.path.join(path, f"{self.store.name}.ivfpq.npz")
        if not os.path.exists(f):
            return 0
        z = np.load(f)
        if int(z["trained"]) == 0:
            return 0
        self.centroids = jnp.asarray(z["centroids"])
        self.cent_norms = l2_norms(self.centroids)
        cb = jnp.asarray(z["codebooks"])
        self.pq = pq_ops.PQCodebooks(cb, jnp.sum(cb * cb, axis=-1))
        rot = z["opq_rot"]
        self.opq_rot = jnp.asarray(rot) if rot.size else None
        self.state = rt.IVFState(
            jnp.asarray(z["codes"]), jnp.asarray(z["vids"]),
            jnp.asarray(z["docids"]), jnp.asarray(z["lens"]))
        self.placer = rt.HostPlacer(self.state.nlist, self.state.cap)
        self.placer.resync_after_compact(
            z["docids"], z["vids"], z["lens"])
        self.indexed_count = int(z["indexed_count"])
        self._trained = True
        return self.indexed_count

    def mem_bytes(self) -> int:
        m = self.state.mem_bytes()
        if self.centroids is not None:
            m += self.centroids.size * 4
        if self.pq is not None:
            m += self.pq.codebooks.size * 4
        return int(m)
