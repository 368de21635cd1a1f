"""ScaNN-style index (the reference's VEARCH retrieval type).

Reference: index/impl/scann/ — the reference links Google's ScaNN engine
(index/impl/scann/scann_api.h) as retrieval types VEARCH / SCANN.  Its
distinguishing technique is score-aware anisotropic quantization
(ops/avq.py); partitioning + asymmetric-hash scan + exact re-rank are
structurally the IVF-ADC pipeline this repo already has, so this model is
IVFPQ with:
  * anisotropic codebook training on residuals, directions taken from
    the original (rotated) datapoints (train_avq);
  * anisotropic assignment at encode time (encode_avq);
  * inner-product metric by default (ScaNN targets MIPS).

Search (dense and gather scan modes, fused filters, rerank) is inherited
unchanged — the LUT/ADC algebra does not depend on how codebooks were
placed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gamma_tpu.index.ivfpq import IVFPQIndex, _assign_chunked
from gamma_tpu.index.registry import register_model
from gamma_tpu.ops import avq, kmeans as km, pq as pq_ops
from gamma_tpu.ops.distances import l2_norms
from gamma_tpu.vector.raw_store import RawVectorStore


@functools.partial(jax.jit,
                   static_argnames=("d", "has_rot", "eta", "recon_dtype"))
def _encode_scann(x, cents, cnorms, cb, cb_norms, rot, *, d, has_rot,
                  eta, recon_dtype=jnp.bfloat16):
    """Fused ingest: rotate → coarse assign → residual → ANISOTROPIC
    encode (directions = the rotated datapoints) → reconstruct."""
    xf = x.astype(jnp.float32)
    if has_rot:
        xf = xf @ rot
    assign = _assign_chunked(xf, cents, cnorms, chunk=16384)
    coarse = jnp.take(cents, assign, axis=0)
    pq = pq_ops.PQCodebooks(cb, cb_norms)
    codes = avq.encode_avq(pq, xf - coarse, xf, M=cb.shape[0], eta=eta)
    recon = (coarse + pq_ops.decode_pq(pq, codes)[:, :d]
             ).astype(recon_dtype)
    return (assign.astype(jnp.int32), codes, recon,
            l2_norms(recon.astype(jnp.float32)))


@register_model("VEARCH")
@register_model("SCANN")
class ScaNNIndex(IVFPQIndex):
    _dump_suffix = "scann"
    # anisotropic codes are the model's point; keep the ADC gather path
    _sq_payload_default = "pq"

    def __init__(self, raw_store: RawVectorStore,
                 params: Optional[Dict[str, Any]] = None):
        p = dict(params or {})
        p.setdefault("metric_type", "InnerProduct")   # ScaNN targets MIPS
        super().__init__(raw_store, p)
        t = float(p.get("anisotropic_threshold", 0.2))
        self.eta = float(p.get("eta",
                               avq.eta_from_threshold(t, self.d)))

    # ---- training: anisotropic codebooks ----

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
        self.pq = avq.train_avq(residuals, self.p.nsubvector,
                                dirs=xd, nbits=self.p.nbits_per_idx,
                                eta=self.eta, iters=8)
        self._trained = True

    # ---- ingest: anisotropic assignment ----

    def _encode_core(self, xp):
        return _encode_scann(
            xp, self.centroids, self.cent_norms,
            self.pq.codebooks, self.pq.cb_norms,
            self.opq_rot if self.opq_rot is not None
            else jnp.zeros((0, 0), jnp.float32),
            d=self.d, has_rot=self.opq_rot is not None,
            eta=self.eta, recon_dtype=self.recon_dtype)
