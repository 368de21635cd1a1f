"""Top-k helpers (smaller-is-better convention everywhere).

Replaces the reference's per-thread heaps + critical-section merge
(gamma_index_ivfpq.cc:848-866, faiss heap_replace_top in ivfpq.h:574-600)
with `jax.lax.top_k` reductions, which XLA lowers to an efficient
sort-based network on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gamma_tpu.ops.distances import BIG


def topk_min(dists: jnp.ndarray, ids: jnp.ndarray, k: int):
    """Top-k smallest along the last axis.  Returns (vals, ids).
    If k exceeds the candidate count, results are padded with (BIG, -1)."""
    size = dists.shape[-1]
    k_eff = min(k, size)
    neg_vals, idx = jax.lax.top_k(-dists, k_eff)
    out_ids = jnp.take_along_axis(ids, idx, axis=-1)
    vals = -neg_vals
    if k_eff < k:
        pad = [(0, 0)] * (vals.ndim - 1) + [(0, k - k_eff)]
        vals = jnp.pad(vals, pad, constant_values=BIG)
        out_ids = jnp.pad(out_ids, pad, constant_values=-1)
    return vals, out_ids


def merge_topk(d1, i1, d2, i2, k: int):
    """Merge two (dist, id) top-k sets along the last axis."""
    d = jnp.concatenate([d1, d2], axis=-1)
    i = jnp.concatenate([i1, i2], axis=-1)
    return topk_min(d, i, k)


def mask_invalid(dists: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Push masked entries to +BIG so top-k never selects them."""
    return jnp.where(valid, dists, BIG)
