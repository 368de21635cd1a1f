"""On-device k-means (Lloyd's algorithm).

The reference delegates coarse-centroid + PQ-codebook training to
faiss::IndexIVFPQ::train (gamma_index_ivfpq.cc:346, k-means on CPU/BLAS).
Here we own it: each Lloyd iteration is two MXU matmuls — the assignment
(n x d x k distance matrix, chunked over n to bound memory) and the
centroid update (one-hot^T @ x).  The whole training loop runs under one
jit with `lax.fori_loop`, so XLA pipelines chunk DMA with compute.

Batched variant (`kmeans_batched`) vmaps over independent subspaces — this
is how PQ trains all M codebooks simultaneously instead of faiss's
sequential per-subquantizer loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gamma_tpu.ops.distances import pairwise_l2, l2_norms


def _pad_rows(x: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % multiple
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


def _assign_chunked(x: jnp.ndarray, cents: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """argmin_k ||x - c_k||^2, chunked over rows; x must be row-padded."""
    cn = l2_norms(cents)
    n = x.shape[0]

    def one_chunk(xc):
        d = pairwise_l2(xc, cents, cn)
        return jnp.argmin(d, axis=-1).astype(jnp.int32)

    xs = x.reshape(n // chunk, chunk, x.shape[1])
    return jax.lax.map(one_chunk, xs).reshape(n)


def _update_centroids(x, assign, k, old_cents):
    """sums via one-hot matmul (MXU); empty clusters keep their centroid."""
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)       # [n, k]
    sums = jax.lax.dot_general(
        onehot, x.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                            # [k, d]
    counts = jnp.sum(onehot, axis=0)                             # [k]
    safe = jnp.maximum(counts, 1.0)[:, None]
    new = sums / safe
    return jnp.where(counts[:, None] > 0, new, old_cents), counts


# Full [n, k] distance matrix budget for the FLAT assignment: under it
# the whole Lloyd loop is two plain matmuls per iteration — the chunked
# lax.map formulation compiled 201 s cold on v5e at the SIFT1M train
# geometry vs 14 s flat (experiments/exp_kmeans_compile.py); warm step
# time is identical (0.14 s).  Train latency is compile-dominated.
FLAT_DIST_BYTES = 5 << 30


@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans_fit(x: jnp.ndarray, init: jnp.ndarray, *, k: int,
               iters: int = 10, chunk: int = 4096):
    """Run `iters` Lloyd iterations from `init` [k, d].  Returns
    (centroids [k, d] f32, counts [k] f32).

    Rows of x beyond the caller's true count must be pre-masked by the
    caller (we train on exactly what we're given); x is padded internally
    to the chunk size with zero rows that are excluded via a weight mask.
    """
    xf = x.astype(jnp.float32)
    flat = x.shape[0] * k * 4 <= FLAT_DIST_BYTES
    xp, n_true = _pad_rows(xf, 8 if flat else chunk)
    n_pad = xp.shape[0]
    row_valid = (jnp.arange(n_pad) < n_true)

    def assign_to(cents):
        if flat:
            d = pairwise_l2(xp, cents, l2_norms(cents))
            return jnp.argmin(d, axis=-1).astype(jnp.int32)
        return _assign_chunked(xp, cents, chunk)

    def body(_, cents):
        # poison padded rows to a virtual cluster by masking the one-hot
        assign = jnp.where(row_valid, assign_to(cents), -1)
        new, counts = _update_centroids(xp, assign, k, cents)
        return new

    cents = jax.lax.fori_loop(0, iters, body, init.astype(jnp.float32))
    assign = jnp.where(row_valid, assign_to(cents), -1)
    onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    return cents, counts


def kmeans(x, k: int, *, iters: int = 10, seed: int = 0, chunk: int = 4096):
    """Convenience wrapper: random-subset init (same policy as faiss) then fit."""
    n = x.shape[0]
    key = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(key, n)
    init = jnp.take(x, perm[:k], axis=0).astype(jnp.float32)
    if k > n:  # degenerate; tile
        reps = -(-k // n)
        init = jnp.tile(x.astype(jnp.float32), (reps, 1))[:k]
    return kmeans_fit(x, init, k=k, iters=iters, chunk=chunk)


# ---------------- batched (PQ) variant ----------------

@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans_batched_fit(xs: jnp.ndarray, inits: jnp.ndarray, *, k: int,
                       iters: int = 10, chunk: int = 4096):
    """vmapped kmeans over a leading batch axis: xs [M, n, dsub],
    inits [M, k, dsub] → (centroids [M, k, dsub], counts [M, k])."""

    def one(x, init):
        return kmeans_fit(x, init, k=k, iters=iters, chunk=chunk)

    return jax.vmap(one)(xs, inits)
