"""Is the 201 s cold compile of kmeans_fit the lax.map(128 chunks) x
fori_loop nest?  A/B: current kmeans_fit vs a flat variant (one full
[n, k] distance matmul per iteration, no chunk map) at the bench train
geometry (524288 x 128, k=2048, 10 iters).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import functools
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

from gamma_tpu.ops.distances import pairwise_l2, l2_norms


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_flat(x, init, *, k: int, iters: int = 10):
    xf = x.astype(jnp.float32)

    def body(_, cents):
        d = pairwise_l2(xf, cents, l2_norms(cents))       # [n, k]
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)
        sums = jax.lax.dot_general(
            onehot, xf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, new, cents)

    cents = jax.lax.fori_loop(0, iters, body, init.astype(jnp.float32))
    d = pairwise_l2(xf, cents, l2_norms(cents))
    assign = jnp.argmin(d, axis=-1)
    counts = jnp.sum(jax.nn.one_hot(assign, k, dtype=jnp.float32), axis=0)
    return cents, counts


def t(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:2]
    return time.time() - t0, out


def main():
    rng = np.random.default_rng(0)
    k, d = 2048, 128
    n = k * 256
    print(f"devices={jax.devices()} n={n}", flush=True)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    init = x[:k]
    for tag in ("cold", "warm"):
        dt, (c, cnt) = t(kmeans_flat, x, init, k=k, iters=10)
        print(f"kmeans_flat {tag}: {dt:7.2f}s  (live clusters "
              f"{int((np.asarray(cnt) > 0).sum())})", flush=True)


if __name__ == "__main__":
    main()
