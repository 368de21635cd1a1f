"""Where do the bench's 23.7 s of IVFPQ train go at the SIFT1M geometry?

Times each phase of IVFPQIndex.train twice in-process (cold = compile +
run, warm = steady state) on the real chip: clamp/upload, coarse kmeans,
assignment, PQ codebook fit.  Also times the FastScan 4-bit PQ fit with a
shared coarse quantizer (bench measured 18.5 s for what should be ~1 s of
compute).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")

from gamma_tpu.ops import kmeans as km, pq as pq_ops
from gamma_tpu.index.ivfpq import _assign_chunked


def t(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:2]
    return time.time() - t0, out


def main():
    rng = np.random.default_rng(0)
    nlist, d, m = 2048, 128, 32
    n_train = nlist * 256                     # 524288 (bench clamp)
    print(f"devices={jax.devices()}", flush=True)

    x_np = rng.normal(size=(n_train, d)).astype(np.float32)
    dt, xd = t(jnp.asarray, x_np)
    print(f"upload train set f32:      {dt:6.2f}s", flush=True)

    for tag in ("cold", "warm"):
        dt, (cents, _) = t(km.kmeans, xd, nlist, iters=10, seed=0)
        print(f"coarse kmeans {tag}:        {dt:6.2f}s", flush=True)

    cn = jnp.sum(cents * cents, -1)
    for tag in ("cold", "warm"):
        dt, assign = t(_assign_chunked, xd, cents, cn)
        print(f"assign {tag}:               {dt:6.2f}s", flush=True)

    res = xd - jnp.take(cents, assign, axis=0)
    res_sub = res[:131072]
    for tag in ("cold", "warm"):
        dt, pq = t(pq_ops.train_pq, res_sub, m, nbits=8, iters=12)
        print(f"train_pq 8-bit M={m} {tag}:   {dt:6.2f}s", flush=True)

    # FastScan's 4-bit fit at M=64 (bench: 18.5 s with shared coarse)
    for tag in ("cold", "warm"):
        dt, pq4 = t(pq_ops.train_pq, res_sub, 2 * m, nbits=4, iters=12)
        print(f"train_pq 4-bit M={2*m} {tag}:  {dt:6.2f}s", flush=True)


if __name__ == "__main__":
    main()
