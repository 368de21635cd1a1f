"""Rerank-stage breakdown at the gather bench geometry.

The gather-mode profile (exp_gather_profile.py) shows the exact rerank
costs ~37 ms of the ~95 ms batch — for gathering ~100k bf16 rows
(26 MB) and a trivial [B, R, d] distance reduce.  This decomposes it:
XLA row gather vs distance compute, and prototypes a Pallas multi-DMA
row-gather kernel (multiple BlockSpec'd rows per grid step → multiple
DMAs in flight) to see how close to HBM random-read speed we can get.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")


def bench(fn, *args, iters=10):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    return (time.time() - t0) / iters * 1e3


@functools.partial(jax.jit, static_argnames=("rps",))
def gather_rows_pallas(table, idx, *, rps: int = 16):
    """rows[i] = table[idx[i]] via rps row-DMAs in flight per grid step."""
    k = idx.shape[0]
    n, d = table.shape
    assert k % rps == 0
    t3 = table.reshape(n, 1, d)

    def kern(idx_ref, *refs):
        out_ref = refs[rps]
        for j in range(rps):
            out_ref[j] = refs[j][0, 0]

    def mk_im(j):
        return lambda i, idx_ref: (idx_ref[i * rps + j], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // rps,),
        in_specs=[pl.BlockSpec((1, 1, d), mk_im(j)) for j in range(rps)],
        out_specs=pl.BlockSpec((rps, d), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, d), table.dtype),
    )(idx, *([t3] * rps))


def main():
    rng = np.random.default_rng(0)
    n, d = 1_000_000, 128
    b, r = 1024, 100
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    rvid = jnp.asarray(rng.integers(0, n, size=(b, r)).astype(np.int32))
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    print(f"devices={jax.devices()}", flush=True)

    t = bench(jax.jit(lambda v: jnp.take(table, v, axis=0, mode="fill",
                                         fill_value=0)), rvid)
    print(f"xla take [B,R] rows:        {t:7.2f} ms", flush=True)

    t = bench(jax.jit(lambda v: jnp.take(
        table, v.reshape(-1), axis=0, mode="clip")), rvid)
    print(f"xla take flat mode=clip:    {t:7.2f} ms", flush=True)

    @jax.jit
    def rerank_only(rows):
        qf = queries[:, None, :].astype(jnp.float32)
        diff = qf - rows.reshape(b, r, d).astype(jnp.float32)
        ex = jnp.sum(diff * diff, axis=-1)
        return jax.lax.top_k(-ex, 10)

    rows0 = jnp.take(table, rvid.reshape(-1), axis=0, mode="clip")
    print(f"distance+topk only:         {bench(rerank_only, rows0):7.2f} ms",
          flush=True)

    flat = rvid.reshape(-1)
    pad = (-flat.shape[0]) % 128
    flat_p = jnp.pad(flat, (0, pad))
    for rps in (8, 16, 32):
        try:
            fn = jax.jit(functools.partial(gather_rows_pallas, rps=rps))
            out = fn(table, flat_p)
            ref = np.asarray(jnp.take(table, flat_p, axis=0))
            ok = np.array_equal(np.asarray(out), ref)
            t = bench(fn, table, flat_p)
            print(f"pallas gather rps={rps:3d}:      {t:7.2f} ms ok={ok}",
                  flush=True)
        except Exception as e:
            print(f"pallas gather rps={rps}: FAIL {type(e).__name__}: {e}",
                  flush=True)

    # sorted-order gather (locality probe for the XLA path)
    sflat = jnp.sort(flat)
    t = bench(jax.jit(lambda v: jnp.take(table, v, axis=0, mode="clip")),
              sflat)
    print(f"xla take sorted:            {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
