"""Time the grouped MXU ADC kernel on the real TPU at the SIFT1M geometry.

Round-2 baselines at this geometry (B=256, P=64, nlist=2048, cap=1953):
  - XLA take_along_axis scan: 3.5-5.7 s/batch
  - pallas_adc (one-hot VPU per-pair): 718 ms/batch  (M=32, ksub=256)
  - pallas_adc_fs (ksub=16):            65 ms/batch  (M=64 packed)

Target: <= ~12 ms/batch 8-bit (≥20k QPS end to end), low-ms FastScan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gamma_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gamma_tpu.ops import pq as pq_ops
from gamma_tpu.ops.pallas_gadc import grouped_adc

jax.config.update("jax_compilation_cache_dir", "/tmp/gamma_jax_cache")


def bench(fn, iters=10):
    out = fn()
    _ = np.asarray(out[0, 0, :4])          # force a real device→host read
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    _ = np.asarray(out[0, 0, :4])
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    nlist, cap, d = 2048, 1953, 128
    b, p = int(os.environ.get("B", 256)), 64
    lens = jnp.asarray(np.full(nlist, int(cap * 0.26), np.int32))  # ~500 avg
    queries = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    cents = jnp.asarray(rng.normal(size=(nlist, d)).astype(np.float32))
    list_ids = jnp.asarray(
        rng.integers(0, nlist, size=(b, p)).astype(np.int32))
    x = rng.normal(size=(8192, d)).astype(np.float32)

    which = os.environ.get("WHICH", "both")
    tile = int(os.environ.get("TILE", 0)) or None
    qp = int(os.environ.get("QPAD", 0)) or None

    print(f"devices: {jax.devices()}", flush=True)
    if which in ("both", "8bit"):
        m, ksub = 32, 256
        t0 = time.time()
        pq = pq_ops.train_pq(jnp.asarray(x), m, nbits=8, iters=2)
        jax.block_until_ready(pq.codebooks)
        print(f"train_pq: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        codes = jnp.asarray(
            rng.integers(0, ksub, size=(nlist, cap, m)).astype(np.uint8))
        jax.block_until_ready(codes)
        print(f"codes upload: {time.time()-t0:.1f}s", flush=True)

        f = jax.jit(lambda q: grouped_adc(
            codes, lens, list_ids, q, cents, pq, metric="l2",
            tile=tile, q_pad=qp))
        t0 = time.time()
        dt = bench(lambda: f(queries))
        print(f"8bit grouped: {dt*1e3:.1f} ms/batch (B={b}) "
              f"[first call incl compile {time.time()-t0:.1f}s]",
              flush=True)

    if which in ("both", "fs"):
        m, ksub = 64, 16
        pqf = pq_ops.train_pq(jnp.asarray(x), m, nbits=4, iters=2)
        codes4 = rng.integers(0, 16, size=(nlist, cap, m)).astype(np.uint8)
        packed = jnp.asarray(
            (codes4[..., 0::2] | (codes4[..., 1::2] << 4)).astype(np.uint8))
        f2 = jax.jit(lambda q: grouped_adc(
            packed, lens, list_ids, q, cents, pqf, metric="l2",
            packed=True, tile=tile, q_pad=qp))
        dt = bench(lambda: f2(queries))
        print(f"fastscan grouped: {dt*1e3:.1f} ms/batch (B={b})",
              flush=True)


if __name__ == "__main__":
    main()
