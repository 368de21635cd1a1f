"""Pallas gather-ADC kernel vs the pure-jnp oracle (interpret mode on
CPU; the driver exercises the compiled path on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gamma_tpu.ops import pq as pq_ops
from gamma_tpu.ops.pallas_adc import adc_scan_pallas


def test_adc_kernel_matches_oracle(rng):
    nl, cap, m, ks, b, p = 16, 32, 8, 256, 4, 6
    codes = jnp.asarray(rng.integers(0, 256, (nl, cap, m),
                                     dtype=np.uint8))
    lids = jnp.asarray(rng.integers(0, nl, (b, p), dtype=np.int32))
    lut = jnp.asarray(rng.normal(size=(b, p, m, ks)).astype(np.float32))
    out = np.asarray(adc_scan_pallas(codes, lids, lut, interpret=True))

    codes_g = jnp.take(codes, lids, axis=0)      # [b,p,cap,m]
    ref = np.asarray(pq_ops.adc_scan(lut, codes_g))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
