"""TexMex fvecs/ivecs reader round-trips + directory resolver
(reference fixtures: tests/README.md runs on siftsmall_base.fvecs)."""

import numpy as np
import pytest

from gamma_tpu.utils.datasets import (load_texmex_dir, read_fvecs,
                                      read_ivecs, write_fvecs,
                                      write_ivecs)


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 17)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    np.testing.assert_array_equal(read_fvecs(p), x)
    # count / offset windows
    np.testing.assert_array_equal(read_fvecs(p, count=10), x[:10])
    np.testing.assert_array_equal(read_fvecs(p, count=5, offset_rows=90),
                                  x[90:95])
    np.testing.assert_array_equal(read_fvecs(p, offset_rows=98), x[98:])


def test_ivecs_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    g = rng.integers(0, 1 << 20, size=(32, 100)).astype(np.int32)
    p = str(tmp_path / "g.ivecs")
    write_ivecs(p, g)
    np.testing.assert_array_equal(read_ivecs(p), g)


def test_corrupt_stride_rejected(tmp_path):
    p = str(tmp_path / "bad.fvecs")
    write_fvecs(p, np.zeros((4, 8), np.float32))
    with open(p, "ab") as f:
        f.write(b"xx")            # trailing garbage breaks the stride
    with pytest.raises(ValueError, match="stride"):
        read_fvecs(p)


def test_mixed_dims_rejected(tmp_path):
    p = str(tmp_path / "mixed.fvecs")
    a = np.empty((1, 9), "<f4")
    a[:, 0:1].view("<i4")[:] = 8
    a[:, 1:] = 0
    b = a.copy()
    b[:, 0:1].view("<i4")[:] = 7   # same stride only if we pad; force
    # two rows with same byte length but different declared dims
    with open(p, "wb") as f:
        a.tofile(f)
        b.tofile(f)
    with pytest.raises(ValueError, match="dim"):
        read_fvecs(p)


def test_load_texmex_dir(tmp_path):
    rng = np.random.default_rng(2)
    base = rng.normal(size=(200, 16)).astype(np.float32)
    q = rng.normal(size=(8, 16)).astype(np.float32)
    gt = rng.integers(0, 200, size=(8, 100)).astype(np.int32)
    write_fvecs(str(tmp_path / "sift_base.fvecs"), base)
    write_fvecs(str(tmp_path / "sift_query.fvecs"), q)
    write_ivecs(str(tmp_path / "sift_groundtruth.ivecs"), gt)
    out = load_texmex_dir(str(tmp_path), max_base=150)
    np.testing.assert_array_equal(out["base"], base[:150])
    np.testing.assert_array_equal(out["query"], q)
    np.testing.assert_array_equal(out["gt"], gt)
    assert load_texmex_dir(str(tmp_path / "nope")) is None
