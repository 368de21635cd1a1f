"""zstd block-compressed storage (native ZStore).

Reference contract: storage/compress/compressor_zstd.h (table blocks) +
compressor_zfp.h (vector blocks) behind the Block/LRUCache read path
(storage/block.h:36, storage/lru_cache.h:332) — blocks are compressed at
rest and decompressed through a cache on read; point updates never
rewrite a sealed block.
"""

import os

import numpy as np
import pytest

from gamma_tpu import (Doc, EngineConfig, FieldInfo, GammaEngine,
                       Request, TableInfo, VectorInfo, VectorQuery, native)
from gamma_tpu.config import DataType

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()),
    reason="libgamma_host.so unavailable")


def test_zblock_roundtrip_update_truncate(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(10_500, 32)).astype(np.float32)
    z = native.ZBlockStorage(str(tmp_path), "v", row_bytes=32 * 4,
                             rows_per_block=1000, cache_blocks=4)
    z.add(base[:7000])
    z.add(base[7000:])
    assert len(z) == 10_500
    got = z.get_range(3210, 500, np.float32).reshape(-1, 32)
    assert np.array_equal(got, base[3210:3710])
    # update a sealed row (overlay) and a tail row (in place)
    z.update(5, base[9999])
    z.update(10_400, base[1])
    assert np.array_equal(
        z.get_range(5, 1, np.float32).reshape(32), base[9999])
    assert np.array_equal(
        z.get_range(10_400, 1, np.float32).reshape(32), base[1])
    z.sync()
    z.close()

    # reopen: sealed frames + synced tail + overlay all restore
    z2 = native.ZBlockStorage(str(tmp_path), "v", row_bytes=32 * 4,
                              rows_per_block=1000, cache_blocks=4)
    assert len(z2) == 10_500
    assert np.array_equal(
        z2.get_range(5, 1, np.float32).reshape(32), base[9999])
    assert np.array_equal(
        z2.get_range(10_000, 500, np.float32).reshape(-1, 32)[400],
        base[1])

    # truncate into a sealed block: kept rows melt back into the tail
    z2.truncate(4321)
    assert len(z2) == 4321
    assert np.array_equal(
        z2.get_range(4000, 321, np.float32).reshape(-1, 32),
        base[4000:4321])
    z2.add(base[:679])
    assert np.array_equal(
        z2.get_range(4321, 679, np.float32).reshape(-1, 32), base[:679])
    hits, misses = z2.cache_stats()
    assert misses > 0          # reads actually went through the cache
    z2.close()


def test_zblock_truncate_keeps_overlay_inside_kept_prefix(tmp_path):
    rng = np.random.default_rng(1)
    base = rng.normal(size=(3000, 8)).astype(np.float32)
    z = native.ZBlockStorage(str(tmp_path), "o", row_bytes=32,
                             rows_per_block=1000)
    z.add(base)
    z.update(1500, base[0])          # sealed-row overlay in block 1
    z.truncate(1600)                 # cut inside block 1, after the update
    assert np.array_equal(
        z.get_range(1500, 1, np.float32).reshape(8), base[0])
    z.close()


def test_zblock_compresses_compressible_rows(tmp_path):
    # realistic table-block payload: small-cardinality int64 column
    vals = (np.arange(200_000, dtype=np.int64) % 97)
    z = native.ZBlockStorage(str(tmp_path), "c", row_bytes=8,
                             rows_per_block=8192)
    z.add(vals)
    z.sync()
    assert z.comp_bytes() < vals.nbytes / 4, \
        f"ratio {z.comp_bytes() / vals.nbytes:.2f}"
    assert np.array_equal(z.get_range(0, 200_000, np.int64), vals)
    z.close()


def test_zblock_torn_frame_recovery(tmp_path):
    """A partially-written final frame (crash mid-seal) is discarded on
    reopen; the sealed prefix plus the synced tail survive."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(2500, 16)).astype(np.float32)
    z = native.ZBlockStorage(str(tmp_path), "t", row_bytes=64,
                             rows_per_block=1000)
    z.add(base)                      # 2 sealed blocks + 500-row tail
    z.sync()
    z.close()
    # simulate a torn frame: garbage appended to the data file
    with open(tmp_path / "t.zblk", "ab") as f:
        f.write(b"\x4b\x4c\x42\x5atorn-frame-garbage")
    z2 = native.ZBlockStorage(str(tmp_path), "t", row_bytes=64,
                              rows_per_block=1000)
    assert len(z2) == 2500
    assert np.array_equal(
        z2.get_range(0, 2500, np.float32).reshape(-1, 16), base)
    # and the store keeps working after recovery
    z2.add(base[:700])
    assert np.array_equal(
        z2.get_range(2500, 700, np.float32).reshape(-1, 16), base[:700])
    z2.close()


def test_engine_compressed_persistence_roundtrip(tmp_path):
    """Engine e2e with zstd-compressed table columns AND vector segments:
    ingest → update → dump → restart → values and search intact, and the
    on-disk vector payload is actually block-compressed."""
    dim = 16
    rng = np.random.default_rng(3)
    # low-rank rows compress well (and are realistic embedding payloads)
    # 5000 rows x 16 d = 64 B rows -> 4096-row blocks: block 0 seals,
    # so the restart exercises sealed frames + overlay + tail together
    x = (rng.normal(size=(5000, 4)) @ rng.normal(size=(4, dim))
         ).astype(np.float32)
    eng = GammaEngine(EngineConfig(path=str(tmp_path),
                                   compress_table_blocks=True))
    eng.create_table(TableInfo(
        name="zc",
        fields=[FieldInfo("price", DataType.FLOAT, is_index=True),
                FieldInfo("tag", DataType.STRING, is_index=True)],
        vectors=[VectorInfo("vec", dim,
                            store_param={"compress": "zstd"})],
        indexing_size=100_000,
        retrieval_types=["FLAT"], retrieval_params=[{}]))
    eng.add_or_update_docs([
        Doc(key=f"k{i}", fields={"price": float(i), "tag": f"t{i % 3}"},
            vectors={"vec": x[i]}) for i in range(5000)])
    # point-update a row that will already be sealed
    eng.add_or_update_doc(Doc(key="k5", fields={"price": 5555.0,
                                                "tag": "tz"},
                              vectors={"vec": x[7]}))
    eng.flush()
    eng.dump()
    assert os.path.exists(tmp_path / "store" / "vec_vec.zblk")
    assert not os.path.exists(tmp_path / "store" / "vec_vec.seg0")
    # at least one block sealed: compressed frames actually on disk
    assert os.path.getsize(tmp_path / "store" / "vec_vec.zblk") > 0
    eng.close()

    eng2 = GammaEngine(EngineConfig(path=str(tmp_path),
                                    compress_table_blocks=True))
    assert eng2.load() == 0
    assert eng2.table.n == 5000
    doc = eng2.get_doc_by_key("k5")
    assert doc is not None
    assert float(doc["price"]) == 5555.0
    assert doc["tag"] == "tz"
    res = eng2.search(Request(
        topn=3, vec_fields=[VectorQuery("vec", x[7])],
        brute_force_search=True))
    keys = [it.key for it in res.results[0].result_items]
    assert "k5" in keys[:2]          # updated vector is searchable
    eng2.close()
