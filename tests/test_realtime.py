"""Realtime inverted-list invariants: append/publish, growth, tombstone,
compaction — the unit coverage the reference left commented out
(tests/CMakeLists.txt:38-44 test_realtime_mem_data.cc)."""

import numpy as np
import jax.numpy as jnp

from gamma_tpu.realtime import invert_index as rt


def make(nlist=4, cap=8, width=2):
    return rt.init_state(nlist, cap, width), rt.HostPlacer(nlist, cap)


def do_append(state, placer, list_ids, vids):
    list_ids = np.asarray(list_ids, np.int32)
    vids = np.asarray(vids, np.int64)
    codes = np.tile(vids[:, None] % 251, (1, state.code_width)).astype(np.uint8)
    pos, lens = placer.place(list_ids, vids)
    return rt.append(state, jnp.asarray(list_ids), jnp.asarray(pos),
                     jnp.asarray(codes), jnp.asarray(vids, jnp.int32),
                     jnp.asarray(vids, jnp.int32), jnp.asarray(lens))


def test_append_and_publish():
    state, placer = make()
    state = do_append(state, placer, [0, 1, 0, 2], [10, 11, 12, 13])
    lens = np.asarray(state.lens)
    np.testing.assert_array_equal(lens, [2, 1, 1, 0])
    vids = np.asarray(state.vids)
    assert set(vids[0, :2]) == {10, 12}
    assert vids[1, 0] == 11


def test_placement_is_dense_and_ordered():
    state, placer = make()
    state = do_append(state, placer, [3, 3, 3], [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(state.vids)[3, :3], [1, 2, 3])


def test_grow_preserves_entries():
    state, placer = make(cap=2)
    state = do_append(state, placer, [0, 0], [1, 2])
    state = rt.grow(state, 8)
    placer.cap = 8
    state = do_append(state, placer, [0, 0, 0], [3, 4, 5])
    np.testing.assert_array_equal(np.asarray(state.vids)[0, :5],
                                  [1, 2, 3, 4, 5])
    assert np.asarray(state.lens)[0] == 5


def test_tombstone_and_compact():
    state, placer = make(nlist=2, cap=16)
    state = do_append(state, placer, [0] * 10, list(range(10)))
    # delete vids 0..5 (60% of list 0)
    dead = np.arange(6)
    ls, ps = placer.locate(dead)
    state = rt.tombstone(state, jnp.asarray(ls, jnp.int32),
                         jnp.asarray(ps, jnp.int32))
    placer.mark_deleted(dead)
    assert placer.deleted_fraction() >= 0.3
    state = rt.compact_state(state)
    placer.resync_after_compact(np.asarray(state.docids),
                                np.asarray(state.vids),
                                np.asarray(state.lens))
    assert np.asarray(state.lens)[0] == 4
    np.testing.assert_array_equal(np.asarray(state.vids)[0, :4],
                                  [6, 7, 8, 9])
    # codes traveled with their entries
    np.testing.assert_array_equal(
        np.asarray(state.codes)[0, :4, 0], [6, 7, 8, 9])
    # placer can still locate survivors
    ls, ps = placer.locate(np.array([8]))
    assert ls[0] == 0 and ps[0] == 2


def test_update_in_new_list():
    """Update = tombstone + re-append (reference semantics when the vector
    moves cells, realtime_mem_data.cc:305-327)."""
    state, placer = make()
    state = do_append(state, placer, [0], [7])
    ls, ps = placer.locate(np.array([7]))
    state = rt.tombstone(state, jnp.asarray(ls, jnp.int32),
                         jnp.asarray(ps, jnp.int32))
    state = do_append(state, placer, [1], [7])
    # old slot dead, new slot live
    assert np.asarray(state.docids)[0, 0] == -1
    assert np.asarray(state.vids)[1, 0] == 7
    ls, ps = placer.locate(np.array([7]))
    assert ls[0] == 1


def test_padded_append_does_not_corrupt_last_list():
    """Regression: scatter mode="drop" does NOT drop negative indices —
    they wrap like numpy.  A padded append batch (list_id/pos/vid = -1
    filler) must leave the last list and last recon row untouched."""
    import jax.numpy as jnp
    st = rt.init_state(nlist=4, cap=8, code_width=2)
    # seed the last list with a known entry
    st = rt.append(st, jnp.asarray([3]), jnp.asarray([0]),
                   jnp.asarray([[7, 7]], jnp.uint8), jnp.asarray([42]),
                   jnp.asarray([42]), jnp.asarray([0, 0, 0, 1], jnp.int32))
    # an all-padding batch (what encode-quantum padding produces)
    pad = jnp.full((4,), -1, jnp.int32)
    st2 = rt.append(st, pad, pad, jnp.zeros((4, 2), jnp.uint8), pad, pad,
                    st.lens)
    assert int(st2.vids[3, 0]) == 42          # not overwritten
    assert int(st2.docids[3, 0]) == 42
    np.testing.assert_array_equal(np.asarray(st2.codes[3, 0]), [7, 7])
    # tombstone with -1 filler must also be inert
    st3 = rt.tombstone(st2, pad, pad)
    assert int(st3.vids[3, 0]) == 42


def test_device_placement_matches_host_placer(rng):
    """_place_batch (device-side slot assignment) must agree with
    HostPlacer.place on lens/need and produce a collision-free, dense
    placement starting at the prior lens."""
    import jax.numpy as jnp
    from gamma_tpu.index.ivfpq import _place_batch
    from gamma_tpu.realtime.invert_index import HostPlacer

    nlist = 16
    placer = HostPlacer(nlist, cap=64)
    lens0 = rng.integers(0, 5, nlist).astype(np.int32)
    placer.lens = lens0.copy()
    n, n_pad = 100, 128
    list_ids = rng.integers(0, nlist, n).astype(np.int32)
    vids = np.arange(n, dtype=np.int64)
    # host reference
    pos_h, lens_h = placer.place(list_ids, vids)
    # device: padded batch, pads marked vid=-1
    assign = np.zeros(n_pad, np.int32)
    assign[:n] = list_ids
    vp = np.full(n_pad, -1, np.int32)
    vp[:n] = vids
    pos_d, lens_d, need_d = _place_batch(
        jnp.asarray(lens0), jnp.asarray(assign), jnp.asarray(vp),
        nlist=nlist)
    pos_d = np.asarray(pos_d)[:n]
    np.testing.assert_array_equal(np.asarray(lens_d), lens_h)
    assert int(need_d) == int(lens_h.max())
    # same multiset of slots per list, no collisions, dense from lens0
    for l in range(nlist):
        got = sorted(pos_d[list_ids == l].tolist())
        want = sorted(pos_h[list_ids == l].tolist())
        assert got == want == list(
            range(lens0[l], lens0[l] + len(got)))


def test_lazy_drain_register_ordering(rng):
    """Adds retain device placements; delete() after many chunks drains
    them in order and the host placer must then agree with device state
    (lens, vid->(list,pos)), including the forced drain threshold."""
    import jax.numpy as jnp
    from gamma_tpu.index.ivfpq import IVFPQIndex
    from gamma_tpu.vector.raw_store import RawVectorStore
    from gamma_tpu.config import SearchParams

    n, d = 4096, 32
    x = rng.normal(size=(n, d)).astype(np.float32)
    store = RawVectorStore("v", d)
    store.add(x)
    store.flush_device()
    idx = IVFPQIndex(store, {"ncentroids": 32, "nsubvector": 8})
    idx.train(x)
    ids = np.arange(n, dtype=np.int64)
    for s in range(0, n, 512):             # 8 pending batches
        idx.add(x[s:s + 512], ids[s:s + 512], ids[s:s + 512])
    assert len(idx._pending_place) == 8
    dele = np.array([7, 700, 3000])
    idx.delete(dele)                       # forces the drain
    assert len(idx._pending_place) == 0
    # placer agrees with device state
    np.testing.assert_array_equal(idx.placer.lens,
                                  np.asarray(idx.state.lens))
    vids_np = np.asarray(idx.state.vids)
    ls, ps = idx.placer.locate(ids)
    live = np.ones(n, bool)
    live[dele] = False
    assert (vids_np[ls[live], ps[live]] == ids[live]).all()
    # tombstoned rows are dead on device
    assert (vids_np[ls[dele], ps[dele]] == -1).all()
    # and deleted docs don't come back from search
    sp = SearchParams.from_dict({"scan_mode": "dense",
                                 "recall_num": 64})
    _, docs, _ = idx.search(jnp.asarray(x[dele]),
                            jnp.asarray(np.zeros(n + 64, np.float32)),
                            sp, 10, validity_n=n)
    got = np.asarray(docs)
    for v in dele:
        assert v not in got
