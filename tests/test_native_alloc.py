import numpy as np
import pytest

from texturefusion_tpu.native.allocator import (NativeChunkAllocator,
                                                PyChunkAllocator,
                                                make_allocator)


def _backends(capacity):
    out = [PyChunkAllocator(capacity)]
    try:
        out.append(NativeChunkAllocator(capacity))
    except (RuntimeError, OSError):
        pass
    return out


def test_native_backend_builds():
    a = make_allocator(64)
    assert isinstance(a, NativeChunkAllocator), \
        "native toolchain present but build failed"


@pytest.mark.parametrize("backend", range(2))
def test_touch_lookup_release(backend):
    allocs = _backends(2048)
    if backend >= len(allocs):
        pytest.skip("native unavailable")
    a = allocs[backend]
    rng = np.random.default_rng(0)
    ids = rng.integers(-5, 5, (5000, 3)).astype(np.int32)
    uniq = np.unique(ids, axis=0)
    slots, new = a.touch(ids)
    assert len(slots) == len(uniq) == len(new)
    assert a.count() == len(uniq)
    # idempotent second touch: no new allocations
    slots2, new2 = a.touch(ids)
    assert len(new2) == 0
    assert sorted(slots2.tolist()) == sorted(slots.tolist())
    # lookup agrees
    lk = a.lookup(uniq)
    assert (lk >= 0).all()
    # export round-trips ids
    ids_out, used = a.export()
    assert used.sum() == len(uniq)
    got = ids_out[used]
    assert set(map(tuple, got.tolist())) == set(map(tuple, uniq.tolist()))
    # release then re-touch reallocates
    a.release(slots[:10])
    assert a.count() == len(uniq) - 10
    slots3, new3 = a.touch(uniq)
    assert a.count() == len(uniq)
    assert len(new3) == 10


def test_native_matches_python_semantics():
    # capacity above the max unique-id count so both backends allocate
    # everything (under exhaustion the admitted subset is order-dependent)
    allocs = _backends(8192)
    if len(allocs) < 2:
        pytest.skip("native unavailable")
    py, nat = allocs
    rng = np.random.default_rng(1)
    for step in range(5):
        ids = rng.integers(-8, 8, (2000, 3)).astype(np.int32)
        ps, pn = py.touch(ids)
        ns, nn = nat.touch(ids)
        assert len(ps) == len(ns)
        assert py.count() == nat.count()
        # same id-set allocated (slot numbering may differ)
        pids, pused = py.export()
        nids, nused = nat.export()
        assert set(map(tuple, pids[pused].tolist())) \
            == set(map(tuple, nids[nused].tolist()))
        # release a random subset by id
        drop = pids[pused][rng.permutation(pused.sum())[:50]]
        py.release(py.lookup(drop))
        nat.release(nat.lookup(drop))
        assert py.count() == nat.count()


def test_capacity_exhaustion():
    for a in _backends(8):
        ids = np.arange(30, dtype=np.int32).reshape(10, 3)
        slots, new = a.touch(ids)
        assert len(slots) == 8  # pool exhausted: extras skipped
        assert a.count() == 8


def test_import_state():
    for a in _backends(64):
        slots = np.asarray([3, 10, 63], np.int64)
        ids = np.asarray([[1, 2, 3], [-4, 5, -6], [7, -8, 9]], np.int32)
        a.import_state(slots, ids)
        assert a.count() == 3
        lk = a.lookup(ids)
        np.testing.assert_array_equal(lk, slots)
        # new allocations avoid imported slots
        s2, n2 = a.touch(np.asarray([[100, 100, 100]], np.int32))
        assert s2[0] not in slots
