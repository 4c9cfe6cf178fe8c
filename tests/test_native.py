import numpy as np
import pytest

from cvids_tpu import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library not built")


@needs_native
def test_native_max_clique_matches_known(rng):
    a = np.zeros((8, 8), np.uint8)
    for i, j in [(0, 1), (1, 2), (0, 2), (2, 3), (4, 5), (5, 6), (4, 6), (6, 7), (4, 7), (5, 7)]:
        a[i, j] = a[j, i] = 1
    cl = native.max_clique_native(a)
    assert sorted(cl) == [4, 5, 6, 7]


@needs_native
def test_native_max_clique_dense_and_empty():
    assert len(native.max_clique_native(np.ones((25, 25), np.uint8))) == 25
    assert len(native.max_clique_native(np.zeros((5, 5), np.uint8))) == 1
    assert len(native.max_clique_native(np.zeros((0, 0), np.uint8))) == 0


@needs_native
def test_native_heuristic_large_random(rng):
    n = 60
    a = (rng.random((n, n)) < 0.3)
    a = (a | a.T).astype(np.uint8)
    np.fill_diagonal(a, 0)
    # plant a clique of 12
    planted = rng.choice(n, 12, replace=False)
    for i in planted:
        for j in planted:
            if i != j:
                a[i, j] = 1
    cl = native.max_clique_native(a)
    assert len(cl) >= 12


@needs_native
def test_native_bow_index_matches_dense(rng):
    w = 200
    idx = native.NativeBowIndex(w)
    vecs = []
    for i in range(30):
        v = np.zeros(w, np.float32)
        nz = rng.choice(w, 12, replace=False)
        v[nz] = rng.random(12).astype(np.float32)
        v /= v.sum()
        vecs.append(v)
        idx.add(v, client_id=i % 3)
    q = vecs[7]
    scores = idx.query(q)
    # dense reference: sum of min(q, d) per entry
    ref = np.array([np.minimum(q, d).sum() for d in vecs], np.float32)
    np.testing.assert_allclose(scores, ref, atol=1e-6)
    assert np.argmax(scores) == 7
    # exclusion threshold
    s2 = idx.query(q, exclude_from=7)
    assert (s2[7:] == 0).all()


@needs_native
def test_pcm_uses_native(rng):
    from cvids_tpu.server import pcm
    a = np.zeros((10, 10), bool)
    a[:6, :6] = True
    cl = pcm.max_clique(a)
    assert sorted(cl) == [0, 1, 2, 3, 4, 5]
