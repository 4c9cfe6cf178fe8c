import jax.numpy as jnp
import numpy as np

from cvids_tpu.ops import brief, fast, hamming, image, klt


# ---------- hamming ----------

def _np_hamming(a, b):
    ab = np.unpackbits(a.view(np.uint8), axis=-1).astype(np.int32)
    bb = np.unpackbits(b.view(np.uint8), axis=-1).astype(np.int32)
    return np.sum(ab[:, None, :] != bb[None, :, :], axis=-1)


def test_hamming_matrix_matches_numpy(rng):
    a = rng.integers(0, 2**32, size=(20, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, size=(30, 8), dtype=np.uint32)
    d = np.asarray(hamming.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(d, _np_hamming(a, b))


def test_pack_unpack_roundtrip(rng):
    bits = rng.integers(0, 2, size=(5, 256)).astype(np.uint8)
    packed = hamming.pack_bits(jnp.asarray(bits))
    np.testing.assert_array_equal(np.asarray(hamming.unpack_bits(packed)), bits)


def test_match_descriptors_ratio_and_threshold(rng):
    base = rng.integers(0, 2**32, size=(10, 8), dtype=np.uint32)
    # b = copy of a with a few bit flips -> distances small and unique
    b = base.copy()
    b[:, 0] ^= 1  # 1-bit difference
    res = hamming.match_descriptors(jnp.asarray(base), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(res.indices), np.arange(10))
    assert np.asarray(res.valid).all()
    # identical rows in b kill the ratio test
    b2 = np.repeat(base[:1], 5, axis=0)
    res2 = hamming.match_descriptors(jnp.asarray(base[:1]), jnp.asarray(b2))
    assert not np.asarray(res2.valid).any()


def test_match_respects_validity_masks(rng):
    a = rng.integers(0, 2**32, size=(4, 8), dtype=np.uint32)
    b = np.concatenate([a, rng.integers(0, 2**32, (4, 8), dtype=np.uint32)])
    bv = np.zeros(8, dtype=bool)
    bv[4:] = True  # exact matches are invalid -> must not be selected
    res = hamming.match_descriptors(jnp.asarray(a), jnp.asarray(b), b_valid=jnp.asarray(bv))
    assert (np.asarray(res.indices) >= 4).all() or not np.asarray(res.valid).any()


# ---------- FAST ----------

def _synthetic_corners(h=96, w=128):
    img = np.zeros((h, w), np.float32)
    img[20:60, 30:90] = 200.0  # bright rectangle -> 4 corners
    return img


def test_fast_detects_rectangle_corners():
    img = _synthetic_corners()
    score = np.asarray(fast.fast_score_map(jnp.asarray(img), threshold=20.0))
    kps = fast.select_keypoints(jnp.asarray(score), max_num=8, cell=16)
    xy = np.asarray(kps.xy)[np.asarray(kps.valid)]
    assert len(xy) >= 4
    expected = np.array([[30, 20], [89, 20], [30, 59], [89, 59]], np.float32)
    for e in expected:
        d = np.linalg.norm(xy - e, axis=1).min()
        assert d <= 2.0, (e, xy)


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    score = fast.fast_score_map(img, threshold=20.0)
    assert float(jnp.max(score)) == 0.0


def test_select_keypoints_suppresses_existing():
    img = _synthetic_corners()
    score = fast.fast_score_map(jnp.asarray(img), threshold=20.0)
    kps = fast.select_keypoints(score, max_num=8, cell=16)
    first = np.asarray(kps.xy)[0]
    kps2 = fast.select_keypoints(score, max_num=8, cell=16,
                                 existing_xy=jnp.asarray(first[None]),
                                 existing_valid=jnp.asarray([True]),
                                 min_dist=10.0)
    xy2 = np.asarray(kps2.xy)[np.asarray(kps2.valid)]
    if len(xy2):
        assert np.linalg.norm(xy2 - first, axis=1).min() >= 10.0


# ---------- BRIEF ----------

def test_brief_descriptor_deterministic_and_discriminative(rng):
    img = rng.uniform(0, 255, size=(120, 160)).astype(np.float32)
    img_s = np.asarray(image.gaussian_blur(jnp.asarray(img), 3.0))  # smooth texture
    xy = jnp.asarray([[50.0, 50.0], [51.0, 50.0], [100.0, 60.0]])
    d1 = brief.compute_brief(jnp.asarray(img_s), xy)
    d2 = brief.compute_brief(jnp.asarray(img_s), xy)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    dm = np.asarray(hamming.hamming_distance_matrix(d1, d1))
    assert dm[0, 1] < dm[0, 2]  # neighbor closer than distant point
    assert dm[0, 0] == 0


# ---------- image ops ----------

def test_gaussian_blur_preserves_mean(rng):
    img = jnp.asarray(rng.uniform(0, 1, (64, 64)).astype(np.float32))
    out = image.gaussian_blur(img, 2.0)
    np.testing.assert_allclose(float(jnp.mean(out)), float(jnp.mean(img)), atol=5e-3)


def test_bilinear_sample_exact_on_grid(rng):
    img = jnp.asarray(rng.uniform(0, 1, (16, 16)).astype(np.float32))
    xy = jnp.asarray([[3.0, 5.0], [0.0, 0.0], [15.0, 15.0]])
    out = np.asarray(image.bilinear_sample(img, xy))
    np.testing.assert_allclose(out, [img[5, 3], img[0, 0], img[15, 15]], atol=1e-6)
    # out of bounds -> fill
    assert float(image.bilinear_sample(img, jnp.asarray([[-2.0, 3.0]]), fill=-7.0)[0]) == -7.0


def test_sobel_gradient_direction():
    x = jnp.tile(jnp.arange(32, dtype=jnp.float32), (32, 1))
    gx, gy = image.sobel(x)
    assert float(jnp.mean(gx[4:-4, 4:-4])) > 0
    np.testing.assert_allclose(np.asarray(gy[4:-4, 4:-4]), 0.0, atol=1e-5)


# ---------- KLT ----------

def _textured(rng, h=96, w=128):
    base = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))
    return np.asarray(image.gaussian_blur(jnp.asarray(img), 2.0))


def test_klt_tracks_pure_translation(rng):
    img0 = _textured(rng)
    shift = (3, 5)  # (dy, dx)
    img1 = np.roll(np.roll(img0, shift[0], axis=0), shift[1], axis=1)
    pts = jnp.asarray([[40.0, 40.0], [64.0, 30.0], [90.0, 60.0], [30.0, 70.0]])
    res = klt.track_points(jnp.asarray(img0), jnp.asarray(img1), pts, levels=3, iters=15)
    flow = np.asarray(res.xy) - np.asarray(pts)
    ok = np.asarray(res.valid)
    assert ok.sum() >= 3
    np.testing.assert_allclose(flow[ok], [[5.0, 3.0]] * int(ok.sum()), atol=0.25)


def test_klt_flags_lost_points(rng):
    img0 = _textured(rng)
    img1 = np.asarray(rng.uniform(0, 255, img0.shape).astype(np.float32))  # unrelated
    pts = jnp.asarray([[40.0, 40.0], [64.0, 48.0]])
    res = klt.track_points(jnp.asarray(img0), jnp.asarray(img1), pts, max_residual=20.0)
    assert not np.asarray(res.valid).all()


def test_brief_pattern_yaml_roundtrip(tmp_path):
    """Pattern file in the reference's brief_pattern.yml (OpenCV
    FileStorage) layout loads back identically and drives compute_brief."""
    from cvids_tpu.ops import brief

    pat = brief.brief_pattern(seed=3)
    path = str(tmp_path / "pattern.yml")
    brief.save_brief_pattern_yaml(path, pat)
    pat2 = brief.load_brief_pattern_yaml(path)
    assert (np.asarray(pat, np.int64) == pat2).all()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)), jnp.float32)
    xy = jnp.asarray([[32.0, 32.0], [30.0, 28.0]])
    d1 = np.asarray(brief.compute_brief(img, xy, pattern=pat))
    d2 = np.asarray(brief.compute_brief(img, xy, pattern=pat2))
    assert (d1 == d2).all()
