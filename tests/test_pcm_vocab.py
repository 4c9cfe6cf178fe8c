import jax.numpy as jnp
import numpy as np

from cvids_tpu.server import pcm, vocab


# ---------- max clique ----------

def test_max_clique_exact_small():
    a = np.zeros((6, 6), bool)
    for i, j in [(0, 1), (1, 2), (0, 2), (3, 4)]:
        a[i, j] = a[j, i] = True
    cl = pcm.max_clique(a)
    assert sorted(cl) == [0, 1, 2]


def test_max_clique_dense_terminates():
    assert len(pcm.max_clique(np.ones((30, 30), bool))) == 30
    assert len(pcm.max_clique(np.zeros((5, 5), bool))) == 1
    assert len(pcm.max_clique(np.zeros((0, 0), bool))) == 0


# ---------- PCM consistency ----------

def make_edges(rng, n_good=15, n_bad=5):
    """Two agents on known trajectories; good edges = true relative pose,
    bad edges = corrupted."""
    e = n_good + n_bad
    # endpoint odometry poses in each client's local frame
    yaw_i = rng.uniform(-1, 1, e).astype(np.float32)
    t_i = rng.normal(0, 3, (e, 3)).astype(np.float32)
    yaw_j = rng.uniform(-1, 1, e).astype(np.float32)
    t_j = rng.normal(0, 3, (e, 3)).astype(np.float32)
    # true world transform of client b's frame wrt a's frame
    yaw_ab, t_ab = 0.7, np.array([2.0, -1.0, 0.5], np.float32)

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    # edge i->j true: T_i^w = (yaw_i, t_i) in a-frame; j pose in a-frame:
    # (yaw_ab + yaw_j, rz(yaw_ab) t_j + t_ab); edge = inv(T_i) * T_j_in_a
    edge_yaw = np.zeros(e, np.float32)
    edge_t = np.zeros((e, 3), np.float32)
    for k in range(e):
        yawj_a = yaw_ab + yaw_j[k]
        tj_a = rz(yaw_ab) @ t_j[k] + t_ab
        edge_yaw[k] = yawj_a - yaw_i[k]
        edge_t[k] = rz(yaw_i[k]).T @ (tj_a - t_i[k])
    # corrupt the bad ones
    edge_yaw[n_good:] += rng.uniform(0.3, 1.0, n_bad) * rng.choice([-1, 1], n_bad)
    edge_t[n_good:] += rng.uniform(1.0, 3.0, (n_bad, 3))
    return (pcm.FourDof(jnp.asarray(edge_yaw), jnp.asarray(edge_t)),
            pcm.FourDof(jnp.asarray(yaw_i), jnp.asarray(t_i)),
            pcm.FourDof(jnp.asarray(yaw_j), jnp.asarray(t_j)))


def test_pcm_filters_outliers(rng):
    edge_T, pose_i, pose_j = make_edges(rng)
    keep = pcm.pcm_filter(edge_T, pose_i, pose_j, np.ones(20, bool),
                          min_edges=10)
    assert keep[:15].all(), keep
    assert not keep[15:].any(), keep


def test_pcm_passthrough_below_min_edges(rng):
    edge_T, pose_i, pose_j = make_edges(rng, n_good=3, n_bad=2)
    keep = pcm.pcm_filter(edge_T, pose_i, pose_j, np.ones(5, bool),
                          min_edges=20)
    assert keep.all()


# ---------- vocabulary ----------

def test_vocab_quantize_consistency(rng):
    descs = rng.integers(0, 2 ** 32, (500, 8), dtype=np.uint32)
    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=1)
    words = np.asarray(vocab.quantize(voc, jnp.asarray(descs)))
    assert words.min() >= 0 and words.max() < voc.num_words
    # identical descriptors -> identical words
    w2 = np.asarray(vocab.quantize(voc, jnp.asarray(descs[:10])))
    np.testing.assert_array_equal(words[:10], w2)


def test_bow_self_similarity(rng):
    descs = rng.integers(0, 2 ** 32, (400, 8), dtype=np.uint32)
    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=1)
    set_a = jnp.asarray(descs[:50])
    set_b = jnp.asarray(descs[40:90])   # 10 shared
    set_c = jnp.asarray(descs[200:250])  # disjoint
    va = vocab.bow_vector(voc, set_a)
    vb = vocab.bow_vector(voc, set_b)
    vc = vocab.bow_vector(voc, set_c)
    s_ab = float(vocab.score_database(va, vb[None])[0])
    s_ac = float(vocab.score_database(va, vc[None])[0])
    s_aa = float(vocab.score_database(va, va[None])[0])
    assert s_aa > 0.99
    assert s_ab > s_ac


def test_bow_database_query_excludes_recent(rng):
    descs = rng.integers(0, 2 ** 32, (300, 8), dtype=np.uint32)
    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=1)
    db = vocab.BowDatabase(voc, capacity=32)
    v = np.asarray(vocab.bow_vector(voc, jnp.asarray(descs[:60])))
    for _ in range(5):
        db.add(v, client_id=0)
    idx, scores = db.query(v, query_client=0, exclude_recent=10)
    assert (scores <= 0).all()  # everything is recent & same client
    idx, scores = db.query(v, query_client=1, exclude_recent=10)
    assert scores[0] > 0.99  # other clients see them


def test_query_and_add_matches_query_then_add(rng):
    """The fused per-keyframe ingest step (`query_and_add`: one tree descent,
    device-built exclusion mask, in-place insert) returns exactly what the
    separate query()+add() pair returns, on both database classes, across a
    capacity-growth boundary."""
    descs = rng.integers(0, 2 ** 32, (300, 8), dtype=np.uint32)
    frames = [descs[rng.integers(0, 300, 60)] for _ in range(20)]

    voc = vocab.train_vocabulary(descs, k=5, levels=2, seed=1)
    a = vocab.BowDatabase(voc, capacity=8)    # forces growth at frame 8
    b = vocab.BowDatabase(voc, capacity=8)
    for i, f in enumerate(frames):
        v = vocab.bow_vector(voc, jnp.asarray(f))
        i1, s1 = a.query(v, i % 3, exclude_recent=4)
        a.add(v, i % 3)
        i2, s2 = b.query_and_add(v, i % 3, exclude_recent=4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)

    tree = vocab.synthesize_tree_vocabulary(k=6, levels=3, seed=0)
    c = vocab.SparseBowDatabase(tree, capacity=8, words_per_frame=64)
    d = vocab.SparseBowDatabase(tree, capacity=8, words_per_frame=64)
    for i, f in enumerate(frames):
        fj = jnp.asarray(f)
        i1, s1 = c.query(fj, i % 3, exclude_recent=4)
        c.add_descriptors(fj, i % 3)
        i2, s2 = d.query_and_add(fj, i % 3, exclude_recent=4)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
    assert c.count == d.count == len(frames)


def test_dbow_binary_roundtrip_and_sparse_db(rng, tmp_path):
    """DBoW2 binary format save/load round-trip, explicit-tree quantization
    consistency with the implicit tree, and sparse-database retrieval."""
    from cvids_tpu.server import vocab as V

    desc = rng.integers(0, 2**32, (400, 8), dtype=np.uint32)
    voc = V.train_vocabulary(desc, k=4, levels=3, seed=0)
    tree = V.tree_from_trained(voc)

    # quantization through the explicit tree == through the implicit one
    q = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
    w_imp = np.asarray(V.quantize(voc, jnp.asarray(q)))
    w_tree = np.asarray(V.quantize_tree(tree, jnp.asarray(q)))
    assert (w_imp == w_tree).all()

    # binary format round-trip (the reference's VocabularyBinary layout)
    path = str(tmp_path / "voc.bin")
    V.save_dbow_binary(path, tree)
    tree2 = V.load_dbow_binary(path)
    assert tree2.k == tree.k and tree2.levels == tree.levels
    assert tree2.num_words == tree.num_words
    w_tree2 = np.asarray(V.quantize_tree(tree2, jnp.asarray(q)))
    assert (w_tree2 == w_tree).all()
    assert np.allclose(tree2.weights, tree.weights, atol=1e-6)

    # sparse database: a revisited frame scores highest
    db = V.SparseBowDatabase(tree2, capacity=64, words_per_frame=64)
    frames = [rng.integers(0, 2**32, (60, 8), dtype=np.uint32)
              for _ in range(12)]
    for i, fr in enumerate(frames):
        db.add_descriptors(fr, client_id=0 if i < 6 else 1)
    # query with a noisy copy of frame 2 (flip a few bits), as client 1
    noisy = frames[2].copy()
    noisy[:5] ^= 1 << 7
    idx, scores = db.query(noisy, query_client=1, exclude_recent=2, top_k=3)
    assert idx[0] == 2, (idx, scores)
    assert scores[0] > scores[1] + 0.05


def test_synthesized_vocabulary_at_scale(tmp_path, rng):
    """Reference-scale vocabulary mechanics: a synthesized 10^5-word k=10
    tree quantizes, round-trips the DBoW2 binary format exactly, and serves
    retrieval through the sparse database (VERDICT r2 item 6)."""
    import jax.numpy as jnp
    tree = vocab.synthesize_tree_vocabulary(k=10, levels=5, seed=0)
    assert tree.num_words == 10 ** 5
    # binary round trip (the brief_k10L6.bin format at real node counts)
    path = str(tmp_path / "synth_k10L5.bin")
    vocab.save_dbow_binary(path, tree)
    tree2 = vocab.load_dbow_binary(path)
    assert tree2.num_words == tree.num_words
    desc = rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint32)
    w1 = np.asarray(vocab.quantize_tree(tree, jnp.asarray(desc)))
    w2 = np.asarray(vocab.quantize_tree(tree2, jnp.asarray(desc)))
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and w1.max() < tree.num_words
    # retrieval: a frame must retrieve itself decisively over others
    db = vocab.SparseBowDatabase(tree, capacity=64)
    frames = [rng.integers(0, 2 ** 32, (128, 8), dtype=np.uint32)
              for _ in range(6)]
    for i, f in enumerate(frames):
        db.add_descriptors(jnp.asarray(f), client_id=0)
    idx, scores = db.query(jnp.asarray(frames[2]), query_client=1,
                           exclude_recent=0)
    assert idx[0] == 2
    assert scores[0] > 0.99
    assert scores[1] < 0.5 * scores[0]


def test_generic_vocabulary_deterministic_and_cached():
    """The held-out vocabulary (the pretrained-brief_k10L6.bin posture) is
    deterministic per (k, levels, seed), process-cached, and usable by the
    sparse BoW machinery."""
    import numpy as np

    from cvids_tpu.server import vocab

    t1 = vocab.generic_vocabulary(k=4, levels=2, seed=7)
    t2 = vocab.generic_vocabulary(k=4, levels=2, seed=7)
    assert t2 is t1                       # cached
    assert t1.num_words == 16
    # a fresh build with the same key reproduces the same tree
    vocab._GENERIC_CACHE.pop((4, 2, 7))
    t3 = vocab.generic_vocabulary(k=4, levels=2, seed=7)
    np.testing.assert_array_equal(np.asarray(t1.node_desc),
                                  np.asarray(t3.node_desc))
    # and it quantizes arbitrary descriptors without error
    rng = np.random.default_rng(0)
    d = rng.integers(0, 2 ** 32, (32, 8), dtype=np.uint32)
    words = np.asarray(vocab.quantize_tree(t1, d))
    assert words.shape == (32,) and (words >= 0).all()
    assert (words < t1.num_words).all()
