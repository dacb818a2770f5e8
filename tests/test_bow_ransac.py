"""BoW place recognition + vectorised RANSAC tests."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.frontend import bow, ransac
from okvis2x_tpu.frontend.descriptor import DESC_BITS

RNG = np.random.default_rng(5)


def random_pm1(n):
    return jnp.asarray(RNG.integers(0, 2, (n, DESC_BITS)) * 2.0 - 1.0, jnp.bfloat16)


def perturb(pm1, flips):
    x = np.asarray(pm1, np.float32)
    for i in range(x.shape[0]):
        idx = RNG.integers(0, DESC_BITS, flips)
        x[i, idx] *= -1
    return jnp.asarray(x, jnp.bfloat16)


def test_vocab_assign_consistency():
    descs = random_pm1(512)
    vocab = bow.train_vocabulary(descs, k=32, iters=4)
    words = np.asarray(bow.assign_words(descs, vocab))
    assert words.shape == (512,)
    assert words.min() >= 0 and words.max() < 32
    # slightly perturbed descriptors mostly keep their word
    words2 = np.asarray(bow.assign_words(perturb(descs, 8), vocab))
    assert (words == words2).mean() > 0.7


def test_bow_database_retrieval():
    descs = random_pm1(600)
    vocab = bow.train_vocabulary(descs, k=64, iters=4)
    db = bow.BowDatabase(k=64)
    # 6 "places", each with a distinctive descriptor set
    place_desc = [random_pm1(80) for _ in range(6)]
    for fid, d in enumerate(place_desc):
        w = np.asarray(bow.assign_words(d, vocab))
        db.add(fid, w, np.ones(80, bool))
    # query with a noisy view of place 3
    q = perturb(place_desc[3], 12)
    wq = np.asarray(bow.assign_words(q, vocab))
    res = db.query(wq, np.ones(80, bool), top=3)
    assert res[0][0] == 3
    assert res[0][1] > 0.5


def test_ransac_known_rotation():
    n = 120
    pts = RNG.uniform([-3, -3, 2], [3, 3, 8], (n, 3))
    q_WC = np.asarray(se3.delta_q(jnp.asarray([0.1, -0.05, 0.3])))
    t_true = np.array([0.5, -0.3, 0.2])
    C = np.asarray(se3.quat_to_matrix(jnp.asarray(q_WC)))
    rays_C = (pts - t_true) @ C  # C_CW = C^T; (X - t) in C frame
    rays_C /= np.linalg.norm(rays_C, axis=-1, keepdims=True)
    # 30% outliers
    n_out = 36
    rays_C[:n_out] = RNG.normal(size=(n_out, 3))
    rays_C[:n_out] /= np.linalg.norm(rays_C[:n_out], axis=-1, keepdims=True)

    res = ransac.absolute_pose_known_rotation(
        jax.random.PRNGKey(0), jnp.asarray(q_WC), jnp.asarray(rays_C),
        jnp.asarray(pts), jnp.ones(n, bool),
    )
    assert int(res.num_inliers) > 70
    np.testing.assert_allclose(np.asarray(res.T[:3]), t_true, atol=5e-3)
    # outliers flagged
    assert np.asarray(res.inliers)[:n_out].mean() < 0.1


def test_ransac_p3p():
    n = 100
    pts = RNG.uniform([-3, -3, 2], [3, 3, 8], (n, 3))
    q_WC = np.asarray(se3.delta_q(jnp.asarray([0.05, 0.1, -0.2])))
    t_true = np.array([0.3, 0.1, -0.2])
    C = np.asarray(se3.quat_to_matrix(jnp.asarray(q_WC)))
    p_C = (pts - t_true) @ C
    depth = np.linalg.norm(p_C, axis=-1)
    rays_C = p_C / depth[:, None]
    n_out = 25
    rays_C[:n_out] = RNG.normal(size=(n_out, 3))
    rays_C[:n_out] /= np.linalg.norm(rays_C[:n_out], axis=-1, keepdims=True)

    res = ransac.absolute_pose_p3p_refined(
        jax.random.PRNGKey(1), jnp.asarray(rays_C), jnp.asarray(pts),
        jnp.ones(n, bool), jnp.asarray(depth),
    )
    assert int(res.num_inliers) > 60
    np.testing.assert_allclose(np.asarray(res.T[:3]), t_true, atol=1e-2)


def test_ransac_rotation_only():
    n = 80
    rays_a = RNG.normal(size=(n, 3))
    rays_a /= np.linalg.norm(rays_a, axis=-1, keepdims=True)
    q = se3.delta_q(jnp.asarray([0.02, 0.3, -0.1]))
    R = np.asarray(se3.quat_to_matrix(q))
    rays_b = rays_a @ R  # a = R b
    n_out = 16
    rays_b[:n_out] = RNG.normal(size=(n_out, 3))
    rays_b[:n_out] /= np.linalg.norm(rays_b[:n_out], axis=-1, keepdims=True)

    res = ransac.relative_rotation_2pt(
        jax.random.PRNGKey(2), jnp.asarray(rays_a), jnp.asarray(rays_b),
        jnp.ones(n, bool),
    )
    assert int(res.num_inliers) > 55
    dq = se3.quat_multiply(se3.quat_conjugate(res.T[3:7]), q)
    assert float(jnp.linalg.norm(se3.quat_log(dq))) < 5e-3


def test_shipped_vocabulary_fresh_session_recall():
    """The committed pretrained vocabulary (okvis2x_tpu/resources/
    vocab_b64l64.npz ≙ the reference shipping resources/small_voc.yml.gz,
    Frontend.cpp:91-115) must give place-recognition recall in a FRESH
    session with zero online training: real rendered circuit views,
    revisits retrieved over distractor places."""
    import os

    from okvis2x_tpu.cameras import pinhole, pinhole_np
    from okvis2x_tpu.frontend import descriptor, detector
    from okvis2x_tpu.io import synthetic

    path = os.path.join(
        os.path.dirname(bow.__file__), "..", "resources", "vocab_b64l64.npz"
    )
    assert os.path.exists(path), "vocabulary artifact must be committed"
    vocab = bow.HierVocabulary.load(path)
    assert vocab.n_words == 64 * 64

    cam = pinhole.make_pinhole(
        fx=460.0, fy=460.0, cx=376.0, cy=240.0, width=752, height=480,
        model="radtan", dist_params=[-0.25, 0.06, 1e-4, -1e-4],
    )
    cam_np = pinhole_np.to_numpy(cam)
    # scene seed disjoint from the trainer's corpus (tools/train_vocab.py
    # uses seeds 100-105 / 200-203)
    pts, b, r = synthetic.make_circuit_scene(density=20.0, seed=77)
    center = pts.mean(0)
    rng = np.random.default_rng(9)

    @jax.jit
    def detect(img):
        kp = detector.detect(img, max_keypoints=512, octaves=1, cell=32,
                             per_cell=8, threshold=1e-7)
        packed, pm1 = descriptor.extract(
            img, kp.uv, jnp.zeros((512,)), kp.level, kp.valid)
        return pm1, kp.valid

    def view(x, y, yaw, seed):
        T_WC = np.r_[center + np.array([x, y, -center[2]]),
                     np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])]
        img = synthetic.render_image(cam_np, T_WC, pts, b, r, seed=seed)
        return detect(jnp.asarray(img))

    db = bow.BowDatabase(k=vocab.n_words)
    places = [(-4.0, -4.0, 0.3), (4.0, -4.0, 1.8), (4.0, 4.0, 3.4),
              (-4.0, 4.0, 5.0), (0.0, 0.0, 0.0), (2.0, -2.0, 2.6)]
    for fid, (x, y, yaw) in enumerate(places):
        pm1, valid = view(x, y, yaw, seed=fid)
        words = np.asarray(bow.assign(pm1, vocab))
        db.add(fid, words, np.asarray(valid))

    # revisit each place from a slightly offset pose.  The dot-field
    # circuit scene is deliberately self-similar, so require the correct
    # place among the top-3 candidates for every revisit (the pipeline
    # geometrically verifies several candidates, vio._geometric_verify)
    # and top-1 for half.
    top1 = 0
    top2 = 0
    for fid, (x, y, yaw) in enumerate(places):
        dx, dy = rng.uniform(-0.3, 0.3, 2)
        pm1, valid = view(x + dx, y + dy, yaw + rng.uniform(-0.05, 0.05),
                          seed=100 + fid)
        words = np.asarray(bow.assign(pm1, vocab))
        res = db.query(words, np.asarray(valid), top=3)
        got = [r[0] for r in res]
        top1 += bool(got and got[0] == fid)
        top2 += fid in got
    assert top2 == 6, f"fresh-session top-3 recall {top2}/6"
    assert top1 >= 3, f"fresh-session top-1 recall {top1}/6"
