"""Frontend kernel tests: detector, descriptor, matcher, triangulation."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.frontend import descriptor, detector, matcher, triangulation

RNG = np.random.default_rng(11)


def checkerboard(h=240, w=320, sq=24):
    y, x = np.mgrid[0:h, 0:w]
    img = (((y // sq) + (x // sq)) % 2).astype(np.float32)
    return img


def textured(h=240, w=320):
    img = RNG.uniform(0, 1, (h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    return img


def test_detector_finds_checkerboard_corners():
    img = checkerboard()
    kp = detector.detect(jnp.asarray(img), max_keypoints=256, octaves=1, border=10)
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert len(uv) > 20
    # detected corners should sit near multiples of the square size
    d = np.abs((uv % 24) - 0)  # corner junctions at multiples of 24
    d = np.minimum(d, 24 - d)
    frac_near = (np.linalg.norm(d, axis=-1) < 3.0).mean()
    assert frac_near > 0.8, frac_near


def test_detector_static_shapes_jit():
    img = jnp.asarray(textured())
    f = jax.jit(lambda im: detector.detect(im, max_keypoints=128, octaves=2))
    kp = f(img)
    assert kp.uv.shape == (128, 2)
    kp2 = f(img * 0.5 + 0.1)  # same shapes, no recompile needed
    assert kp2.uv.shape == (128, 2)


def test_descriptor_match_same_image():
    img = jnp.asarray(textured())
    kp = detector.detect(img, max_keypoints=96, octaves=1)
    ang = jnp.zeros(96, jnp.float32)
    packed, pm1 = descriptor.extract(img, kp.uv, ang, kp.level, kp.valid)
    m = matcher.match(pm1, pm1, max_dist=10.0)
    nv = int(np.asarray(kp.valid).sum())
    idx = np.asarray(m.idx_b)[:nv]
    assert (idx == np.arange(nv)).mean() > 0.95
    assert np.asarray(m.dist)[:nv].max() == 0.0


def test_descriptor_packing_consistency():
    img = jnp.asarray(textured())
    kp = detector.detect(img, max_keypoints=64, octaves=1)
    ang = jnp.zeros(64, jnp.float32)
    packed, pm1 = descriptor.extract(img, kp.uv, ang, kp.level, kp.valid)
    pm1_un = descriptor.unpack_pm1(packed, kp.valid)
    np.testing.assert_array_equal(np.asarray(pm1_un), np.asarray(pm1))


def test_matmul_hamming_equals_popcount():
    n, m = 32, 48
    bits_a = RNG.integers(0, 2, (n, descriptor.DESC_BITS)).astype(np.uint32)
    bits_b = RNG.integers(0, 2, (m, descriptor.DESC_BITS)).astype(np.uint32)
    pm1_a = jnp.asarray(2.0 * bits_a - 1.0, jnp.bfloat16)
    pm1_b = jnp.asarray(2.0 * bits_b - 1.0, jnp.bfloat16)
    D = np.asarray(matcher.hamming_matrix(pm1_a, pm1_b))
    D_ref = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, D_ref)


def test_matcher_threshold_and_mutual():
    bits = RNG.integers(0, 2, (20, descriptor.DESC_BITS)).astype(np.uint32)
    # b = a with a few flipped bits for first 10; rest random
    bits_b = bits.copy()
    flip = RNG.integers(0, descriptor.DESC_BITS, (20, 5))
    for i in range(20):
        bits_b[i, flip[i]] ^= 1
    pm1_a = jnp.asarray(2.0 * bits - 1.0, jnp.bfloat16)
    pm1_b = jnp.asarray(2.0 * bits_b - 1.0, jnp.bfloat16)
    m = matcher.match(pm1_a, pm1_b, max_dist=60.0, mutual=True)
    assert bool(m.valid.all())
    assert (np.asarray(m.idx_b) == np.arange(20)).all()
    assert np.asarray(m.dist).max() <= 5


def test_triangulation_recovers_point():
    pt = jnp.asarray(np.array([[0.3, -0.2, 4.0], [-1.0, 0.5, 2.0]]))
    p_A = jnp.zeros((2, 3))
    p_B = jnp.asarray(np.tile([0.11, 0.0, 0.0], (2, 1)))
    e_A = pt / jnp.linalg.norm(pt, axis=-1, keepdims=True)
    d = pt - p_B
    e_B = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tri = triangulation.triangulate(p_A, e_A, p_B, e_B)
    assert bool(tri.valid.all())
    assert not bool(tri.parallel.any())
    hp = np.asarray(tri.hp_A)
    np.testing.assert_allclose(hp[:, :3] / hp[:, 3:4], np.asarray(pt), atol=1e-6)


def test_triangulation_parallel_rays():
    e = jnp.asarray([[0.0, 0.0, 1.0]])
    tri = triangulation.triangulate(
        jnp.zeros((1, 3)), e, jnp.asarray([[0.11, 0.0, 0.0]]), e
    )
    assert bool(tri.parallel[0])
    assert float(tri.hp_A[0, 3]) == 0.0  # point at infinity
