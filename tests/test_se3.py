"""SE(3)/quaternion identities + Jacobian checks vs finite differences.

Mirrors the reference's okvis_kinematics/test/TestTransformation.cpp test
intent (oplus/lift Jacobian identities) but via JAX autodiff + numeric
differencing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.core import se3

pytestmark = pytest.mark.smoke

KEY = jax.random.PRNGKey(0)
F64 = jnp.float64


def rand_T(key, n=()):
    return se3.random_se3(key, n, dtype=F64)


def test_quat_multiply_vs_matrix():
    k1, k2 = jax.random.split(KEY)
    q1 = se3.quat_normalize(jax.random.normal(k1, (10, 4), F64))
    q2 = se3.quat_normalize(jax.random.normal(k2, (10, 4), F64))
    q12 = se3.quat_multiply(q1, q2)
    R12 = se3.quat_to_matrix(q12)
    R_expected = se3.quat_to_matrix(q1) @ se3.quat_to_matrix(q2)
    np.testing.assert_allclose(R12, R_expected, atol=1e-12)


def test_quat_rotate_matches_matrix():
    k1, k2 = jax.random.split(KEY)
    q = se3.quat_normalize(jax.random.normal(k1, (7, 4), F64))
    v = jax.random.normal(k2, (7, 3), F64)
    np.testing.assert_allclose(
        se3.quat_rotate(q, v),
        jnp.einsum("...ij,...j->...i", se3.quat_to_matrix(q), v),
        atol=1e-12,
    )


def test_matrix_quat_roundtrip():
    q = se3.quat_normalize(jax.random.normal(KEY, (50, 4), F64))
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-9)


def test_matrix_quat_roundtrip_near_pi():
    # rotations near 180 deg stress the non-w-dominant branches
    axis = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0],
                      [0.577, 0.577, 0.577]], dtype=F64)
    aa = axis * (np.pi - 1e-4)
    q = se3.delta_q(aa)
    q2 = se3.matrix_to_quat(se3.quat_to_matrix(q))
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-7)


def test_delta_q_log_roundtrip():
    a = jax.random.normal(KEY, (20, 3), F64) * 0.7
    np.testing.assert_allclose(se3.quat_log(se3.delta_q(a)), a, atol=1e-9)


def test_se3_compose_inverse():
    k1, k2 = jax.random.split(KEY)
    Ta, Tb = rand_T(k1, (5,)), rand_T(k2, (5,))
    M = se3.se3_matrix(se3.se3_multiply(Ta, Tb))
    np.testing.assert_allclose(M, se3.se3_matrix(Ta) @ se3.se3_matrix(Tb), atol=1e-12)
    Tinv = se3.se3_multiply(Ta, se3.se3_inverse(Ta))
    np.testing.assert_allclose(
        se3.se3_matrix(Tinv), np.broadcast_to(np.eye(4), (5, 4, 4)), atol=1e-12
    )


def test_se3_apply_matches_matrix():
    k1, k2 = jax.random.split(KEY)
    T = rand_T(k1)
    p = jax.random.normal(k2, (9, 3), F64)
    hp = jnp.concatenate([p, jnp.ones((9, 1), F64)], axis=-1)
    np.testing.assert_allclose(
        se3.se3_apply(T, p),
        (se3.se3_matrix(T) @ hp[..., None])[..., :3, 0],
        atol=1e-12,
    )
    np.testing.assert_allclose(
        se3.se3_apply_homogeneous(T, hp)[..., :3], se3.se3_apply(T, p), atol=1e-12
    )


def test_retract_local_delta_roundtrip():
    k1, k2 = jax.random.split(KEY)
    T = rand_T(k1, (6,))
    delta = jax.random.normal(k2, (6, 6), F64) * 0.5
    T2 = se3.retract(T, delta)
    np.testing.assert_allclose(se3.local_delta(T, T2), delta, atol=1e-9)


def test_retract_zero_is_identity():
    T = rand_T(KEY, (3,))
    np.testing.assert_allclose(se3.retract(T, jnp.zeros((3, 6), F64)), T, atol=1e-12)


def test_retract_jacobian_vs_finite_difference():
    """Autodiff through retract == numeric differencing (the property every
    factor Jacobian in the solver rests on)."""
    T = rand_T(KEY)

    def f(delta):
        Tp = se3.retract(T, delta)
        # probe through a nonlinear function of the pose
        p = jnp.array([0.3, -1.2, 2.0], dtype=F64)
        return se3.se3_apply(Tp, p)

    J = jax.jacfwd(f)(jnp.zeros(6, F64))
    eps = 1e-7
    J_num = np.zeros((3, 6))
    for i in range(6):
        d = np.zeros(6)
        d[i] = eps
        J_num[:, i] = (np.asarray(f(jnp.array(d))) - np.asarray(f(jnp.array(-d)))) / (
            2 * eps
        )
    np.testing.assert_allclose(J, J_num, atol=1e-6)


def test_interpolate_endpoints():
    k1, k2 = jax.random.split(KEY)
    Ta, Tb = rand_T(k1), rand_T(k2)
    np.testing.assert_allclose(se3.se3_interpolate(Ta, Tb, 0.0), Ta, atol=1e-12)
    Tm = se3.se3_interpolate(Ta, Tb, 1.0)
    np.testing.assert_allclose(se3.se3_matrix(Tm), se3.se3_matrix(Tb), atol=1e-9)


def test_cross_matrix():
    a = jnp.array([1.0, 2.0, 3.0], dtype=F64)
    b = jnp.array([-0.5, 0.7, 0.1], dtype=F64)
    np.testing.assert_allclose(se3.cross_matrix(a) @ b, jnp.cross(a, b), atol=1e-12)


def test_jit_and_vmap_compose():
    f = jax.jit(jax.vmap(se3.se3_multiply))
    T = rand_T(KEY, (8,))
    out = f(T, jax.vmap(se3.se3_inverse)(T))
    np.testing.assert_allclose(out[:, :3], 0.0, atol=1e-12)


def test_numpy_twins_match_jax():
    """core/se3np.py must agree with core/se3.py on random inputs — the
    host path uses the numpy twins to avoid eager device dispatches."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from okvis2x_tpu.core import se3, se3np

    key = jax.random.PRNGKey(7)
    Ta = np.asarray(se3.random_se3(key, (16,), jnp.float64))
    Tb = np.asarray(se3.random_se3(jax.random.PRNGKey(8), (16,), jnp.float64))
    d = np.asarray(
        0.3 * jax.random.normal(jax.random.PRNGKey(9), (16, 6), jnp.float64)
    )
    pts = np.asarray(
        jax.random.normal(jax.random.PRNGKey(10), (16, 3), jnp.float64)
    )

    pairs = [
        (se3np.se3_multiply(Ta, Tb), se3.se3_multiply(jnp.asarray(Ta), jnp.asarray(Tb))),
        (se3np.se3_inverse(Ta), se3.se3_inverse(jnp.asarray(Ta))),
        (se3np.retract(Ta, d), se3.retract(jnp.asarray(Ta), jnp.asarray(d))),
        (se3np.local_delta(Ta, Tb), se3.local_delta(jnp.asarray(Ta), jnp.asarray(Tb))),
        (se3np.se3_apply(Ta, pts), se3.se3_apply(jnp.asarray(Ta), jnp.asarray(pts))),
        (se3np.quat_to_matrix(Ta[:, 3:]), se3.quat_to_matrix(jnp.asarray(Ta[:, 3:]))),
        (se3np.delta_q(d[:, 3:]), se3.delta_q(jnp.asarray(d[:, 3:]))),
        (se3np.quat_log(Ta[:, 3:]), se3.quat_log(jnp.asarray(Ta[:, 3:]))),
        (se3np.se3_interpolate(Ta, Tb, 0.37),
         jax.vmap(lambda a, b: se3.se3_interpolate(a, b, 0.37))(
             jnp.asarray(Ta), jnp.asarray(Tb))),
        (se3np.cross_matrix(pts), se3.cross_matrix(jnp.asarray(pts))),
        (se3np.se3_apply_homogeneous(Ta, np.concatenate([pts, np.ones((16, 1))], 1)),
         se3.se3_apply_homogeneous(jnp.asarray(Ta),
                                   jnp.concatenate([jnp.asarray(pts), jnp.ones((16, 1))], 1))),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12)
