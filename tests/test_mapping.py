"""Occupancy submap + SubmapIcp factor tests (mirrors okvis_ceres/test/
TestSubmapIcpError.cpp: Jacobian checks and optimisation against a synthetic
occupancy submap; plus voxel-filter invariants from okvis_mapping/test/
voxelGridTests.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.mapping import icp_factor, lidar
from okvis2x_tpu.mapping import submap as sm_mod

F32 = jnp.float32
CFG = sm_mod.SubmapConfig(dim=64, res=0.2)
RNG = np.random.default_rng(9)


def make_wall_submap():
    """Integrate rays hitting a plane at z = 2 m (sensor at origin)."""
    sm = sm_mod.new_submap(np.array([0, 0, 0, 0, 0, 0, 1.0]), CFG)
    xs = np.linspace(-3, 3, 40)
    ys = np.linspace(-3, 3, 40)
    gx, gy = np.meshgrid(xs, ys)
    end = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.0)], -1)
    for _ in range(3):  # a few passes to saturate log odds
        sm = sm_mod.integrate_rays(
            sm, CFG, jnp.zeros(3, F32), jnp.asarray(end, F32),
            jnp.ones(len(end), bool), 0.05,
        )
    return sm


def test_integration_marks_surface_and_free_space():
    sm = make_wall_submap()
    probe_occ = jnp.asarray([[0.0, 0.0, 2.0], [1.0, -1.0, 2.0]], F32)
    probe_free = jnp.asarray([[0.0, 0.0, 1.0], [0.5, 0.5, 0.5]], F32)
    occ, ok1 = sm_mod.interp_occupancy(sm, CFG, probe_occ)
    free, ok2 = sm_mod.interp_occupancy(sm, CFG, probe_free)
    assert bool(ok1.all()) and bool(ok2.all())
    # per-integration mean updates: a coarse voxel straddling the surface
    # carries the mean band profile (small positive), not the sample sum
    assert float(occ.min()) > 0.3
    assert float(free.max()) < -0.1


def test_out_of_map_is_zero():
    sm = make_wall_submap()
    far = jnp.asarray([[100.0, 0.0, 0.0]], F32)
    occ, ok = sm_mod.interp_occupancy(sm, CFG, far)
    grad, _ = sm_mod.grad_occupancy(sm, CFG, far)
    assert not bool(ok[0])
    assert float(occ[0]) == 0.0
    assert float(jnp.abs(grad).max()) == 0.0


def test_gradient_matches_finite_difference():
    sm = make_wall_submap()
    # probe strictly inside a voxel cell (trilinear gradients are only
    # defined cell-wise; at cell boundaries they are one-sided)
    p = jnp.asarray([[0.33, -0.41, 1.87]], F32)
    grad, ok = sm_mod.grad_occupancy(sm, CFG, p)
    eps = 1e-3
    for ax in range(3):
        d = np.zeros(3, np.float32)
        d[ax] = eps
        vp, _ = sm_mod.interp_occupancy(sm, CFG, p + d)
        vm, _ = sm_mod.interp_occupancy(sm, CFG, p - d)
        num = (float(vp[0]) - float(vm[0])) / (2 * eps)
        np.testing.assert_allclose(float(grad[0, ax]), num, atol=2e-2)


def test_icp_jacobian_finite_diff():
    sm = make_wall_submap()
    T_WA = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], F32)
    T_WB = jnp.asarray([0.1, -0.05, 0.02, 0, 0, 0, 1.0], F32)
    pts = jnp.asarray(
        np.stack(
            [RNG.uniform(-2, 2, 50), RNG.uniform(-2, 2, 50), np.full(50, 1.95)], -1
        ),
        F32,
    )
    valid = jnp.ones(50, bool)
    r, Ja, Jb, use = icp_factor.linearize_icp(sm, CFG, T_WA, T_WB, pts, valid)
    assert int(use.sum()) > 30
    eps = 1e-3
    for i in range(6):
        d = np.zeros(6, np.float32)
        d[i] = eps
        rp, _ = icp_factor.icp_residuals(
            sm, CFG, T_WA, se3.retract(T_WB, jnp.asarray(d)), pts, valid
        )
        rm, _ = icp_factor.icp_residuals(
            sm, CFG, T_WA, se3.retract(T_WB, jnp.asarray(-d)), pts, valid
        )
        num = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
        sel = np.asarray(use)
        np.testing.assert_allclose(
            np.asarray(Jb)[sel, i], num[sel], atol=0.1, rtol=0.15
        )


def test_icp_align_recovers_offset():
    # resolved grid: the 0.3 m band must span several voxels for the
    # gradient-normalised residual to be informative (coarse 0.2 m grids
    # collapse the band into one near-zero-mean voxel)
    cfg_fine = sm_mod.SubmapConfig(dim=96, res=0.05, band_samples=16)
    sm = sm_mod.new_submap(np.array([0, 0, 0, 0, 0, 0, 1.0]), cfg_fine)
    xs = np.linspace(-1.8, 1.8, 72)
    gx, gy = np.meshgrid(xs, xs)
    end = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.0)], -1)
    for _ in range(3):
        sm = sm_mod.integrate_rays(
            sm, cfg_fine, jnp.zeros(3, F32), jnp.asarray(end, F32),
            jnp.ones(len(end), bool), 0.05,
        )
    T_WA = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], F32)
    # points measured from a pose offset in z: surface at z=2 seen at 2 - dz
    dz_true = 0.15
    pts = jnp.asarray(
        np.stack(
            [RNG.uniform(-1.5, 1.5, 200), RNG.uniform(-1.5, 1.5, 200),
             np.full(200, 2.0 - dz_true)], -1
        ),
        F32,
    )
    T_WB0 = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], F32)
    T, cost = icp_factor.icp_align(
        sm, cfg_fine, T_WA, T_WB0, pts, jnp.ones(200, bool), iterations=10
    )
    # optimal pose shifts points onto the surface: T_WB z ≈ +dz
    assert abs(float(T[2]) - dz_true) < 0.05, np.asarray(T)


def test_alignment_edge_informative():
    sm = make_wall_submap()
    T_WA = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], F32)
    T_WB = jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], F32)
    pts = jnp.asarray(
        np.stack(
            [RNG.uniform(-2, 2, 150), RNG.uniform(-2, 2, 150), np.full(150, 2.0)], -1
        ),
        F32,
    )
    T_AB, sqrt_info, strength = icp_factor.make_alignment_edge(
        sm, CFG, T_WA, T_WB, pts, jnp.ones(150, bool)
    )
    H = np.asarray(sqrt_info, np.float64)
    H = H.T @ H
    # wall constrains z translation strongly, x/y translation weakly
    assert H[2, 2] > 100 * max(H[0, 0], H[1, 1], 1e-9)
    assert float(strength) > 10.0


def test_deskew_identity_when_static():
    T = jnp.asarray([0.3, 0.1, -0.2, 0, 0, 0.1, 0.995], F32)
    pts = jnp.asarray(RNG.uniform(-5, 5, (20, 3)), F32)
    out = lidar.deskew(T, T, jnp.linspace(0, 1, 20), pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_predict_states_batch_matches_restarts():
    """One incremental pass == independent predict_state restarts."""
    from okvis2x_tpu.imu import preintegration_np as pre_np
    from okvis2x_tpu.imu.preintegration import ImuParams

    params = ImuParams()
    rng = np.random.default_rng(7)
    n = 81
    t = np.linspace(0.0, 0.4, n)
    gyr = rng.normal(0, 0.6, (n, 3))
    acc = rng.normal(0, 2.0, (n, 3)) + np.array([0, 0, params.g])
    T0 = np.array([0.2, -0.1, 0.5, 0, 0, 0, 1.0])
    v0 = np.array([0.5, -0.2, 0.1])
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.02, -0.03])
    tq = np.sort(rng.uniform(0.02, 0.38, 25))
    batch = pre_np.predict_states_batch(
        params, t, gyr, acc, 0.0, tq, T0, v0, bg, ba
    )
    for i, t1 in enumerate(tq):
        T_ref, _ = pre_np.predict_state(
            params, t, gyr, acc, 0.0, float(t1), T0, v0, bg, ba
        )
        # const-velocity hold inside one 5 ms IMU interval: mm-level
        np.testing.assert_allclose(batch[i, :3], T_ref[:3], atol=2e-3)
        assert abs(np.dot(batch[i, 3:7], T_ref[3:7])) > 1 - 1e-5


def test_deskew_imu_beats_interpolation_under_angular_accel():
    """A sweep under angular acceleration: per-ray IMU deskew recovers
    the static world points; two-state interpolation leaves residual
    (≙ LidarMotionUndistortion propagating per-ray,
    okvis_mapping/include/okvis/LidarMotionUndistortion.hpp:22-59)."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.imu import preintegration_np as pre_np
    from okvis2x_tpu.imu.preintegration import ImuParams

    params = ImuParams()
    n = 41
    dt_total = 0.2
    t = np.linspace(0.0, dt_total, n)
    # yaw rate ramps 0 -> 4 rad/s (angular acceleration: interpolation's
    # constant-twist assumption is wrong, IMU propagation is exact)
    gyr = np.stack([np.zeros(n), np.zeros(n), 20.0 * t], -1)
    acc = np.tile(np.array([0, 0, params.g]), (n, 1))
    T0 = np.array([0, 0, 0, 0, 0, 0, 1.0])

    class FA:
        timestamp = 0.0
        T_WS = T0
        sb = np.zeros(9)

    # ground-truth pose at each ray time via fine integration
    world_pts = np.array([[5.0, 1.0, 0.5], [2.0, -3.0, 1.0], [4.0, 4.0, -1.0]])
    t_point = np.repeat(np.linspace(0.0, dt_total, 10), 3)
    pts_raw = np.zeros((len(t_point), 3))
    for i, tp in enumerate(t_point):
        T_i, _ = pre_np.predict_state(
            params, t, gyr, acc, 0.0, float(tp), T0, np.zeros(3),
            np.zeros(3), np.zeros(3),
        )
        R = se3np.quat_to_matrix(T_i[3:7])
        pts_raw[i] = R.T @ (world_pts[i % 3] - T_i[:3])

    out, T_end = lidar.deskew_imu(
        params, t, gyr, acc, FA, t_point, pts_raw
    )
    R_end = se3np.quat_to_matrix(T_end[3:7])
    rebuilt = out @ R_end.T + T_end[:3]
    err_imu = np.linalg.norm(rebuilt - world_pts[np.arange(len(t_point)) % 3], axis=1)
    assert err_imu.max() < 5e-3

    # two-state interpolation on the same sweep
    T1, _ = pre_np.predict_state(
        params, t, gyr, acc, 0.0, dt_total, T0, np.zeros(3),
        np.zeros(3), np.zeros(3),
    )
    interp = np.asarray(lidar.deskew(
        jnp.asarray(T0, F32), jnp.asarray(T1, F32),
        jnp.asarray(t_point / dt_total, F32), jnp.asarray(pts_raw, F32),
    ))
    R1 = se3np.quat_to_matrix(T1[3:7])
    rebuilt_i = interp @ R1.T + T1[:3]
    err_interp = np.linalg.norm(
        rebuilt_i - world_pts[np.arange(len(t_point)) % 3], axis=1
    )
    # ramping yaw: midpoint-of-sweep rays are centimetres off under
    # constant-twist interpolation, recovered by IMU propagation
    assert err_interp.max() > 5 * err_imu.max()


def test_voxel_downsample():
    pts = RNG.uniform(0, 1.0, (500, 3))
    out = lidar.voxel_downsample(pts, voxel=0.25, max_per_voxel=1)
    assert len(out) <= 4 * 4 * 4
    keys = np.floor(out / 0.25).astype(int)
    assert len(np.unique(keys, axis=0)) == len(out)


def test_voxel_downsample_device():
    pts = jnp.asarray(RNG.uniform(0, 1.0, (512, 3)), F32)
    _, keep = lidar.voxel_downsample_device(pts, jnp.ones(512, bool), 0.25)
    kept = np.asarray(pts)[np.asarray(keep)]
    keys = np.floor(kept / 0.25).astype(int)
    # no duplicates per voxel (collisions may over-thin, never duplicate)
    assert len(np.unique(keys, axis=0)) == len(kept)
    assert len(kept) > 10


def test_native_mesh_extraction():
    """Marching-tetrahedra (native C++) on a synthetic sphere field."""
    from okvis2x_tpu.mapping import mesh

    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    r = np.sqrt(((g - n / 2) ** 2).sum(axis=0))
    field = 8.0 - r  # positive inside a radius-8 sphere
    tris = mesh.extract_mesh(field, iso=0.0)
    assert tris.shape[0] > 100
    # all vertices near the sphere surface
    d = np.sqrt(((tris.reshape(-1, 3) - n / 2) ** 2).sum(axis=1))
    assert np.abs(d - 8.0).max() < 1.0


def test_submap_mesh_world_scale():
    from okvis2x_tpu.mapping import mesh

    sm = make_wall_submap()
    tris = mesh.submap_mesh(sm, CFG, iso=0.0)
    assert tris.shape[0] > 50
    # surface triangles near z = 2 (the wall), within a voxel
    z = tris[..., 2].ravel()
    assert np.abs(np.median(z) - 2.0) < 0.3
