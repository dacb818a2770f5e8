"""Brick-sparse occupancy submap tests: parity with the dense grid at equal
resolution, reference-config fine resolution (25.6 m @ 0.025 m,
config/euroc/se2.yaml:30-32), device-side allocation, and the SubmapIcp
factor evaluated through the brick field."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.mapping import brick, icp_factor
from okvis2x_tpu.mapping import submap as sm_mod

F32 = jnp.float32

# same geometry as the dense test grid: 12.8 m @ 0.2 m
BCFG = brick.BrickConfig(table_dim=8, brick=8, res=0.2, pool_bricks=256)
DCFG = sm_mod.SubmapConfig(dim=64, res=0.2)
# the reference se2.yaml operating point: 25.6 m @ 0.025 m (1024^3 voxels)
FINE = brick.BrickConfig(
    table_dim=128, brick=8, res=0.025, pool_bricks=4096,
    samples_per_ray=96, band_samples=24,
)


def wall_end_points(n=40, z=2.0, extent=3.0):
    xs = np.linspace(-extent, extent, n)
    gx, gy = np.meshgrid(xs, xs)
    return np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z)], -1)


def make_wall(cfg, passes=3, n=40, z=2.0, extent=3.0):
    sm = sm_mod.new_submap(np.array([0, 0, 0, 0, 0, 0, 1.0]), cfg)
    end = wall_end_points(n, z, extent)
    fn = jax.jit(
        lambda s, e, v: sm_mod.integrate_rays(s, cfg, jnp.zeros(3, F32), e, v, 0.05)
    )
    for _ in range(passes):
        sm = fn(sm, jnp.asarray(end, F32), jnp.ones(len(end), bool))
    return sm


def test_brick_matches_dense_field():
    """At identical resolution/updates the brick field must equal the dense
    field everywhere observed."""
    smb = make_wall(BCFG)
    smd = make_wall(DCFG)
    rng = np.random.default_rng(4)
    pts = np.stack(
        [rng.uniform(-2.5, 2.5, 200), rng.uniform(-2.5, 2.5, 200),
         rng.uniform(0.2, 2.3, 200)], -1
    ).astype(np.float32)
    vb, okb = sm_mod.interp_occupancy(smb, BCFG, jnp.asarray(pts))
    vd, okd = sm_mod.interp_occupancy(smd, DCFG, jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(okb), np.asarray(okd))
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vd), atol=1e-5)
    gb, _ = sm_mod.grad_occupancy(smb, BCFG, jnp.asarray(pts))
    gd, _ = sm_mod.grad_occupancy(smd, DCFG, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), atol=1e-4)


def test_fine_resolution_surface():
    """25.6 m volume at 2.5 cm: the surface band must localise the wall to
    within ~2 voxels and free space must stay free."""
    # ray spacing must be <= voxel pitch to paint a contiguous surface
    # (production depth images at stride 4 give ~1.7 cm footprints at 2 m)
    sm = make_wall(FINE, passes=3, n=60, z=2.0, extent=0.7)
    # the fused field's zero-crossing localises the surface: clearly
    # positive 7.5 cm behind, clearly negative 5 cm in front — a 2-voxel
    # transition that a 0.2 m grid cannot represent
    inside, ok = sm_mod.interp_occupancy(
        sm, FINE, jnp.asarray([[0.0, 0.0, 2.075], [0.4, -0.4, 2.075]], F32)
    )
    assert bool(ok.all())
    assert float(inside.min()) > 0.3
    near, _ = sm_mod.interp_occupancy(
        sm, FINE, jnp.asarray([[0.0, 0.0, 1.95], [0.4, -0.4, 1.95]], F32)
    )
    assert float(near.max()) < -0.02
    free, ok2 = sm_mod.interp_occupancy(
        sm, FINE, jnp.asarray([[0.0, 0.0, 1.0]], F32)
    )
    assert bool(ok2.all()) and float(free[0]) < -0.1
    far_behind, _ = sm_mod.interp_occupancy(
        sm, FINE, jnp.asarray([[0.0, 0.0, 2.35]], F32)
    )
    assert abs(float(far_behind[0])) < 0.3  # unobserved behind the wall


def test_allocation_bounded_and_reused():
    sm = make_wall(BCFG, passes=1)
    n1 = int(sm.n_alloc)
    assert 0 < n1 <= BCFG.pool_bricks
    # integrating the same geometry again must not allocate new bricks
    end = wall_end_points()
    sm2 = sm_mod.integrate_rays(
        sm, BCFG, jnp.zeros(3, F32), jnp.asarray(end, F32),
        jnp.ones(len(end), bool), 0.05,
    )
    assert int(sm2.n_alloc) == n1


def test_pool_overflow_is_safe():
    tiny = brick.BrickConfig(table_dim=8, brick=8, res=0.2, pool_bricks=4)
    sm = make_wall(tiny, passes=1)
    assert int(sm.n_alloc) == 4  # clamped at capacity
    # interpolation still works; unallocated reads are 0
    v, ok = sm_mod.interp_occupancy(
        sm, tiny, jnp.asarray([[0.0, 0.0, 2.0]], F32)
    )
    assert np.isfinite(float(v[0]))


def test_out_of_map_zero():
    sm = make_wall(BCFG, passes=1)
    far = jnp.asarray([[100.0, 0.0, 0.0]], F32)
    occ, ok = sm_mod.interp_occupancy(sm, BCFG, far)
    grad, _ = sm_mod.grad_occupancy(sm, BCFG, far)
    assert not bool(ok[0]) and float(occ[0]) == 0.0
    assert float(jnp.abs(grad).max()) == 0.0


def test_gradient_matches_finite_difference():
    sm = make_wall(BCFG)
    p = jnp.asarray([[0.33, -0.41, 1.87]], F32)
    grad, ok = sm_mod.grad_occupancy(sm, BCFG, p)
    eps = 1e-3
    for ax in range(3):
        d = np.zeros(3, np.float32)
        d[ax] = eps
        vp, _ = sm_mod.interp_occupancy(sm, BCFG, p + d)
        vm, _ = sm_mod.interp_occupancy(sm, BCFG, p - d)
        num = (float(vp[0]) - float(vm[0])) / (2 * eps)
        np.testing.assert_allclose(float(grad[0, ax]), num, atol=2e-2)


def test_observed_mask_and_occupied_list():
    sm = make_wall(BCFG)
    seen = sm_mod.observed_mask(
        sm, BCFG, jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 5.9]], F32)
    )
    assert bool(seen[0]) and not bool(seen[1])
    centers, valid = sm_mod.occupied_point_list(sm, BCFG, 1.0, 512)
    pts = np.asarray(centers)[np.asarray(valid)]
    assert len(pts) > 50
    # all extracted occupied voxels sit on the wall plane
    assert np.abs(pts[:, 2] - 2.0).max() < 0.35


def test_icp_align_through_brick_field():
    """Frame-to-map GN alignment against the brick field recovers a z
    offset (≙ TestSubmapIcpError.cpp:267 optimisation test, mirrored from
    the dense-grid variant in test_mapping.py)."""
    # fine grid: the band must span several voxels (see the dense variant)
    sm = make_wall(FINE, passes=3, n=60, z=2.0, extent=0.7)
    rng = np.random.default_rng(11)
    dz_true = 0.15
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(-0.6, 0.6, 200), rng.uniform(-0.6, 0.6, 200),
             np.full(200, 2.0 - dz_true)], -1
        ),
        F32,
    )
    T_WA = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1.0]), F32)
    T_WB0 = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1.0]), F32)
    T_est, cost = icp_factor.icp_align(
        sm, FINE, T_WA, T_WB0, pts, jnp.ones(200, bool), iterations=10
    )
    assert abs(float(T_est[2]) - dz_true) < 0.05, np.asarray(T_est)


def test_submapping_interface_with_brick_grid():
    """The submapping orchestration (lifecycle/overlap/alignment) runs
    unchanged on the brick-sparse grid, honouring a parsed se2.yaml at the
    reference resolution (map_res 0.025 -> brick grid, not a silent 8x
    coarsening)."""
    from okvis2x_tpu.io.config import SubMapConfig
    from okvis2x_tpu.pipeline.submapping import (
        SubmappingConfig, SubmappingInterface,
    )

    se2 = SubMapConfig()  # defaults: 25.6 m @ 0.025 m
    cfg = SubmappingConfig.from_se2(se2, pool_bricks=2048)
    assert hasattr(cfg.submap, "table_dim"), cfg.submap
    assert cfg.submap.res == 0.025
    assert cfg.submap.dim == 1024
    # coarse config stays dense
    se2c = SubMapConfig(map_res=0.2)
    cfgc = SubmappingConfig.from_se2(se2c)
    assert not hasattr(cfgc.submap, "table_dim")
    assert cfgc.submap.dim == 128

    cfg.min_frames_integrated = 1
    si = SubmappingInterface(cfg)
    T_WK = np.array([0, 0, 0, 0, 0, 0, 1.0])
    end = wall_end_points(n=40, z=2.0, extent=0.5)
    si.integrate_lidar(0, T_WK, T_WK, end, sigma=0.05)
    assert len(si.maps) == 1
    a = si.maps[0]
    assert int(a.sm.n_alloc) > 0
    # overlap decision: same cloud again -> high overlap, no new submap
    assert not si.decide_new_submap(1, T_WK, end)
    # distant cloud -> low overlap -> new submap
    far = end + np.array([0.0, 0.0, 10.0])
    assert si.decide_new_submap(1, T_WK, far)
