"""SubmappingInterface lifecycle tests (≙ SubmappingInterface decideNewSubmap,
integration, re-anchoring, alignment-edge generation)."""

import os

import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.mapping import submap as sm_mod
from okvis2x_tpu.pipeline.submapping import SubmappingConfig, SubmappingInterface

CFG = SubmappingConfig(
    submap=sm_mod.SubmapConfig(dim=64, res=0.2),
    min_frames_integrated=2,
    align_points=128,
)


def wall_depth(cam, z=3.0):
    H, W = cam.height, cam.width
    return np.full((H, W), z, np.float32)


def make_cam():
    return pinhole.make_pinhole(
        fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96,
        model=dist.NONE, dtype=jnp.float64,
    )


def test_depth_integration_and_lifecycle():
    cam = make_cam()
    edges = []
    si = SubmappingInterface(CFG, align_callback=edges.append)
    I = np.array([0, 0, 0, 0, 0, 0, 1.0])

    # integrate a wall from the origin — first call spawns submap 0
    si.integrate_depth(0, I, I, cam, wall_depth(cam))
    assert len(si.maps) == 1
    si.integrate_depth(0, I, I, cam, wall_depth(cam))
    a = si.active
    assert a.n_frames == 2

    # same keyframe -> no new submap even at low overlap
    si.integrate_depth(0, I, I, cam, wall_depth(cam))
    assert len(si.maps) == 1

    # new keyframe far away, no overlap -> new submap + alignment edge
    T_far = np.array([100.0, 0, 0, 0, 0, 0, 1.0])
    si.integrate_depth(1, T_far, T_far, cam, wall_depth(cam))
    assert len(si.maps) == 2
    # finishing the first submap fired the alignment callback (may be None
    # strength-gated; just check the pipeline ran)
    assert si.maps[0].finished


def test_occupied_export(tmp_path):
    cam = make_cam()
    si = SubmappingInterface(CFG)
    I = np.array([0, 0, 0, 0, 0, 0, 1.0])
    for _ in range(3):
        si.integrate_depth(0, I, I, cam, wall_depth(cam))
    path = os.path.join(tmp_path, "map.ply")
    n = si.export_occupied_ply(path)
    assert n > 50
    assert os.path.exists(path)
    # occupied voxels concentrated near z=3
    pts = np.loadtxt(path, skiprows=7)
    assert np.abs(np.median(pts[:, 2]) - 3.0) < 0.3


def test_reanchoring():
    cam = make_cam()
    si = SubmappingInterface(CFG)
    I = np.array([0, 0, 0, 0, 0, 0, 1.0])
    si.integrate_depth(5, I, I, cam, wall_depth(cam))
    T_new = np.array([0.5, 0.2, 0.0, 0, 0, 0, 1.0])
    si.on_state_update({5: T_new})
    np.testing.assert_allclose(np.asarray(si.maps[0].sm.T_WK), T_new)


def test_overlap_triggers_reuse():
    cam = make_cam()
    si = SubmappingInterface(CFG)
    I = np.array([0, 0, 0, 0, 0, 0, 1.0])
    si.integrate_depth(0, I, I, cam, wall_depth(cam))
    si.integrate_depth(0, I, I, cam, wall_depth(cam))
    # nearby keyframe with high overlap -> same submap
    T_near = np.array([0.1, 0.0, 0.0, 0, 0, 0, 1.0])
    si.integrate_depth(1, T_near, T_near, cam, wall_depth(cam))
    assert len(si.maps) == 1
    assert 1 in si.active.kf_ids


def test_vtk_bbox_export(tmp_path):
    """Submap bounding boxes export as a legacy-VTK hexahedron grid
    (≙ SubmappingUtils VTK export)."""
    si = SubmappingInterface(CFG)
    si.start_submap(0, np.array([0, 0, 0, 0, 0, 0, 1.0]))
    si.start_submap(1, np.array([5, 0, 0, 0, 0, 0, 1.0]))
    path = str(tmp_path / "boxes.vtk")
    si.export_vtk_bboxes(path)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("# vtk DataFile")
    np_pts = [l for l in lines if l.startswith("POINTS")]
    assert np_pts and np_pts[0].split()[1] == "16"
    assert "CELL_TYPES 2" in "\n".join(lines)


def _state(fid, t, x, kf=True):
    from okvis2x_tpu import api

    return api.State(
        id=fid, timestamp=t,
        T_WS=np.array([x, 0, 0, 0, 0, 0, 1.0]),
        v_W=np.zeros(3), b_g=np.zeros(3), b_a=np.zeros(3),
        omega_S=np.zeros(3), is_keyframe=kf,
    )


def test_async_submapping_waits_for_states(tmp_path):
    """AsyncSubmapping (≙ SubmappingInterface integrationLoop +
    processSupereightFrames threads): measurements queued BEFORE their
    bracketing states arrive are held back, interpolated once the
    trajectory covers them, and integrated on the worker thread."""
    import time

    from okvis2x_tpu.pipeline.submapping_runner import AsyncSubmapping

    cam = make_cam()
    si = SubmappingInterface(CFG)
    runner = AsyncSubmapping(si, cam=cam)

    depth = wall_depth(cam, z=3.0)
    # measurements first — no states yet
    runner.add_depth_measurement(0.05, depth)
    runner.add_depth_measurement(0.15, depth)
    time.sleep(0.15)
    assert runner.n_integrated == 0  # held back: trajectory empty

    runner.state_update_callback(_state(0, 0.0, 0.0))
    runner.state_update_callback(_state(1, 0.1, 0.05))
    runner.state_update_callback(_state(2, 0.2, 0.10))
    runner.finish()
    assert runner.n_integrated == 2, runner.n_dropped
    assert si.active is not None and si.active.n_frames >= 1
    occ = np.asarray(si.active.sm.logodds)
    assert (occ > 0).sum() > 0  # wall voxels marked occupied


def test_async_submapping_reanchors_on_correction(tmp_path):
    from okvis2x_tpu.pipeline.submapping_runner import AsyncSubmapping

    cam = make_cam()
    si = SubmappingInterface(CFG)
    runner = AsyncSubmapping(si, cam=cam)
    runner.state_update_callback(_state(0, 0.0, 0.0))
    runner.add_depth_measurement(0.0, wall_depth(cam))
    runner.state_update_callback(_state(1, 0.1, 0.05))
    runner.finish()
    assert si.active is not None
    anchor = si.active.anchor_fid
    # loop-closure correction: keyframe pose moved by 1 m
    corrected = _state(anchor, 0.0, 1.0)
    runner2_states = {corrected.id: corrected.T_WS}
    si.on_state_update(runner2_states)
    np.testing.assert_allclose(np.asarray(si.active.sm.T_WK)[:3], [1, 0, 0])


def test_colour_submap_integration(tmp_path):
    """Colour warps into the endpoint voxels (≙ se::OccupancyColIdMap +
    SubmappingInterface.cpp:848-888): a wall whose left half is red and
    right half green must come back with matching voxel colours."""
    cam = make_cam()
    si = SubmappingInterface(CFG)
    I = np.array([0, 0, 0, 0, 0, 0, 1.0])
    H, W = cam.height, cam.width
    colour = np.zeros((H, W, 3), np.float32)
    colour[:, : W // 2, 0] = 1.0  # left red
    colour[:, W // 2 :, 1] = 1.0  # right green
    for _ in range(3):
        si.integrate_depth(0, I, I, cam, wall_depth(cam), colour=colour)
    e = si.active
    assert e.col is not None

    from okvis2x_tpu.mapping import colour as col_mod

    # query two wall points: left of centre (x<0 in camera = red side)
    # and right of centre.  cx=64 => pixel x<64 maps to X<0 at z=3.
    pts = jnp.asarray([[-1.0, 0.0, 3.0], [1.0, 0.0, 3.0]], jnp.float32)
    c = np.asarray(col_mod.colour_at(e.col, e.sm, CFG.submap, pts))
    assert c[0, 0] > 0.8 and c[0, 1] < 0.2, c  # red side
    assert c[1, 1] > 0.8 and c[1, 0] < 0.2, c  # green side

    # coloured point export and coloured mesh export both succeed
    path = os.path.join(tmp_path, "col.ply")
    n = si.export_occupied_ply(path)
    assert n > 50
    head = open(path).read(400)
    assert "property uchar red" in head
    mpath = os.path.join(tmp_path, "mesh.ply")
    nt = si.export_mesh_ply(mpath, e)
    if nt:  # mesh lib present
        assert "property uchar red" in open(mpath).read(400)
