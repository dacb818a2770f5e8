"""ATE/RPE harness: read_tum round-trip, stats, CLI regression gate."""

import numpy as np

from okvis2x_tpu.io import trajectory_io as tio
import pytest

pytestmark = pytest.mark.smoke


def _traj(n=50, drift=0.0):
    t = np.arange(n) * 0.1
    p = np.stack([np.sin(t), np.cos(t), 0.1 * t], axis=1)
    p = p + drift * t[:, None] * np.array([1.0, 0.0, 0.0])
    q = np.tile(np.array([0.0, 0.0, 0.0, 1.0]), (n, 1))
    return t, np.concatenate([p, q], axis=1)


def test_read_tum_roundtrip(tmp_path):
    t, T = _traj()
    path = str(tmp_path / "a.tum")
    tio.write_tum(path, t, T)
    t2, T2 = tio.read_tum(path)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    np.testing.assert_allclose(T2, T, atol=1e-8)


def test_ate_stats_zero_for_rigidly_transformed():
    t, T = _traj()
    # apply a rigid transform to the estimate: alignment must recover it
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    p2 = (R @ T[:, :3].T).T + np.array([5.0, -2.0, 1.0])
    st = tio.ate_stats(t, p2, t, T[:, :3])
    assert st is not None and st["rmse"] < 1e-9
    assert st["num_pairs"] == len(t)


def test_ate_stats_detects_drift():
    t, T = _traj()
    _, Td = _traj(drift=0.05)
    st = tio.ate_stats(t, Td[:, :3], t, T[:, :3])
    assert st["rmse"] > 0.01


def test_rpe_stats_identity():
    t, T = _traj()
    st = tio.rpe_stats(t, T, t, T)
    assert st["trans_rmse"] < 1e-12 and st["rot_rmse_deg"] < 1e-6


def test_cli_gate(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    try:
        import evaluate_ate
    finally:
        sys.path.pop(0)

    t, T = _traj()
    _, Td = _traj(drift=0.05)
    a, b = str(tmp_path / "est.tum"), str(tmp_path / "gt.tum")
    tio.write_tum(a, t, Td)
    tio.write_tum(b, t, T)
    assert evaluate_ate.main([a, b]) == 0
    assert evaluate_ate.main([a, b, "--bound", "1e-6"]) == 1
    assert evaluate_ate.main([a, b, "--bound", "10.0"]) == 0
