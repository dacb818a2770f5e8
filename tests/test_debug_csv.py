"""Debug CSV writers (≙ ViInterface csv hooks + lidar debug stats)."""

import numpy as np

from okvis2x_tpu.io import debug_csv as dc
import pytest

pytestmark = pytest.mark.smoke


def test_imu_csv(tmp_path):
    p = str(tmp_path / "imu.csv")
    w = dc.ImuCsvWriter(p)
    w.add(1.5, [0.1, 0.2, 0.3], [9.8, 0.0, 0.1])
    w.close()
    lines = open(p).read().splitlines()
    assert lines[0].startswith("timestamp, omega_tilde_WS_S_x")
    assert lines[1].startswith("1.500000000, 0.1, 0.2, 0.3, 9.8")


def test_tracks_csv(tmp_path):
    p = str(tmp_path / "tracks0.csv")
    w = dc.TracksCsvWriter(p)
    w.add_frame(
        2.0,
        landmark_ids=np.array([5, -1, 7]),
        uv=np.array([[10.0, 20.0], [0, 0], [30.0, 40.0]]),
        stdev=np.array([1.0, 1.0, 2.0]),
        descriptors=np.array([[0xAB], [0x00], [0xCD]], np.uint8),
    )
    w.close()
    lines = open(p).read().splitlines()
    assert len(lines) == 3  # header + 2 valid tracks (lid -1 skipped)
    assert ", 5, 10.0, 20.0" in lines[1] and lines[1].endswith("ab")
    assert ", 7, 30.0, 40.0" in lines[2] and lines[2].endswith("cd")


def test_lidar_debug_csv(tmp_path):
    info = dc.LidarDebugInfo.from_arrays(
        frame_id=3,
        reference_id=1,
        residuals=np.array([0.5, -2.0, 0.0]),
        occ=np.array([0.0, 0.3, -0.1]),
        grad_norm=np.array([1.0, 0.0, 2.0]),
    )
    assert info.n_residuals == 3
    assert info.n_nonzero_occ == 2
    assert info.n_nonzero_grad == 2
    assert info.n_big_residuals == 1
    assert abs(info.max_residual - 2.0) < 1e-12
    path = dc.write_lidar_debug_csv(str(tmp_path / "run"), [info])
    lines = open(path).read().splitlines()
    assert lines[0].startswith("# frame id, reference frame id")
    assert lines[1].startswith("3, 1, 3, 2, 2,")


def test_gps_csv(tmp_path):
    p = str(tmp_path / "gps.csv")
    w = dc.GpsResidualCsvWriter(p)
    w.add(0.25, 9, [0.01, -0.02, 0.005], 0.4)
    w.close()
    lines = open(p).read().splitlines()
    assert lines[1].startswith("0.250000000, 9, 0.01, -0.02")
