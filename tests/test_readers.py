"""Dataset reader parity: Leica and RPG layouts (reference
LeicaDatasetReader / RpgDatasetReader) + trajectory TUM conversion."""

import os

import numpy as np
from PIL import Image

from okvis2x_tpu.io.leica import LeicaDataset
from okvis2x_tpu.io.rpg import RpgDataset


def _png(path, w=16, h=12):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        (np.random.default_rng(0).random((h, w)) * 255).astype(np.uint8)
    ).save(path)


def test_leica_reader(tmp_path):
    root = str(tmp_path / "leica")
    os.makedirs(root)
    t0 = 1_500_000_000_000_000_000
    with open(os.path.join(root, "imu_bottom.csv"), "w") as f:
        f.write("#t,wx,wy,wz,ax,ay,az\n")
        for i in range(50):
            f.write(f"{t0 + i * 5_000_000},0,0,0.1,0,0,9.81\n")
    with open(os.path.join(root, "lidar.csv"), "w") as f:
        f.write("#t,x,y,z,intensity\n")
        for i in range(300):
            f.write(f"{t0 + i * 1_000_000},{1 + i * 0.01},0.5,2.0,100\n")
    for i in range(3):
        t = t0 + i * 100_000_000
        _png(os.path.join(root, "pinhole", f"bottom_{t}.png"))
        _png(os.path.join(root, "pinhole", f"front_{t + 1_000_000}.png"))
    with open(os.path.join(root, "gnss.csv"), "w") as f:
        f.write("#t,lat,lon,alt,hErr,vErr\n")
        for i in range(5):
            f.write(
                f"{t0 + i * 200_000_000},47.37{i},8.54,408.0,0.02,0.04\n"
            )

    ds = LeicaDataset(root, cameras=["bottom", "front"], sweep_dt=0.1)
    assert len(ds.frames) == 3
    assert all(len(fr.paths) == 2 and fr.paths[1] for fr in ds.frames)
    assert len(ds.sweeps) == 3  # 300 rays @1kHz in 0.1s windows
    assert sum(len(s.t_point) for s in ds.sweeps) == 300
    assert len(ds.gps) == 5
    # first fix is the ENU origin
    np.testing.assert_allclose(ds.gps[0][1], np.zeros(3), atol=1e-6)
    assert np.linalg.norm(ds.gps[-1][1]) > 1.0  # lat offset -> north motion

    kinds = [k for k, _ in ds.events()]
    assert kinds.count("frames") == 3
    assert kinds.count("lidar") == 3
    assert kinds.count("imu") == 50
    img = ds.load_image(ds.frames[0].paths[0])
    assert img.shape == (12, 16) and img.dtype == np.float32


def test_rpg_reader(tmp_path):
    root = str(tmp_path / "rpg")
    os.makedirs(os.path.join(root, "imu0"))
    t0 = 1_500_000_000_000_000_000
    with open(os.path.join(root, "imu0", "data.csv"), "w") as f:
        f.write("#t,w,a\n")
        for i in range(40):
            f.write(f"{t0 + i * 5_000_000},0,0,0,0,0,9.81\n")
    for side in ("left", "right"):
        with open(os.path.join(root, f"{side}_images.txt"), "w") as f:
            f.write("# id timestamp image_name\n")
            for i in range(4):
                rel = f"img/{side}_{i}.png"
                _png(os.path.join(root, rel))
                f.write(f"{i} {i * 0.1:.6f} {rel}\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# id t px py pz qx qy qz qw\n")
        for i in range(4):
            f.write(f"{i} {i * 0.1:.6f} {i * 0.5} 0 0 0 0 0 1\n")

    ds = RpgDataset(root)
    assert ds.num_cams == 2
    assert len(ds.frames) == 4
    assert ds.ground_truth is not None and ds.ground_truth.shape == (4, 8)
    kinds = [k for k, _ in ds.events()]
    assert kinds.count("frames") == 4


def test_convert_to_tum(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_to_tum",
        os.path.join(os.path.dirname(__file__), "..", "tools", "convert_to_tum.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    csv = str(tmp_path / "traj.csv")
    with open(csv, "w") as f:
        f.write("#t,px,py,pz,qx,qy,qz,qw\n")
        f.write("1500000000000000000,1,2,3,0,0,0,1\n")
    out = mod.convert(csv)
    lines = open(out).read().strip().splitlines()
    assert lines[0].startswith("#")
    vals = lines[1].split()
    assert abs(float(vals[0]) - 1.5e9) < 1e-3
    assert vals[1:4] == ["1.0", "2.0", "3.0"]
