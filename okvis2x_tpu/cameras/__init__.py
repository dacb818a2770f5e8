from okvis2x_tpu.cameras import distortion, pinhole, ncamera  # noqa: F401
from okvis2x_tpu.cameras.pinhole import Camera, make_pinhole  # noqa: F401
from okvis2x_tpu.cameras.ncamera import CameraRig, make_rig  # noqa: F401
