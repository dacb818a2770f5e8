from okvis2x_tpu.mapping import icp_factor, lidar, submap  # noqa: F401
from okvis2x_tpu.mapping.submap import Submap, SubmapConfig, new_submap  # noqa: F401
