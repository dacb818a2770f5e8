from okvis2x_tpu.imu.preintegration import (  # noqa: F401
    ImuParams,
    ImuBatch,
    Preintegrated,
    preintegrate,
    propagate_state,
    init_pose_from_accel,
)
