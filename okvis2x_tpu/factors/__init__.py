from okvis2x_tpu.factors import (  # noqa: F401
    imu_factor,
    priors,
    reprojection,
    robust,
)
