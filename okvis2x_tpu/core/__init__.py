from okvis2x_tpu.core import se3  # noqa: F401
