from okvis2x_tpu.utils import timing  # noqa: F401
