from okvis2x_tpu.io import config, euroc  # noqa: F401
