from okvis2x_tpu.ops import hamming_pallas  # noqa: F401
