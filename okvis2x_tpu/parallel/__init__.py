from okvis2x_tpu.parallel import mesh, dist_schur  # noqa: F401
