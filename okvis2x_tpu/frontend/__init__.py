from okvis2x_tpu.frontend import (  # noqa: F401
    descriptor,
    detector,
    matcher,
    triangulation,
)
