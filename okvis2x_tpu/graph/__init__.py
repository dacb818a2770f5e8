from okvis2x_tpu.graph.estimator import (  # noqa: F401
    EstimatorConfig,
    FrameState,
    SlidingWindowEstimator,
)
