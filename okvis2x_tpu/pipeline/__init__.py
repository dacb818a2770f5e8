from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline  # noqa: F401
