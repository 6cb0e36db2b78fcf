from jeicyboodsp_tpu.pipelines.registry import PIPELINES, run_pipeline  # noqa: F401
