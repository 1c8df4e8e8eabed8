from spleeterrt_tpu.core import transform, model, separate, weights  # noqa: F401
