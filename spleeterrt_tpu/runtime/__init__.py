from spleeterrt_tpu.runtime import stream  # noqa: F401
