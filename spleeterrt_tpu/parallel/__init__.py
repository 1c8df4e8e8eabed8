from spleeterrt_tpu.parallel import mesh  # noqa: F401
