from spleeterrt_tpu.data import dataset  # noqa: F401
