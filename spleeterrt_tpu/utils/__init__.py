from spleeterrt_tpu.utils import timing  # noqa: F401
