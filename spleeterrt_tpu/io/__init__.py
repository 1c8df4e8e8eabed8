from spleeterrt_tpu.io import audio, resample  # noqa: F401
