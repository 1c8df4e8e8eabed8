from spleeterrt_tpu.kernels import fastfft  # noqa: F401
