from texturefusion_tpu.utils import stopwatch  # noqa: F401
