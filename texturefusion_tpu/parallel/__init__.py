from texturefusion_tpu.parallel import mesh  # noqa: F401
