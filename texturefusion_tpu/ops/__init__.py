from texturefusion_tpu.ops import preprocess  # noqa: F401
