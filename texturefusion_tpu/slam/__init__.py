from texturefusion_tpu.slam import features  # noqa: F401
