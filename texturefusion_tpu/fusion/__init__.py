from texturefusion_tpu.fusion import chunkmap  # noqa: F401
