from texturefusion_tpu.texture import mrf  # noqa: F401
