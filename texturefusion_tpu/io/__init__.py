from texturefusion_tpu.io import synthetic, ply, tum  # noqa: F401
