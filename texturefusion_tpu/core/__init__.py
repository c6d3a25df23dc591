from texturefusion_tpu.core import se3, camera, geometry  # noqa: F401
