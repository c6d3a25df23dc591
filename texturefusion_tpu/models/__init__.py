from texturefusion_tpu.models import reconstruction  # noqa: F401
