from texturefusion_tpu.eval import loop_closure  # noqa: F401
