import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.ops.pallas_kernels import bilateral_filter_pallas
from texturefusion_tpu.ops.preprocess import bilateral_filter


def test_pallas_bilateral_matches_xla_interior():
    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 3.0, (120, 160)).astype(np.float32)
    d[rng.uniform(size=d.shape) < 0.05] = 0.0
    ref = np.asarray(bilateral_filter(jnp.asarray(d)))
    got = np.asarray(bilateral_filter_pallas(jnp.asarray(d)))
    # identical away from the image border (border padding semantics
    # differ: edge-replicate vs ignore-outside)
    np.testing.assert_allclose(got[5:-5, 5:-5], ref[5:-5, 5:-5], atol=1e-6)
    # invalid pixels stay invalid
    assert ((got == 0) == (ref == 0)).all()


def test_pallas_bilateral_preserves_edges():
    d = np.full((48, 64), 2.0, np.float32)
    d[:, 32:] = 1.0
    out = np.asarray(bilateral_filter_pallas(jnp.asarray(d)))
    # range kernel (sigma 0.03) must not blur a 1m depth step
    assert abs(out[24, 30] - 2.0) < 1e-3
    assert abs(out[24, 34] - 1.0) < 1e-3
