import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import CameraConfig
from texturefusion_tpu.core import camera


INTR = camera.Intrinsics.from_config(CameraConfig())


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 3.0, (100,)).astype(np.float32)
    u = rng.uniform(0, INTR.width - 1, (100,)).astype(np.float32)
    v = rng.uniform(0, INTR.height - 1, (100,)).astype(np.float32)
    pts = camera.unproject(INTR, jnp.asarray(u), jnp.asarray(v), jnp.asarray(depth))
    uv, z = camera.project(INTR, pts)
    np.testing.assert_allclose(np.asarray(uv[..., 0]), u, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), v, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), depth, atol=1e-5)


def test_backproject_depth_map_shape():
    depth = jnp.ones((INTR.height, INTR.width), jnp.float32) * 2.0
    pts = camera.backproject_depth_map(INTR, depth)
    assert pts.shape == (INTR.height, INTR.width, 3)
    # center pixel should point approximately down +z
    c = np.asarray(pts[INTR.height // 2, INTR.width // 2])
    assert abs(c[2] - 2.0) < 1e-5
    assert abs(c[0]) < 0.01 and abs(c[1]) < 0.01


def test_bilinear_sample_exact_on_grid():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    uv = jnp.asarray([[1.0, 2.0], [0.0, 0.0], [3.0, 2.0]])
    val, mask = camera.bilinear_sample(jnp.asarray(img), uv)
    np.testing.assert_allclose(np.asarray(val), [9.0, 0.0, 11.0], atol=1e-6)
    assert np.all(np.asarray(mask))


def test_bilinear_sample_interpolates():
    img = np.array([[0.0, 1.0], [2.0, 3.0]], dtype=np.float32)
    val, _ = camera.bilinear_sample(jnp.asarray(img), jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(val), [1.5], atol=1e-6)


def test_bilinear_sample_out_of_bounds():
    img = np.ones((4, 4), dtype=np.float32)
    val, mask = camera.bilinear_sample(jnp.asarray(img), jnp.asarray([[-1.0, 0.0], [5.0, 1.0]]))
    assert not np.any(np.asarray(mask))
    np.testing.assert_allclose(np.asarray(val), 0.0)


def test_bilinear_sample_multichannel():
    img = np.random.default_rng(1).uniform(size=(5, 6, 3)).astype(np.float32)
    val, mask = camera.bilinear_sample(jnp.asarray(img), jnp.asarray([[2.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(val)[0], img[3, 2], atol=1e-6)


def test_scaled_intrinsics():
    half = INTR.scaled(0.5)
    assert half.width == INTR.width // 2
    assert abs(half.fx - INTR.fx * 0.5) < 1e-6


def test_in_image():
    uv = jnp.asarray([[0.0, 0.0], [639.0, 479.0], [-0.1, 5.0], [640.0, 5.0]])
    mask = np.asarray(camera.in_image(INTR, uv))
    assert list(mask) == [True, True, False, False]
