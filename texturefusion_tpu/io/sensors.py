"""Sensor/input abstraction: dataset, synthetic and live-camera wrappers.

Re-design of the reference's Tools/ sensor layer
(ref: Tools/Wrapper.h:11-17 abstract Wrapper {init, LoadSingleFrame};
Tools/DatasetWrapper.hpp:15-263 TUM offline; Tools/OpenNI2Wrapper.hpp,
RealSenseWrapper.hpp, Kinect/KinectWrapper.hpp live sensors, selected at
compile time via CMake options Tools/CMakeLists.txt:3-5).

Here selection is runtime: `open_sensor(mode, path)` mirrors the
reference CLI's InputMode argument (ref: BasicAPI.cpp:1169-1205
parseInput — 0 offline dataset, 1 OpenNI2, 2 RealSense, 3 Kinect).
Live drivers are optional: they raise a clear error when the underlying
SDK python bindings are absent on the image.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from texturefusion_tpu.config import CameraConfig


class SensorBase:
    """Yields (timestamp, depth_meters [H,W] f32, rgb [H,W,3] f32 0..1)."""

    camera: CameraConfig

    def frames(self) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
        raise NotImplementedError


class DatasetSensor(SensorBase):
    """TUM-format offline dataset (InputMode 0)."""

    def __init__(self, root: str, camera: Optional[CameraConfig] = None):
        from texturefusion_tpu.io import tum

        self.seq = tum.load_tum_sequence(root, camera)
        self.camera = self.seq.camera

    def frames(self):
        from texturefusion_tpu.ops.preprocess import pack_frame

        for i in range(len(self.seq)):
            # single packed buffer: one host→device transfer per frame
            depth, rgb = self.seq.load_frame_raw(i)
            yield float(self.seq.timestamps[i]), pack_frame(depth, rgb), None


class SyntheticSensor(SensorBase):
    """Procedural scene renderer (tests/benchmarks; no files needed)."""

    def __init__(self, n_frames: int = 30,
                 camera: Optional[CameraConfig] = None):
        from texturefusion_tpu.core import camera as cam
        from texturefusion_tpu.io import synthetic

        self.camera = camera or CameraConfig(far_plane=6.0)
        intr = cam.Intrinsics.from_config(self.camera)
        self.scene = synthetic.BoxRoomScene()
        self.poses = synthetic.orbit_trajectory(n_frames)
        self._render = (synthetic, intr)

    def frames(self):
        import jax.numpy as jnp
        synthetic, intr = self._render
        for i, p in enumerate(self.poses):
            d, c = synthetic.render_frame(self.scene, intr, jnp.asarray(p))
            yield float(i) / 30.0, np.asarray(d), np.asarray(c)


class OpenNI2Sensor(SensorBase):
    """Live OpenNI2 device (InputMode 1). Requires openni bindings."""

    def __init__(self, camera: Optional[CameraConfig] = None):
        try:
            from openni import openni2  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "OpenNI2 python bindings not available on this image; "
                "use InputMode 0 (dataset) or 4 (synthetic)") from e
        self.camera = camera or CameraConfig()


class RealSenseSensor(SensorBase):
    """Live RealSense device (InputMode 2). Requires pyrealsense2."""

    def __init__(self, camera: Optional[CameraConfig] = None):
        try:
            import pyrealsense2  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "pyrealsense2 not available on this image; "
                "use InputMode 0 (dataset) or 4 (synthetic)") from e
        self.camera = camera or CameraConfig()


def open_sensor(mode: int, path: str = "",
                camera: Optional[CameraConfig] = None) -> SensorBase:
    """InputMode dispatch (ref: main.cpp:55-71). Mode 4 (synthetic) is an
    addition for dataset-free runs."""
    if mode == 0:
        return DatasetSensor(path, camera)
    if mode == 1:
        return OpenNI2Sensor(camera)
    if mode == 2:
        return RealSenseSensor(camera)
    if mode == 4:
        return SyntheticSensor(camera=camera)
    raise ValueError(f"unknown InputMode {mode}")
