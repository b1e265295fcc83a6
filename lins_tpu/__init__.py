"""lins_tpu — a TPU-native LiDAR-inertial SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of
ChaoqinRobotics/LINS---LiDAR-inertial-SLAM (ICRA 2020) for TPU hardware:
fixed-shape array pipelines, fused jit regions for the per-scan hot path,
mesh-sharded mapping/pose-graph backends, no ROS.
"""

from lins_tpu.config import SlamConfig, VLP16, OS1_64, HDL64, PRESETS

__version__ = "0.1.0"

__all__ = ["SlamConfig", "VLP16", "OS1_64", "HDL64", "PRESETS", "__version__"]
