"""cut3r_slam_tpu — a TPU-native monocular Gaussian-SLAM framework.

Brand-new JAX/XLA/Pallas rebuild of the capabilities of the CUT3R-SLAM
reference stack (HI-SLAM2 Gaussian mapping + CUT3R autoregressive pointmap
tracking + DROID-style dense BA primitives), designed TPU-first:

* compute path: jitted shape-static programs (`models/`, `ops/`), Pallas
  kernels for the 3DGS rasterizer and correlation lookups;
* SLAM layer: fixed-capacity device-resident buffers orchestrated by a thin
  host loop (`slam/`);
* scaling: `jax.sharding.Mesh` + pjit/shard_map (`parallel/`).
"""

__version__ = "0.1.0"
