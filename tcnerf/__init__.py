"""tcnerf — TPU-native JAX/XLA/Pallas framework for CLIP-conditioned multi-view
NeRF rendering and energy-based grasp/trajectory fields.

Capability parity target: TWeber132/thesis-clip-nerf (see SURVEY.md). The compute
path is JAX (XLA + Pallas TPU kernels); geometry/task layers are numpy; training
orchestration is pure-functional with optax/orbax.
"""

__version__ = "0.1.0"
