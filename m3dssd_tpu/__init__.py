"""m3dssd_tpu — a TPU-native (JAX/XLA/Pallas) monocular 3D object detection framework.

A ground-up rebuild of the capabilities of M3DSSD (CVPR 2021, reference:
mumianyuxin/M3DSSD) designed for TPU hardware:

  * DLA backbone + deformable (DCNv2) aggregation necks, expressed in Flax and
    compiled by XLA; the deformable-conv hot path has both a pure-XLA gather
    implementation (autodiff oracle) and a Pallas TPU kernel.
  * Feature alignment (shape-align / center-align) and ANAB attention as
    batched XLA ops (pyramid pooling + MXU matmuls).
  * Dense anchor-based RPN with fully masked, static-shape target sampling and
    losses (no dynamic shapes under jit).
  * On-device box decoding + NMS; host-side hill-climbing refinement and the
    KITTI AP11/AP-R40 evaluation protocol.
  * SPMD data parallelism over a `jax.sharding.Mesh` (ICI collectives via XLA),
    gradient accumulation, cosine/poly/step LR schedules, orbax checkpointing.

Reference citations in docstrings use `ref:` to mean a path under the upstream
M3DSSD repository (e.g. `ref:lib/rpn_util.py:25`).
"""

__version__ = "0.1.0"
