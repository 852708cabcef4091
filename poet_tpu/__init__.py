"""poet_tpu — TPU-native 6D multi-object pose estimation framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of PoET
(Pose Estimation Transformer; reference: aau-cns/poet). The compute path is
functional JAX (flax.linen modules, optax optimizers, orbax checkpoints);
the hot multi-scale deformable-attention op ships both a pure-XLA reference
implementation and a fused Pallas TPU kernel; parallelism is expressed as
shardings over a `jax.sharding.Mesh` instead of NCCL process groups.

Design rules (differ deliberately from the torch reference):
  * static shapes everywhere — targets are padded to `num_queries` with
    validity counts instead of ragged per-image lists,
  * the full training step (forward, Hungarian matching, losses, backward,
    optimizer update) compiles into ONE XLA program — no per-step host sync,
  * images are channels-last (B, H, W, C), the native TPU conv layout.
"""

__version__ = "0.1.0"
