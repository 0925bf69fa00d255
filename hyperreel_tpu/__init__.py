"""hyperreel_tpu: a TPU-native (JAX/XLA/Pallas) framework for ray-conditioned
sampling light-field / volumetric video models (HyperReel-class capability).

Design stance (vs. the CUDA/torch reference at /root/reference):
  * pure functions over pytrees of params; one jitted train/render step
  * static shapes everywhere (masking instead of boolean compaction)
  * iteration-dependent schedules (PE windows, ease activations, dropout
    gates) enter as a traced scalar `ctx.it`, so a single compiled step
    serves the whole training segment
  * grid resizes (upsample/shrink) are host-side re-build points between
    training segments
  * multi-chip: `jax.sharding.Mesh` + ray-batch sharding, psum gradients
"""

__version__ = "0.1.0"
