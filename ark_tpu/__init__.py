"""ARK-TPU: a TPU-native (JAX/XLA/Pallas) framework for generative modeling of
knowledge graphs, with the capabilities of the reference `thiviyanT/ARK` codebase.

Layers (see SURVEY.md for the reference layer map):
  - ark_tpu.data       host-side dataset pipeline (IntelliGraphs-equivalent),
                       tokenization into fixed-shape XLA-friendly arrays
  - ark_tpu.models     pure-functional model families (SAIL VAE + ARK decoder-only)
  - ark_tpu.ops        losses and Pallas TPU kernels for the hot ops
  - ark_tpu.sample     on-device lax.scan samplers (greedy / temperature / top-k / top-p / beam)
  - ark_tpu.train      fused jit train/eval steps, optimizer, schedules, train loop
  - ark_tpu.eval       posterior compression bits, rule verifiers, semantic evaluation
  - ark_tpu.parallel   device mesh + sharding (data-parallel batch, vocab-sharded logits)
  - ark_tpu.utils      config, checkpointing, logging
  - ark_tpu.experiments CLI entry points mirroring the reference public surface
"""

__version__ = "0.1.0"
