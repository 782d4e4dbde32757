"""xpretrain_tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-language pretraining stack.

A from-scratch rebuild of the capabilities of microsoft/XPretrain — the
CLIP-ViP, HD-VILA and LF-VILA model families, their contrastive +
masked-modeling pretraining recipes, retrieval/QA/classification downstream
tasks, and the HD-VILA-100M-style video ingest pipeline — designed TPU-first:

- SPMD data parallelism over a `jax.sharding.Mesh` with the global
  contrastive batch assembled by `lax.all_gather` over ICI (in place of the
  reference's Horovod/NCCL allgather).
- bf16 compute / fp32 params (in place of apex fp16 O2).
- Optimizer-state sharding over the mesh (in place of DeepSpeed ZeRO-2).
- Pallas kernels for the blockwise attention + fused ingest hot paths.
"""

__version__ = "0.1.0"
