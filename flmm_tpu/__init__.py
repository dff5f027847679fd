"""flmm_tpu: a TPU-native (JAX/XLA/Pallas) framework for grounding frozen
large multimodal models, with the capabilities of the F-LMM reference
(arXiv 2406.05821).

Design stance (vs. the PyTorch/CUDA reference):

* One JAX Llama-family decoder whose per-layer attention emits the
  text->image attention block *already merged over mask token groups*
  inside a ``lax.scan`` -- the reference's ``output_attentions=True``
  eager path (materialising ``L x H x S x S``) never exists here.
* All dynamic crop/pad/resize chains of the reference become a single
  affine grid-sample primitive with per-sample scale/offset: dynamic
  values, static shapes, fully jittable and batchable.
* Parallelism is a ``jax.sharding.Mesh(('data', 'model'))`` with pjit
  sharding rules replacing DeepSpeed ZeRO-2 / NCCL / accelerate.
* Checkpoints are Orbax trees holding only trainable parameters,
  mirroring the reference's trainable-only checkpointing
  (reference: flmm/runner.py:131).
"""

__version__ = "0.1.0"
