"""Zero-TIG TPU: a TPU-native JAX framework for zero-shot temporally-consistent
low-light video enhancement.

Re-implementation (from scratch, TPU-first) of the capabilities of the
Zero-TIG reference (L-Forster/Zero-TIG): Retinex-style illumination-guided
enhancement with Neighbor2Neighbor self-supervised denoising, RAFT optical
flow for temporal consistency, and an adaptive white-balance variant for
underwater footage.

Design notes (vs the PyTorch reference):
  * NHWC layout everywhere (XLA-TPU native conv layout).
  * Pure-functional per-frame step: ``step(params, carry, frame, is_new_seq)``
    under one ``jax.jit`` -- flow + warp + enhance + denoise + loss + Adam
    update compile to a single XLA graph (reference: eager per-op CUDA
    dispatch with mutable module state, model/model.py:99-103).
  * RAFT's 12 refinement iterations run as ``lax.scan`` (reference: Python
    loop, model/RAFT/raft.py:111-128).
  * Recurrence (last_H3/last_s3) is an explicit carry pytree; the
    new-sequence flag is a traced bool selecting zeros vs warped state.
"""

__version__ = "0.1.0"
