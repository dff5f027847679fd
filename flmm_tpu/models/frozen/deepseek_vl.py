"""Frozen DeepSeek-VL grounding family (flagship).

Thin alias onto the generic contiguous-image-block grounding core; the
DeepSeek specifics (SigLIP-L/16-384 tower, mlp_gelu aligner, 576-token
block, clip_shape 24 -- reference flmm/models/frozen_deepseek_vl.py:36-37)
live in configs/deepseek_vl.py.
"""

from flmm_tpu.models.frozen.grounding import (  # noqa: F401
    GroundingConfig as DeepseekVLGroundingConfig,
    forward,
    init_params,
    loss_fn,
)
