"""STCAT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) spatio-temporal video grounding framework.

Re-designed from scratch with the capabilities of the STCAT reference
("Embracing Consistency: A One-Stage Approach for Spatio-Temporal Video
Grounding", NeurIPS 2022): given a video and a natural-language sentence,
predict a per-frame bounding-box tube plus the temporal segment where the
described object/action occurs, trained and evaluated on VidSTG and HC-STVG.

Layering (bottom-up):
    config      -- dataclass config tree, YAML + CLI override (ref: config/defaults.py)
    core        -- PRNG, logging/meters, mesh & sharding, fixed-shape batch pytrees
    ops         -- pure jittable numerics: boxes, embeddings, sted decode
    kernels     -- Pallas TPU kernels for the attention hot paths
    models      -- flax ResNet / RoBERTa / cross-modal encoder / decoders / STCAT net
    data        -- annotation preprocessing, clip sampling, transforms, prefetch loader
    train       -- criterion, optax optimizer groups, EMA, jitted sharded train step
    eval        -- postprocess-driven evaluation engine + vIoU evaluators
    cli         -- train/test entry points mirroring the reference recipes
"""

__version__ = "0.1.0"

import os as _os

# This framework never touches the HuggingFace hub at runtime: tokenizers and
# pretrained weights are resolved from local files only (zero-egress TPU pods).
_os.environ.setdefault("HF_HUB_OFFLINE", "1")
_os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
