"""Data layer: annotations, clip sampling, transforms, batching, loaders.

All host-side (numpy/CPU): the output of this layer is fixed-shape
VideoBatch/VideoTargets pytrees ready for device prefetch.
"""

from .tokenize import build_tokenizer
from .batching import pick_bucket, build_batch

__all__ = ["build_tokenizer", "pick_bucket", "build_batch"]
