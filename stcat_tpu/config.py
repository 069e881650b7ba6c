"""Config system: a typed tree with three-level precedence (defaults -> YAML -> CLI opts).

Mirrors the reference's yacs flag names (ref: config/defaults.py:1-177,
scripts/train_net.py:287-291) so published recipes translate 1:1, but is a
plain frozen dataclass tree: hashable, pickleable, and safe to close over in
jitted functions (static config never leaks tracers).

TPU-specific additions live under ``cfg.TPU``: frame-count bucketing (static
shapes for XLA), compute dtype policy, mesh axis sizes, and kernel selection.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, List, Optional, Tuple


def _tup(*xs):
    return field(default_factory=lambda: tuple(xs))


@dataclass(frozen=True)
class InputConfig:
    # ref: config/defaults.py:19-41
    MAX_QUERY_LEN: int = 26
    MAX_VIDEO_LEN: int = 200
    TRAIN_SAMPLE_NUM: int = 64     # input frame count for VidSTG
    SAMPLE_FPS: float = 3.2        # input frame rate for HC-STVG (20s videos)
    RESOLUTION: int = 224
    PIXEL_MEAN: Tuple[float, ...] = _tup(0.485, 0.456, 0.406)
    PIXEL_STD: Tuple[float, ...] = _tup(0.229, 0.224, 0.225)
    AUG_SCALE: bool = True
    # TPU addition: gate the RandomSelect resize->RandomSizeCrop->resize
    # branch (ref datasets/build.py:33-44 always has it). The crop branch
    # varies the padded-canvas aspect per iteration, i.e. one compiled
    # program per canvas; benches / compile-budget-tight runs disable it.
    AUG_CROP: bool = True
    AUG_TRANSLATE: bool = False
    FLIP_PROB_TRAIN: float = 0.5
    TEMP_CROP_PROB: float = 0.5


@dataclass(frozen=True)
class VisionBackboneConfig:
    # ref: config/defaults.py:58-62
    NAME: str = "resnet101"        # resnet50 or resnet101
    POS_ENC: str = "sine"          # sine, sineHW or learned
    DILATION: bool = False         # DC5: dilation instead of stride in layer4
    FREEZE: bool = False
    DEPTHS: Tuple[int, ...] = ()   # override stage depths (tests); () = from NAME


@dataclass(frozen=True)
class TextModelConfig:
    # ref: config/defaults.py:68-70
    NAME: str = "roberta-base"
    FREEZE: bool = False
    LOCAL_PATH: str = ""           # local dir with HF weights/tokenizer (zero-egress)
    # architecture knobs (defaults = roberta-base); overridable for tiny tests
    VOCAB_SIZE: int = 50265
    HIDDEN: int = 768
    LAYERS: int = 12
    HEADS: int = 12
    INTERMEDIATE: int = 3072
    MAX_POS: int = 514
    # hidden/attention dropout (HF roberta-base default; also used by the
    # FeatureResizer, ref bert.py:77-96)
    DROPOUT: float = 0.1
    # evaluating reference-derived weights with the stand-in hash tokenizer
    # emits garbage metrics; it is a hard error unless explicitly overridden
    ALLOW_HASH_TOKENIZER: bool = False


@dataclass(frozen=True)
class STCATConfig:
    # ref: config/defaults.py:85-95
    HIDDEN: int = 256
    QUERY_DIM: int = 4             # anchor dim
    ENC_LAYERS: int = 6
    DEC_LAYERS: int = 6
    FFN_DIM: int = 2048
    DROPOUT: float = 0.1
    # dropout inside the temporal/actioness head MLPs (the reference
    # hardcodes 0.3, stcat.py:64-70)
    HEAD_DROPOUT: float = 0.3
    HEADS: int = 8
    USE_LEARN_TIME_EMBED: bool = False
    USE_ACTION: bool = True
    FROM_SCRATCH: bool = True      # concat (2*d_model) conditional cross-attention


@dataclass(frozen=True)
class LSTMConfig:
    # ref: config/defaults.py:74-79
    HIDDEN_SIZE: int = 512
    BIDIRECTIONAL: bool = True
    NUM_LAYERS: int = 2
    EMBED_DIM: int = 300
    GLOVE_PATH: str = ""           # local .npy [vocab, 300]; optional


@dataclass(frozen=True)
class ModelConfig:
    # ref: config/defaults.py:46-52
    WEIGHT: str = ""
    EMA: bool = True
    EMA_DECAY: float = 0.9998
    QUERY_NUM: int = 1             # one query per frame
    USE_LSTM: bool = False         # GloVe+LSTM text path (ref defaults.py:73)
    VISION_BACKBONE: VisionBackboneConfig = field(default_factory=VisionBackboneConfig)
    TEXT_MODEL: TextModelConfig = field(default_factory=TextModelConfig)
    LSTM: LSTMConfig = field(default_factory=LSTMConfig)
    STCAT: STCATConfig = field(default_factory=STCATConfig)


@dataclass(frozen=True)
class DatasetConfig:
    # ref: config/defaults.py:108-112
    NAME: str = "VidSTG"           # VidSTG or HC-STVG


@dataclass(frozen=True)
class DataLoaderConfig:
    # ref: config/defaults.py:118-122
    NUM_WORKERS: int = 4
    ASPECT_RATIO_GROUPING: bool = False  # batch portrait/landscape separately
    PREFETCH_DEPTH: int = 2        # device prefetch queue depth (TPU addition)


@dataclass(frozen=True)
class ScheduleConfig:
    # ref: config/defaults.py:157-159
    TYPE: str = "linear_with_warmup"
    DROP_STEP: Tuple[int, ...] = _tup(8, 12)


@dataclass(frozen=True)
class SolverConfig:
    # ref: config/defaults.py:127-177
    MAX_EPOCH: int = 30
    BATCH_SIZE: int = 1            # clips per chip
    SHUFFLE: bool = True
    BASE_LR: float = 2e-5
    VIS_BACKBONE_LR: float = 1e-5
    TEXT_LR: float = 2e-5
    TEMP_LR: float = 1e-4
    OPTIMIZER: str = "adamw"
    MAX_GRAD_NORM: float = 0.1
    BBOX_COEF: float = 5.0
    GIOU_COEF: float = 2.0
    TEMP_COEF: float = 2.0
    ATTN_COEF: float = 1.0
    ACTIONESS_COEF: float = 2.0
    MOMENTUM: float = 0.9
    WEIGHT_DECAY: float = 1e-4
    WARMUP_PROP: float = 0.01
    SCHEDULE: ScheduleConfig = field(default_factory=ScheduleConfig)
    PRE_VAL: bool = False
    TO_VAL: bool = True
    VAL_PERIOD: int = 2500
    CHECKPOINT_PERIOD: int = 5000
    USE_ATTN: bool = True          # guided attention loss
    SIGMA: float = 2.0             # std of gaussian sted target
    USE_AUX_LOSS: bool = True
    EOS_COEF: float = 0.1


@dataclass(frozen=True)
class TPUConfig:
    """TPU-native knobs with no reference counterpart."""
    # Frame-count buckets: every clip is padded up to the nearest bucket so
    # XLA compiles a small, fixed set of shapes (ref pain point: ragged
    # NestedTensor, utils/misc.py:41-97).
    FRAME_BUCKETS: Tuple[int, ...] = _tup(32, 64, 96, 128)
    # bf16 matmul/conv compute; fp32 params, losses, layernorm statistics.
    COMPUTE_DTYPE: str = "bfloat16"
    PARAM_DTYPE: str = "float32"
    # Mesh: DATA-parallel axis size; 0 = derive from available devices. With
    # MODEL_PARALLEL=m the mesh spans MESH_DATA*m devices (MESH_DATA stays
    # the data-axis size -- it never silently shrinks the global batch).
    MESH_DATA: int = 0
    # Tensor (model) parallelism: Megatron-style sharding of the attention
    # head and FFN hidden axes over a second 'model' mesh axis. 1 = off.
    # Requires HEADS % MODEL_PARALLEL == 0 and FFN_DIM % MODEL_PARALLEL == 0.
    MODEL_PARALLEL: int = 1
    # Attention implementation: "xla" | "pallas"
    ATTENTION_IMPL: str = "pallas"
    # Backbone conv implementation: "xla" | "pallas". "pallas" fuses each
    # stride-1 bottleneck block into one VMEM-resident kernel
    # (kernels/conv.py) on the stages in CONV_STAGES; stride-2 first blocks
    # and the stem stay on XLA. Default "xla" is set by measurement
    # (docs/STATUS.md roofline): the fused kernel wins layer1 in isolation
    # (1.11x) but loses in-model (0.875x full eval forward) because XLA
    # fuses the stem/layer2 seams; layers 2-4 are compute-bound where XLA's
    # batched conv scheduling wins outright.
    CONV_IMPL: str = "xla"
    CONV_STAGES: Tuple[int, ...] = _tup(1)
    # On-device input preprocessing: the host ships raw uint8 frames + a
    # per-clip affine plan; flip/resize/crop/normalize run INSIDE the jitted
    # step (ops/preprocess.py). 4x fewer host->HBM bytes and no GIL-bound
    # pixel math on the host -- required to keep a weak host from starving
    # the chip. false = legacy host-side float transforms.
    DEVICE_PREPROCESS: bool = True
    # Raw-ingest pixel layout (DEVICE_PREPROCESS only): "rgb" ships uint8
    # [T,H,W,3]; "yuv420" ships a luma plane + quarter-res CbCr (1.5 B/px,
    # HALF the host->device bytes). JPEG and H.264 store 4:2:0 YCbCr
    # natively, so yuv420 ships what the codec decoded; the chroma upsample
    # fuses into the device resample at zero extra cost (ops/preprocess.py).
    # Default rgb = bit-identical to the reference's PIL pixel path.
    INGEST_LAYOUT: str = "rgb"
    # Sequence (frame-axis) parallelism: shard T over the mesh instead of
    # clips -- for single clips too long for one chip's HBM (SURVEY §5).
    # The factorized attention makes per-frame work embarrassingly parallel;
    # GSPMD inserts the gathers for the temporal layers. Single-process only.
    SEQUENCE_PARALLEL: bool = False
    # Size of a DEDICATED 'seq' mesh axis (SEQUENCE_PARALLEL must be on).
    # 1 = the frame axis takes over the 'data' axis (one long clip spans the
    # whole mesh); s>1 = a (data, seq[, model]) mesh where clips shard over
    # 'data' AND each clip's frames shard over 'seq' -- combined dp x sp x tp.
    MESH_SEQ: int = 1
    # Gradient accumulation: split each global batch into GRAD_ACCUM
    # microbatches and lax.scan them inside the SAME jitted step, averaging
    # gradients before the single optimizer update. Reproduces the
    # reference's 8-GPU global batch (scripts/train_net.py DDP, 1 clip/GPU)
    # on fewer chips at 1/GRAD_ACCUM the activation memory; exactly
    # equivalent to the unaccumulated step because every loss term is a
    # mean of per-clip reductions with a GLOBAL num_boxes normalizer
    # (train/criterion.py docstring). Requires batch % GRAD_ACCUM == 0.
    GRAD_ACCUM: int = 1
    # Rematerialize the backbone to trade FLOPs for HBM during training.
    REMAT_BACKBONE: bool = True
    # Which backbone stages remat applies to (REMAT_BACKBONE must be on).
    # Early stages carry the big spatial maps (the memory), late stages the
    # FLOPs (the recompute cost). Default (1, 2) keeps layer3/4 activations
    # live: measured 139 ms/step vs 157 (all stages) vs 136 (remat off) on
    # v5e at the flagship recipe shape (R101, 64f @416, b=1) -- near the
    # no-remat speed with most of the HBM headroom retained. NOTE: this
    # default raises the HBM high-water mark vs rematting every stage; for
    # HBM-limited shapes (longer clips, higher res, bigger per-chip batch)
    # set REMAT_STAGES (1, 2, 3, 4).
    REMAT_STAGES: Tuple[int, ...] = _tup(1, 2)
    REMAT_ENCODER: bool = False
    # Eval two-stream split on DEVICE: ship each test clip's batch over the
    # wire ONCE and do the even/odd subsample + stream stacking inside the
    # jitted forward (a strided slice + concat XLA fuses away) instead of on
    # the host. Wire bytes are identical either way (2B x T/2 == B x T; the
    # sampled test frames are distinct, data/sampling.py), but the host-side
    # pixel copies of subsample_stream/stack_streams disappear -- which
    # matters on weak/1-core hosts. Default ON: results are value-identical
    # to the host path (tests/test_eval_device_split.py pins the split op
    # exactly and full do_eval metrics) and it measured strictly faster on a
    # link-bound host (618.8 -> 412.7 ms/clip, docs/STATUS.md r5) and
    # neutral-to-better elsewhere. Applies single-process only (the
    # multi-host path keeps the collective-lockstep host assembly); measured
    # delta in bench.py e2e_eval_devsplit_ms_per_clip.
    EVAL_DEVICE_SPLIT: bool = True
    # Capture jax.profiler traces into OUTPUT_DIR/trace at this step (<0 = off).
    PROFILE_STEP: int = -1
    # Persistent XLA compilation cache dir. "" = default to
    # OUTPUT_DIR/compile_cache when OUTPUT_DIR is set (multi-scale training
    # compiles one program per canvas bucket and each costs minutes on
    # remote-compile TPU platforms); "off" = disabled; any path overrides.
    COMPILE_CACHE_DIR: str = ""


@dataclass(frozen=True)
class Config:
    FROM_SCRATCH: bool = True
    DATA_TRUNK: Optional[int] = None
    OUTPUT_DIR: str = ""
    DATA_DIR: str = ""
    TENSORBOARD_DIR: str = ""
    SEED: int = 42
    INPUT: InputConfig = field(default_factory=InputConfig)
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    DATALOADER: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    SOLVER: SolverConfig = field(default_factory=SolverConfig)
    TPU: TPUConfig = field(default_factory=TPUConfig)


# --------------------------------------------------------------------------
# Override machinery: dotted-path KEY VALUE pairs and YAML dicts.
# --------------------------------------------------------------------------

def _coerce(value: Any, target_type: Any) -> Any:
    """Coerce a YAML/CLI value into the declared field type."""
    if value is None:
        return None
    if target_type in (int, float, bool, str):
        if target_type is bool and isinstance(value, str):
            low = value.lower()
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
            raise ValueError(f"cannot parse bool from {value!r}")
        return target_type(value)
    # tuples (possibly from YAML lists or CLI "[a,b]" strings)
    origin = getattr(target_type, "__origin__", None)
    if origin in (tuple, list) or target_type in (tuple, list):
        if isinstance(value, str):
            value = value.strip().strip("[]()")
            value = [v for v in value.replace(",", " ").split() if v]
        args = getattr(target_type, "__args__", ())
        elem = args[0] if args else str
        if elem is Ellipsis:
            elem = str
        return tuple(_coerce(v, elem) for v in value)
    # Optional[...]
    if origin is not None and str(origin) == "typing.Union":
        for arg in target_type.__args__:
            if arg is type(None):
                continue
            try:
                return _coerce(value, arg)
            except (TypeError, ValueError):
                continue
        raise ValueError(f"cannot coerce {value!r} to {target_type}")
    return value


def _replace_path(node: Any, path: List[str], value: Any) -> Any:
    name = path[0]
    if not is_dataclass(node):
        raise KeyError(f"config path hits non-node at {name}")
    fmap = {f.name: f for f in fields(node)}
    if name not in fmap:
        raise KeyError(f"unknown config key: {name} (valid: {sorted(fmap)})")
    if len(path) == 1:
        f = fmap[name]
        current = getattr(node, name)
        if is_dataclass(current):
            raise KeyError(f"{name} is a config node, not a leaf")
        return dataclasses.replace(node, **{name: _coerce(value, _resolve_type(node, f))})
    child = getattr(node, name)
    return dataclasses.replace(node, **{name: _replace_path(child, path[1:], value)})


def _resolve_type(node: Any, f: dataclasses.Field) -> Any:
    import typing
    hints = typing.get_type_hints(type(node))
    return hints.get(f.name, f.type)


def merge_from_list(cfg: Config, opts: List[Any]) -> Config:
    """Apply CLI-style overrides: ["SOLVER.BASE_LR", 1e-4, "INPUT.RESOLUTION", 448].

    Mirrors yacs merge_from_list used at ref scripts/train_net.py:289.
    """
    assert len(opts) % 2 == 0, "opts must be KEY VALUE pairs"
    for key, value in zip(opts[::2], opts[1::2]):
        cfg = _replace_path(cfg, key.split("."), value)
    return cfg


def _merge_dict(cfg_node: Any, d: dict) -> Any:
    updates = {}
    fmap = {f.name: f for f in fields(cfg_node)}
    for key, value in d.items():
        if key not in fmap:
            raise KeyError(f"unknown config key: {key}")
        current = getattr(cfg_node, key)
        if is_dataclass(current):
            if not isinstance(value, dict):
                raise ValueError(f"{key} expects a mapping")
            updates[key] = _merge_dict(current, value)
        else:
            updates[key] = _coerce(value, _resolve_type(cfg_node, fmap[key]))
    return dataclasses.replace(cfg_node, **updates)


def merge_from_file(cfg: Config, path: str) -> Config:
    """Merge a YAML recipe (same key layout as the reference experiment YAMLs)."""
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f) or {}
    return _merge_dict(cfg, d)


def default_config() -> Config:
    return Config()


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
