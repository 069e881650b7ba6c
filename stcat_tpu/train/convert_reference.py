"""Converter: reference STCAT (.pth) / MDETR checkpoints -> our param trees.

Lets a user of the reference framework bring their trained weights here:

  - ``convert_reference_stcat``: a full reference ``model`` /``model_ema``
    state_dict (ref naming: vis_encoder.0.body.*, text_encoder.*,
    ground_encoder.*, ground_decoder.*, heads) -> (params, constants).
  - ``remap_mdetr``: pretrained-MDETR initialization (backbone + transformer
    encoder -> our vis path + spatial encoder layers), replicating the key
    remap of ref utils/checkpoint.py:122-172, then reusing the full converter.

All mappings are validated by tests/test_convert_reference.py against a
synthetically-constructed reference-shaped state_dict.
"""

from __future__ import annotations

from typing import Dict, Set, Tuple


from .checkpoint import (
    _dense,
    _t,
    convert_hf_roberta,
    convert_torch_mha,
    convert_torch_resnet,
)


def _linear(sd, name):
    return {"kernel": _dense(sd[name + ".weight"]), "bias": _t(sd[name + ".bias"])}


def _ln(sd, name):
    return {"scale": _t(sd[name + ".weight"]), "bias": _t(sd[name + ".bias"])}


def _mlp(sd, name, num_layers):
    return {
        f"layer_{j}": _linear(sd, f"{name}.layers.{j}") for j in range(num_layers)
    }


def _sub(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _encoder_layer(sd, prefix):
    return {
        "self_attn": convert_torch_mha(sd, prefix + ".self_attn."),
        "linear1": _linear(sd, prefix + ".linear1"),
        "linear2": _linear(sd, prefix + ".linear2"),
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
    }


def convert_reference_stcat(sd: Dict, cfg, strict: bool = True) -> Tuple[Dict, Dict, Set[str]]:
    """Full reference model state_dict -> (params, constants, unused_keys).

    strict=False skips sections whose keys are absent (partial checkpoints
    like MDETR inits, ref checkpoint.py:165-168 load_state_dict(strict=False)).
    """
    s = cfg.MODEL.STCAT
    params: Dict = {}
    consumed: Set[str] = set()

    def take(keys):
        consumed.update(keys)

    class _Skip(Exception):
        pass

    def section(build):
        try:
            build()
        except KeyError:
            if strict:
                raise

    constants_box = [{}]

    def vis_section():
        vis_prefix = "vis_encoder.0.body."
        vis_sd = _sub(sd, vis_prefix)
        if not vis_sd:
            raise KeyError(vis_prefix)
        name = cfg.MODEL.VISION_BACKBONE.NAME
        depths = (3, 4, 6, 3) if name.startswith("resnet50") else (3, 4, 23, 3)
        if cfg.MODEL.VISION_BACKBONE.DEPTHS:
            depths = tuple(cfg.MODEL.VISION_BACKBONE.DEPTHS)
        vis_params, vis_const = convert_torch_resnet(
            vis_sd, depths, norm="gn" if name.endswith("-gn") else "frozenbn"
        )
        params["vis_encoder"] = vis_params
        constants_box[0] = {"vis_encoder": vis_const}
        take(k for k in sd if k.startswith(vis_prefix))

    def pos_section():
        # learned 2-D position embedding lives at Joiner index 1
        # (ref vision_model/position_encoding.py:97-131, backbone.py:147)
        key = "vis_encoder.1.row_embed.weight"
        if key in sd:
            params["pos_encoding"] = {
                "learned": {
                    "row_embed": _t(sd[key]),
                    "col_embed": _t(sd["vis_encoder.1.col_embed.weight"]),
                }
            }
            take([key, "vis_encoder.1.col_embed.weight"])

    def input_proj_section():
        w = _t(sd["input_proj.weight"])  # [256, 2048, 1, 1]
        params["input_proj"] = {
            "kernel": w[:, :, 0, 0].T,
            "bias": _t(sd["input_proj.bias"]),
        }
        take(["input_proj.weight", "input_proj.bias"])

    def text_section():
        rob_prefix = "text_encoder.body."
        rob_sd = _sub(sd, rob_prefix)
        if not rob_sd:
            raise KeyError(rob_prefix)
        params["text_encoder"] = {
            "roberta": convert_hf_roberta(rob_sd, num_layers=cfg.MODEL.TEXT_MODEL.LAYERS),
            "resizer": {
                "fc": _linear(sd, "text_encoder.resizer.fc"),
                "ln": _ln(sd, "text_encoder.resizer.layer_norm"),
            },
        }
        take(k for k in sd if k.startswith("text_encoder."))

    def encoder_section():
        enc = {}
        for i in range(s.ENC_LAYERS):
            enc[f"spatial_{i}"] = _encoder_layer(sd, f"ground_encoder.encoder.spatial_layers.{i}")
            # temporal layers are absent in MDETR partial inits
            if f"ground_encoder.encoder.temporal_layers.{i}.self_attn.in_proj_weight" in sd:
                enc[f"temporal_{i}"] = _encoder_layer(sd, f"ground_encoder.encoder.temporal_layers.{i}")
        for tok, ours in (("frame_cls", "frame_cls"), ("video_cls", "video_cls"),
                          ("local_pos_embed", "local_pos_embed")):
            key = f"ground_encoder.encoder.{tok}.weight"
            if key in sd:
                enc[ours] = _t(sd[key])[0]
        if s.USE_LEARN_TIME_EMBED and "ground_encoder.encoder.time_embed.embed.weight" in sd:
            enc["time_embed"] = {"embed": _t(sd["ground_encoder.encoder.time_embed.embed.weight"])}
        params["ground_encoder"] = enc
        take(k for k in sd if k.startswith("ground_encoder.encoder."))
        # ground_encoder.fusion.* is dead code in the reference (never used in
        # forward, modal_encoder.py:29) -- intentionally dropped
        take(k for k in sd if k.startswith("ground_encoder.fusion."))

    def template_section():
        params["template_generator"] = {
            name: _linear(sd, f"ground_decoder.template_generator.{name}")
            for name in ("content_proj", "gamma_proj", "beta_proj", "anchor_proj")
        }
        take(k for k in sd if k.startswith("ground_decoder.template_generator."))

    def decoder_section():
        dec = {
            "query_scale": _mlp(sd, "ground_decoder.decoder.query_scale", 2),
            "ref_point_head": _mlp(sd, "ground_decoder.decoder.ref_point_head", 2),
            "norm": _ln(sd, "ground_decoder.decoder.norm"),
        }
        for i in range(s.DEC_LAYERS):
            p = f"ground_decoder.decoder.layers.{i}"
            layer = {
                "self_attn": convert_torch_mha(sd, p + ".self_attn."),
                "norm1": _ln(sd, p + ".norm1"),
                "norm3": _ln(sd, p + ".norm3"),
                "norm4": _ln(sd, p + ".norm4"),
                "linear1": _linear(sd, p + ".linear1"),
                "linear2": _linear(sd, p + ".linear2"),
            }
            if f"{p}.cross_attn.out_proj.weight" in sd:
                # FROM_SCRATCH: projection-free concat attention, out_proj only
                layer["cross_attn"] = {
                    "out_proj": _linear(sd, p + ".cross_attn.out_proj")
                }
            else:
                # pretrained-init: standard torch MHA named cross_attn_image
                layer["cross_attn"] = convert_torch_mha(sd, p + ".cross_attn_image.")
            for proj in (
                "sa_qcontent_proj", "sa_qpos_proj", "sa_qtime_proj",
                "sa_kcontent_proj", "sa_kpos_proj", "sa_ktime_proj", "sa_v_proj",
                "ca_qcontent_proj", "ca_kcontent_proj", "ca_kpos_proj",
                "ca_v_proj", "ca_qpos_sine_proj",
            ):
                layer[proj] = _linear(sd, f"{p}.{proj}")
            if i == 0 and f"{p}.ca_qpos_proj.weight" in sd:
                layer["ca_qpos_proj"] = _linear(sd, f"{p}.ca_qpos_proj")
            if not s.FROM_SCRATCH and f"{p}.ca_qtime_proj.weight" in sd:
                layer["ca_qtime_proj"] = _linear(sd, f"{p}.ca_qtime_proj")
            dec[f"layer_{i}"] = layer
        params["decoder"] = dec
        take(k for k in sd if k.startswith("ground_decoder.decoder."))

    def time_decoder_section():
        tdec = {"norm": _ln(sd, "ground_decoder.temp_decoder.norm")}
        for i in range(s.DEC_LAYERS):
            p = f"ground_decoder.temp_decoder.layers.{i}"
            tdec[f"layer_{i}"] = {
                "self_attn": convert_torch_mha(sd, p + ".self_attn."),
                "cross_attn": convert_torch_mha(sd, p + ".cross_attn_image."),
                "linear1": _linear(sd, p + ".linear1"),
                "linear2": _linear(sd, p + ".linear2"),
                "norm1": _ln(sd, p + ".norm1"),
                "norm3": _ln(sd, p + ".norm3"),
                "norm4": _ln(sd, p + ".norm4"),
            }
        params["temp_decoder"] = tdec
        take(k for k in sd if k.startswith("ground_decoder.temp_decoder."))
        # the grounding decoder's shared query-time embedding: a learned
        # table when USE_LEARN_TIME_EMBED (query_decoder.py:72), else a
        # fixed sine buffer (.te) that we recompute
        if "ground_decoder.time_embed.embed.weight" in sd:
            params["dec_time_embed"] = {
                "embed": _t(sd["ground_decoder.time_embed.embed.weight"])
            }
        take(k for k in sd if k.startswith("ground_decoder.time_embed."))

    def heads_section():
        params["bbox_embed"] = _mlp(sd, "bbox_embed", 3)
        take(k for k in sd if k.startswith("bbox_embed."))
        if "temp_embed.layers.0.weight" in sd:
            params["temp_embed"] = _mlp(sd, "temp_embed", 2)
            take(k for k in sd if k.startswith("temp_embed."))
        if s.USE_ACTION and "action_embed.layers.0.weight" in sd:
            params["action_embed"] = _mlp(sd, "action_embed", 2)
            take(k for k in sd if k.startswith("action_embed."))

    for build in (vis_section, pos_section, input_proj_section, text_section,
                  encoder_section, template_section, decoder_section,
                  time_decoder_section, heads_section):
        section(build)
    constants = constants_box[0]

    unused = {
        k for k in sd
        if k not in consumed
        and not k.endswith("num_batches_tracked")
        and ".time_embed.te" not in k  # fixed sine buffers
        and not k.startswith("ground_encoder.encoder.time_embed.")
    }
    return params, constants, unused


def remap_mdetr(mdetr_sd: Dict, model_keys=None) -> Dict:
    """MDETR checkpoint names -> reference STCAT names (partial init).

    Replicates ref utils/checkpoint.py:122-172: backbone -> vis_encoder,
    transformer.text_encoder/resizer -> text_encoder, transformer encoder
    layers -> ground_encoder spatial layers, transformer.decoder ->
    ground_decoder, input_proj/bbox_embed as-is. Returns a reference-shaped
    partial state_dict ready for convert_reference_stcat (missing modules
    keep their fresh initialization).
    """
    out = {}
    for k, v in mdetr_sd.items():
        if k.startswith("backbone."):
            out[k.replace("backbone.", "vis_encoder.", 1)] = v
        elif k.startswith("transformer.text_encoder."):
            out[k.replace("transformer.text_encoder.", "text_encoder.body.", 1)] = v
        elif k.startswith("transformer.resizer."):
            out[k.replace("transformer.resizer.", "text_encoder.resizer.", 1)] = v
        elif k.startswith("transformer.encoder.layers."):
            out[
                k.replace(
                    "transformer.encoder.layers.",
                    "ground_encoder.encoder.spatial_layers.", 1,
                )
            ] = v
        elif k.startswith("transformer.decoder."):
            out[k.replace("transformer.", "ground_decoder.", 1)] = v
        elif k.startswith(("input_proj.", "bbox_embed.")):
            out[k] = v
    return out


def merge_partial(params: Dict, partial: Dict) -> Dict:
    """Recursively overlay converted (partial) params onto fresh init."""
    out = dict(params)
    for k, v in partial.items():
        if k in out and isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_partial(out[k], v)
        else:
            out[k] = v
    return out
