"""STCAT pipeline assembly: vision + text encoders, cross-modal encoder,
query decoders, prediction heads.

Reference: models/pipeline.py:12-121. The forward takes a fixed-shape
VideoBatch and returns the same output contract as the reference:
{pred_boxes, pred_sted, pred_actioness, weights, aux_outputs}, except
pred_boxes keeps its [B, T, 4] layout (the reference flattens to [B*T, 4]).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..core.batch import VideoBatch
from ..ops.misc import inverse_sigmoid
from .decoder import MLP, SpatialDecoder, TemplateGenerator, TimeDecoder
from .encoder import CrossModalEncoder, TimeEmbedding
from .lstm_text import LSTMTextEncoder
from .position2d import PositionEncoding2D
from .resnet import build_resnet, downsample_mask
from .roberta import RobertaConfig, TextEncoder


class STCATNet(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        s = c.MODEL.STCAT
        self.d_model = s.HIDDEN
        dtype = jnp.dtype(c.TPU.COMPUTE_DTYPE)
        self.compute_dtype = dtype

        backbone, vis_dim = build_resnet(
            c.MODEL.VISION_BACKBONE.NAME,
            c.MODEL.VISION_BACKBONE.DILATION,
            dtype=dtype,
            depths=c.MODEL.VISION_BACKBONE.DEPTHS,
            remat_blocks=c.TPU.REMAT_BACKBONE,
            remat_stages=c.TPU.REMAT_STAGES,
            # whole body frozen when the config freezes the backbone
            # (ref backbone.py:78-85 + engine/optimizer.py lr=0 group)
            frozen_stages=4
            if (c.MODEL.VISION_BACKBONE.FREEZE or c.SOLVER.VIS_BACKBONE_LR <= 0)
            else 1,
            conv_impl=c.TPU.CONV_IMPL,
            conv_stages=c.TPU.CONV_STAGES,
        )
        self.vis_encoder = backbone
        self.input_proj = nn.Dense(self.d_model, dtype=dtype, name="input_proj")

        tm = c.MODEL.TEXT_MODEL
        if c.MODEL.USE_LSTM:
            # GloVe+LSTM alternative path (ref language_model/lstm.py)
            self.text_encoder = LSTMTextEncoder(
                vocab_size=tm.VOCAB_SIZE,
                d_model=self.d_model,
                hidden_size=c.MODEL.LSTM.HIDDEN_SIZE,
                embed_dim=c.MODEL.LSTM.EMBED_DIM,
                num_layers=c.MODEL.LSTM.NUM_LAYERS,
                bidirectional=c.MODEL.LSTM.BIDIRECTIONAL,
                glove_path=c.MODEL.LSTM.GLOVE_PATH,
            )
        else:
            self.text_encoder = TextEncoder(
                d_model=self.d_model,
                cfg=RobertaConfig(
                    vocab_size=tm.VOCAB_SIZE,
                    hidden_size=tm.HIDDEN,
                    num_layers=tm.LAYERS,
                    num_heads=tm.HEADS,
                    intermediate_size=tm.INTERMEDIATE,
                    max_position_embeddings=tm.MAX_POS,
                    dropout=tm.DROPOUT,
                ),
                dtype=dtype,
                freeze_body=tm.FREEZE,
            )
        self.pos_encoding = PositionEncoding2D(
            kind=c.MODEL.VISION_BACKBONE.POS_ENC, num_pos_feats=self.d_model // 2,
            name="pos_encoding",
        )

        self.ground_encoder = CrossModalEncoder(
            d_model=self.d_model,
            num_heads=s.HEADS,
            ffn_dim=s.FFN_DIM,
            num_layers=s.ENC_LAYERS,
            max_video_len=c.INPUT.MAX_VIDEO_LEN,
            dropout=s.DROPOUT,
            learned_time_embed=s.USE_LEARN_TIME_EMBED,
            dtype=dtype,
            impl=c.TPU.ATTENTION_IMPL,
        )

        self.template_generator = TemplateGenerator(self.d_model, s.QUERY_DIM)
        # shared between the decoder's anchor refinement and the final head
        # (ref pipeline.py:50)
        self.bbox_embed = MLP(self.d_model, 4, 3, name="bbox_embed")
        self.decoder = SpatialDecoder(
            d_model=self.d_model,
            num_heads=s.HEADS,
            ffn_dim=s.FFN_DIM,
            num_layers=s.DEC_LAYERS,
            bbox_embed=self.bbox_embed,
            query_dim=s.QUERY_DIM,
            dropout=s.DROPOUT,
            from_scratch=s.FROM_SCRATCH,
            dtype=dtype,
            impl=c.TPU.ATTENTION_IMPL,
        )
        self.temp_decoder = TimeDecoder(
            d_model=self.d_model,
            num_heads=s.HEADS,
            ffn_dim=s.FFN_DIM,
            num_layers=s.DEC_LAYERS,
            dropout=s.DROPOUT,
            dtype=dtype,
            impl=c.TPU.ATTENTION_IMPL,
        )
        self.dec_time_embed = TimeEmbedding(
            c.INPUT.MAX_VIDEO_LEN + 1, self.d_model,
            learned=s.USE_LEARN_TIME_EMBED, name="dec_time_embed",
        )
        self.temp_embed = MLP(
            self.d_model, 2, 2, dropout=s.HEAD_DROPOUT, name="temp_embed"
        )
        self.use_actioness = s.USE_ACTION
        if self.use_actioness:
            self.action_embed = MLP(
                self.d_model, 1, 2, dropout=s.HEAD_DROPOUT, name="action_embed"
            )
        self.use_attn = c.SOLVER.USE_ATTN
        self.use_aux_loss = c.SOLVER.USE_AUX_LOSS
        self.query_dim = s.QUERY_DIM

    def __call__(self, batch: VideoBatch, deterministic: bool = True) -> Dict[str, Any]:
        b, t, h, w, _ = batch.frames.shape
        d = self.d_model

        # ---- vision path: fold frames into the batch axis ----
        frames = batch.frames.astype(self.compute_dtype)
        feats = self.vis_encoder(frames.reshape(b * t, h, w, 3))
        hf, wf = feats.shape[1:3]
        feats = self.input_proj(feats).reshape(b, t, hf, wf, d).astype(jnp.float32)

        vis_valid = downsample_mask(batch.pixel_valid, (hf, wf))  # [B,T,hf,wf]
        vis_pos = self.pos_encoding(vis_valid)

        # ---- text path ----
        text_feats, text_cls = self.text_encoder(
            batch.token_ids, batch.token_valid, deterministic=deterministic
        )
        text_feats = text_feats.astype(jnp.float32)
        text_cls = text_cls.astype(jnp.float32)

        # ---- cross-modal encoding ----
        memory, mem_valid, frames_cls, videos_cls = self.ground_encoder(
            feats, vis_valid, vis_pos, text_feats, batch.token_valid,
            batch.frame_valid, deterministic=deterministic,
        )
        # memory pos: visual sine pos for HW tokens, zeros for text tokens
        l = text_feats.shape[1]
        mem_pos = jnp.concatenate(
            [vis_pos.reshape(b, t, hf * wf, d), jnp.zeros((b, t, l, d))], axis=2
        )

        # ---- query templates (ref query_decoder.py:97-116) ----
        anchor_logits, content_query = self.template_generator(frames_cls, videos_cls)
        fv = batch.frame_valid[..., None]
        anchors = jnp.where(fv, jax.nn.sigmoid(anchor_logits), 0.0)
        content_query = jnp.where(fv, content_query, 0.0)
        query_time = jnp.broadcast_to(self.dec_time_embed(t)[None], (b, t, d))

        # ---- decoders ----
        hs, reference = self.decoder(
            anchors, memory, mem_valid, mem_pos, query_time, batch.frame_valid,
            deterministic=deterministic,
        )  # [L,B,T,d], [L,B,T,4]
        time_hs, attn_weights = self.temp_decoder(
            memory, mem_valid, mem_pos, content_query, query_time,
            batch.frame_valid, deterministic=deterministic,
        )  # [L,B,T,d], [L,B,T,T]

        # ---- heads (ref pipeline.py:88-105) ----
        delta = self.bbox_embed(hs, deterministic=deterministic)
        coords = jax.nn.sigmoid(
            delta[..., : self.query_dim] + inverse_sigmoid(reference)
        )  # [L,B,T,4]
        sted = self.temp_embed(time_hs, deterministic=deterministic)  # [L,B,T,2]

        out: Dict[str, Any] = {
            "pred_boxes": coords[-1],
            "pred_sted": sted[-1],
        }
        if self.use_attn:
            out["weights"] = attn_weights[-1]
        if self.use_actioness:
            actioness = self.action_embed(time_hs, deterministic=deterministic)
            out["pred_actioness"] = actioness[-1]
        if self.use_aux_loss:
            aux = []
            for i in range(coords.shape[0] - 1):
                a = {"pred_boxes": coords[i], "pred_sted": sted[i]}
                if self.use_attn:
                    a["weights"] = attn_weights[i]
                if self.use_actioness:
                    a["pred_actioness"] = actioness[i]
                aux.append(a)
            out["aux_outputs"] = aux
        return out
