"""Query decoders: DAB-style spatial decoder with iterative anchor refinement
and the temporal (start/end) decoder.

Reference: models/grounding_model/query_decoder.py. One query per frame
(MODEL.QUERY_NUM == 1); the reference's "time-aligned cross-attention" --
query t attends only to frame t's memory tokens, implemented there by Python
loops that repack ragged clips into a batch of length-1 queries
(query_decoder.py:386-429, 618-651) -- is natural batched attention here:
queries [B*T, 1, *] against memories [B*T, M, *]. No repacking, no loops,
static shapes.

The anchor-update detach (query_decoder.py:219) becomes stop_gradient, and the
first-layer pos_transformation==1 special case (query_decoder.py:195-198) is
resolved at trace time (the layer index is static under jit).
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.embeddings import anchor_sine_embedding
from ..ops.misc import inverse_sigmoid
from .attention import MultiHeadAttention, ProjectionFreeAttention

xavier = nn.initializers.xavier_uniform()


def _dense(d, name):
    return nn.Dense(d, kernel_init=xavier, name=name)


class MLP(nn.Module):
    """ReLU MLP; dropout after every layer when enabled. ref net_utils.py:7-26."""

    hidden_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            d = self.out_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(d, dtype=self.dtype, kernel_init=xavier, name=f"layer_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
            if self.dropout > 0 and not deterministic:
                x = nn.Dropout(self.dropout)(x, deterministic=False)
        return x


class TemplateGenerator(nn.Module):
    """Global-context query/anchor templates. ref query_decoder.py:441-475.

    anchor_logits[b,t] = anchor_proj(tanh(gamma(videos_cls_b)) * frames_cls[b,t]
                                     + tanh(beta(videos_cls_b)))
    content[b,t]       = content_proj(videos_cls_b)
    """

    d_model: int
    query_dim: int = 4

    @nn.compact
    def __call__(self, frames_cls, videos_cls):
        gamma = jnp.tanh(_dense(self.d_model, "gamma_proj")(videos_cls))
        beta = jnp.tanh(_dense(self.d_model, "beta_proj")(videos_cls))
        anchor_logits = _dense(self.query_dim, "anchor_proj")(
            gamma[:, None] * frames_cls + beta[:, None]
        )
        content = _dense(self.d_model, "content_proj")(videos_cls)
        content = jnp.broadcast_to(content[:, None], frames_cls.shape)
        return anchor_logits, content


class SpatialDecoderLayer(nn.Module):
    """Temporal self-attn + time-aligned concat cross-attn + FFN.

    ref query_decoder.py:250-438. External per-component projections feed a
    *projected* MHA for self-attention (double projection -- faithful to the
    reference) and a projection-free concat attention for cross-attention.
    """

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    from_scratch: bool = True
    has_ca_qpos_proj: bool = True  # only layer 0 keeps it (ref :166-167)
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,             # [B, T, d]
        memory: jnp.ndarray,          # [B, T, M, d]
        mem_valid: jnp.ndarray,       # [B, T, M]
        mem_pos: jnp.ndarray,         # [B, T, M, d]
        query_pos: jnp.ndarray,       # [B, T, d] from ref_point_head
        query_time: jnp.ndarray,      # [B, T, d] sine time embedding
        query_sine_embed: jnp.ndarray,  # [B, T, d] scaled anchor sine embed
        frame_valid: jnp.ndarray,     # [B, T]
        is_first: bool,
        deterministic: bool = True,
    ):
        d, h = self.d_model, self.num_heads
        drop = lambda x: x if deterministic else nn.Dropout(self.dropout)(x, deterministic=False)

        # ---- temporal self-attention over the T frame-queries ----
        q = (
            _dense(d, "sa_qcontent_proj")(tgt)
            + _dense(d, "sa_qtime_proj")(query_time)
            + _dense(d, "sa_qpos_proj")(query_pos)
        )
        k = (
            _dense(d, "sa_kcontent_proj")(tgt)
            + _dense(d, "sa_ktime_proj")(query_time)
            + _dense(d, "sa_kpos_proj")(query_pos)
        )
        v = _dense(d, "sa_v_proj")(tgt)
        sa_out, sa_weights = MultiHeadAttention(
            d, h, dropout=self.dropout, dtype=self.dtype, name="self_attn"
        )(q, k, v, key_valid=frame_valid, return_weights=True,
          deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + drop(sa_out))

        # ---- time-aligned cross-attention ----
        b, t, m, _ = memory.shape
        q_content = _dense(d, "ca_qcontent_proj")(tgt)
        k_content = _dense(d, "ca_kcontent_proj")(memory)
        v_mem = _dense(d, "ca_v_proj")(memory)
        k_pos = _dense(d, "ca_kpos_proj")(mem_pos)

        if is_first and self.has_ca_qpos_proj:
            q_content = q_content + _dense(d, "ca_qpos_proj")(query_pos)
            k_content = k_content + k_pos

        sine = _dense(d, "ca_qpos_sine_proj")(query_sine_embed)
        hd = d // h
        if self.from_scratch:
            # per-head concat: q -> [B,T,h,2*hd] -> [B,T,2d]; same for k
            qc = jnp.concatenate(
                [q_content.reshape(b, t, h, hd), sine.reshape(b, t, h, hd)], axis=-1
            ).reshape(b, t, 2 * d)
            kc = jnp.concatenate(
                [k_content.reshape(b, t, m, h, hd), k_pos.reshape(b, t, m, h, hd)],
                axis=-1,
            ).reshape(b, t, m, 2 * d)
            ca_out, _ = ProjectionFreeAttention(
                qk_dim=2 * d, v_dim=d, num_heads=h, dropout=self.dropout,
                dtype=self.dtype, impl=self.impl, name="cross_attn",
            )(
                qc.reshape(b * t, 1, 2 * d),
                kc.reshape(b * t, m, 2 * d),
                v_mem.reshape(b * t, m, d),
                key_valid=mem_valid.reshape(b * t, m),
                deterministic=deterministic,
            )
        else:
            # pretrained-init mode: the reference uses a STANDARD projected
            # MHA here (cross_attn_image, query_decoder.py:287-289) -- q/k/v
            # in-projections exist, unlike the from-scratch concat path
            qc = (q_content.reshape(b, t, h, hd) + sine.reshape(b, t, h, hd)).reshape(b, t, d)
            qc = qc + _dense(d, "ca_qtime_proj")(query_time)
            kc = (k_content + k_pos)
            ca_out, _ = MultiHeadAttention(
                d, h, dropout=self.dropout, dtype=self.dtype, impl=self.impl,
                name="cross_attn",
            )(
                qc.reshape(b * t, 1, d),
                kc.reshape(b * t, m, d),
                v_mem.reshape(b * t, m, d),
                key_valid=mem_valid.reshape(b * t, m),
                deterministic=deterministic,
            )
        ca_out = ca_out.reshape(b, t, d)
        # zero the contribution at padded frames (the ref repack loop leaves
        # padded slots at zero, query_decoder.py:421-428)
        ca_out = jnp.where(frame_valid[..., None], ca_out, 0.0)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + drop(ca_out))

        # ---- FFN ----
        ff = _dense(self.ffn_dim, "linear1")(tgt)
        ff = _dense(d, "linear2")(drop(nn.relu(ff)))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm4")(tgt + drop(ff))
        return tgt, sa_weights


class SpatialDecoder(nn.Module):
    """Stack with per-layer iterative anchor update. ref query_decoder.py:150-247.

    bbox_embed is passed in (shared with the final box head,
    ref pipeline.py:50).
    """

    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    bbox_embed: MLP
    query_dim: int = 4
    dropout: float = 0.1
    from_scratch: bool = True
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        anchors: jnp.ndarray,       # [B, T, 4] in (0,1)
        memory: jnp.ndarray,        # [B, T, M, d]
        mem_valid: jnp.ndarray,
        mem_pos: jnp.ndarray,
        query_time: jnp.ndarray,    # [B, T, d]
        frame_valid: jnp.ndarray,
        deterministic: bool = True,
    ):
        d = self.d_model
        tgt = jnp.zeros(anchors.shape[:2] + (d,), jnp.float32)
        query_scale = MLP(d, d, 2, name="query_scale")
        ref_point_head = MLP(d, d, 2, name="ref_point_head")
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        hs_layers, ref_layers = [], [anchors]
        for i in range(self.num_layers):
            sine512 = anchor_sine_embedding(anchors, d_half=d // 2)  # [B,T,2d]
            query_pos = ref_point_head(sine512)
            pos_transform = 1.0 if i == 0 else query_scale(tgt)
            query_sine = sine512[..., :d] * pos_transform

            tgt, _ = SpatialDecoderLayer(
                d, self.num_heads, self.ffn_dim, self.dropout,
                from_scratch=self.from_scratch,
                has_ca_qpos_proj=(i == 0),
                dtype=self.dtype, impl=self.impl, name=f"layer_{i}",
            )(
                tgt, memory, mem_valid, mem_pos, query_pos, query_time,
                query_sine, frame_valid, is_first=(i == 0),
                deterministic=deterministic,
            )

            # iterative anchor update (ref :212-219)
            delta = self.bbox_embed(tgt, deterministic=deterministic)
            new_anchor = jax.nn.sigmoid(
                delta[..., : self.query_dim] + inverse_sigmoid(anchors)
            )
            if i != self.num_layers - 1:
                ref_layers.append(new_anchor)
            anchors = jax.lax.stop_gradient(new_anchor)
            hs_layers.append(norm(tgt))

        hs = jnp.stack(hs_layers)        # [L, B, T, d]
        reference = jnp.stack(ref_layers)  # [L, B, T, 4]
        return hs, reference


class TimeDecoderLayer(nn.Module):
    """Self-attn (returns weights for the guided-attn loss) + time-aligned
    cross-attn + FFN. ref query_decoder.py:553-660."""

    # LayerNorm epsilon is torch's 1e-5 (flax defaults to 1e-6): at layer 0
    # the residual stream starts at exactly zero, where LN sensitivity is
    # 1/sqrt(eps) -- the mismatch shows up as a sqrt(10)x gradient deviation
    # on the value/out biases (caught by tests/test_grad_parity.py).

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,           # [B, T, d]
        memory: jnp.ndarray,        # [B, T, M, d]
        mem_valid: jnp.ndarray,
        mem_pos: jnp.ndarray,
        query_pos: jnp.ndarray,     # [B, T, d] content query
        query_time_pos: jnp.ndarray,  # [B, T, d]
        frame_valid: jnp.ndarray,
        deterministic: bool = True,
    ):
        d = self.d_model
        drop = lambda x: x if deterministic else nn.Dropout(self.dropout)(x, deterministic=False)

        qk = tgt + query_pos + query_time_pos
        sa_out, weights = MultiHeadAttention(
            d, self.num_heads, dropout=self.dropout, dtype=self.dtype,
            name="self_attn",
        )(qk, qk, tgt, key_valid=frame_valid, return_weights=True,
          deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + drop(sa_out))

        b, t, m, _ = memory.shape
        q = (tgt + query_pos).reshape(b * t, 1, d)
        k = (memory + mem_pos).reshape(b * t, m, d)
        v = memory.reshape(b * t, m, d)
        ca_out, _ = MultiHeadAttention(
            d, self.num_heads, dropout=self.dropout, dtype=self.dtype,
            impl=self.impl, name="cross_attn",
        )(q, k, v, key_valid=mem_valid.reshape(b * t, m),
          deterministic=deterministic)
        ca_out = ca_out.reshape(b, t, d)
        ca_out = jnp.where(frame_valid[..., None], ca_out, 0.0)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + drop(ca_out))

        ff = _dense(self.ffn_dim, "linear1")(tgt)
        ff = _dense(d, "linear2")(drop(nn.relu(ff)))
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm4")(tgt + drop(ff))
        return tgt, weights


class TimeDecoder(nn.Module):
    """ref query_decoder.py:478-550; returns per-layer states and self-attn weights."""

    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        memory, mem_valid, mem_pos, query_pos, query_time_pos, frame_valid,
        deterministic: bool = True,
    ):
        b, t = frame_valid.shape
        tgt = jnp.zeros((b, t, self.d_model), jnp.float32)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        states, all_weights = [], []
        for i in range(self.num_layers):
            tgt, weights = TimeDecoderLayer(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, impl=self.impl, name=f"layer_{i}",
            )(tgt, memory, mem_valid, mem_pos, query_pos, query_time_pos,
              frame_valid, deterministic=deterministic)
            states.append(norm(tgt))
            all_weights.append(weights)
        return jnp.stack(states), jnp.stack(all_weights)  # [L,B,T,d], [L,B,T,T]
