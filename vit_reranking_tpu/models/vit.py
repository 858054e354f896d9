"""DeiT/ViT-small backbone (Flax) + pairwise cross-attention rescorer.

Standard ViT (timm `deit_small_patch16_224` topology: patch16, dim 384,
6 heads, 12 blocks) with the reference's manual forward that exposes the cls
token and the 196 patch tokens after the final LayerNorm (reference
architectures/vit.py:45-60).  ``ret_qk`` additionally returns the q/k
projections of a chosen block for the attention-marginal rerank variants
(reference evaluation/eval_attn_diml.py:18-38).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import DropPath, Mlp, l2norm, trunc_normal_init


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    # narrow_sm: let the (T, T) attention scores + softmax follow the compute
    # dtype instead of pinning f32 — same recipe as models/cvt.py (halves the
    # probability tensor's HBM traffic in bf16 mode; MXU accumulation is
    # unchanged).  Inert in f32; q/k returned by ret_qk are pre-softmax, so
    # the attention-marginal rerank inputs are unaffected.  Mirroring
    # models/cvt.py's `and not ret_attn` gate, narrowing also disables on the
    # probed block (ret_qk) so any future consumer of its attention
    # PROBABILITIES gets the f32 softmax — today only pre-softmax q/k leave
    # the block, so this is belt-and-braces, not a behavior fix.
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_qk: bool = False):
        B, T, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(B, T, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, T, hd)
        narrow = self.narrow_sm and self.dtype != jnp.float32 and not ret_qk
        attn = jax.nn.softmax(
            jnp.einsum(
                "bhtd,bhsd->bhts", q, k,
                preferred_element_type=None if narrow else jnp.float32,
            )
            * (hd**-0.5),
            axis=-1,
        )
        attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
        out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        qk = (q, k) if ret_qk else None
        return out, qk


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    narrow_sm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, ret_qk: bool = False):
        # LayerNorms compute in f32 regardless of the activation dtype (same
        # mixed-precision recipe as models/cvt.py); residual stream stays in
        # self.dtype
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        attn_out, qk = ViTAttention(
            self.dim, self.num_heads, narrow_sm=self.narrow_sm,
            dtype=self.dtype, name="attn"
        )(y.astype(self.dtype), train, ret_qk)
        x = x + DropPath(self.drop_path, name="dp1")(attn_out, train)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = Mlp(
            # exact erf GELU — timm ViT/DeiT semantics (flax nn.gelu defaults
            # to the tanh approximation, ~1e-3 off per block)
            int(self.dim * self.mlp_ratio), self.dim,
            act=lambda t: nn.gelu(t, approximate=False),
            dtype=self.dtype, name="mlp",
        )(y.astype(self.dtype), train)
        x = x + DropPath(self.drop_path, name="dp2")(y, train)
        return x, qk


class ViTNetwork(nn.Module):
    """DeiT-small retrieval wrapper (reference architectures/vit.py:13-60)."""

    embed_dim: int = 128
    normalize: bool = True
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch: int = 16
    qk_block: int = 0  # block whose q/k are captured when ret_attn
    narrow_sm: bool = False  # bf16 attention softmax (see ViTAttention)
    dtype: Any = jnp.float32  # activation compute dtype (bf16 = mixed)

    @nn.compact
    def __call__(
        self, x, train: bool = False, ret_attn: bool = False, ret_layers: bool = False
    ):
        B = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), dtype=self.dtype,
            name="patch_embed_proj",
        )(x)
        _, H, W, _ = x.shape
        tokens = x.reshape(B, H * W, self.dim)
        cls = self.param("cls_token", trunc_normal_init(), (1, 1, self.dim))
        tokens = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), tokens], axis=1)
        pos = self.param(
            "pos_embed", trunc_normal_init(), (1, H * W + 1, self.dim)
        )
        tokens = (tokens + pos).astype(self.dtype)

        qk_out = None
        layer_tokens = []
        for i in range(self.depth):
            tokens, qk = ViTBlock(
                self.dim, self.num_heads, narrow_sm=self.narrow_sm,
                dtype=self.dtype, name=f"block{i}"
            )(tokens, train, ret_qk=(ret_attn and i == self.qk_block))
            if qk is not None:
                qk_out = qk
            if ret_layers:
                layer_tokens.append(tokens)

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(tokens)
        tokens = tokens.astype(jnp.float32)  # head + rerank features in f32
        enc_out = tokens[:, 0]
        no_avg_feat = tokens[:, 1:]  # (B, 196, 384)
        head = nn.Dense(self.embed_dim, name="head")
        out = head(enc_out)
        if self.normalize:
            out = l2norm(out)
        aux: Dict[str, Any] = {"head_tokens": head(no_avg_feat)}
        if ret_attn and qk_out is not None:
            aux["q"], aux["k"] = qk_out
        if ret_layers:
            # (B, L_layers, n_patches, D): per-block patch tokens, cls dropped
            # (reference get_vit_block_output final_only=False,
            # eval_cvt_diml.py:148-166)
            aux["layer_tokens"] = jnp.stack(layer_tokens, axis=1)[:, :, 1:, :]
        return out, (enc_out, no_avg_feat), aux


class CrossAttentionBlock(nn.Module):
    """Single-query cross attention (reference vit.py:65-103): the cls token
    attends over the other image's patch tokens."""

    dim: int
    heads: int = 12
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x_qkv, train: bool = False):
        inner = self.heads * self.dim_head
        k = nn.Dense(inner, name="to_k")(x_qkv)
        v = nn.Dense(inner, name="to_v")(x_qkv)
        q = nn.Dense(inner, name="to_q")(x_qkv[:, :1])
        B, T, _ = x_qkv.shape
        rs = lambda t: t.reshape(B, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = rs(q), rs(k), rs(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5), axis=-1
        )
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class CrossNet(nn.Module):
    """Pairwise cross-attention rescorer (reference vit.py:105-148 /
    swin.py:63-147): exchanges cls<->patch attention between two images'
    tokens, then projects both cls tokens to embeddings."""

    embed_dim: int = 128
    dim: int = 384
    depth: int = 1
    normalize: bool = True

    @nn.compact
    def __call__(self, xs, ys, train: bool = False):
        for d in range(self.depth):
            ln_s = nn.LayerNorm(name=f"ln_src{d}")
            ln_t = nn.LayerNorm(name=f"ln_tgt{d}")
            ca_s = CrossAttentionBlock(self.dim, dropout=0.2, name=f"cross_src{d}")
            ca_t = CrossAttentionBlock(self.dim, dropout=0.2, name=f"cross_tgt{d}")

            x_cls, x_patch = xs[:, :1], xs[:, 1:]
            y_cls, y_patch = ys[:, :1], ys[:, 1:]

            qkv = jnp.concatenate([x_cls, y_patch], axis=1)
            x_cls = x_cls + ca_s(ln_s(qkv), train)
            xs = jnp.concatenate([x_cls, x_patch], axis=1)

            qkv = jnp.concatenate([y_cls, x_patch], axis=1)
            y_cls = y_cls + ca_t(ln_t(qkv), train)
            ys = jnp.concatenate([y_cls, y_patch], axis=1)

        head = nn.Dense(self.embed_dim, name="head")
        x_out, y_out = head(xs[:, 0]), head(ys[:, 0])
        if self.normalize:
            x_out, y_out = l2norm(x_out), l2norm(y_out)
        return x_out, y_out


def calc_similarity_cross(anchor_tokens, fb_tokens, cross_apply):
    """Cross-encoder rerank scores (reference utilities/cross.py:22-32):
    expand the anchor against each candidate, cross-encode the pair, score by
    the dot product of the two cross-attended cls embeddings.

    anchor_tokens (L, D); fb_tokens (N, L, D); cross_apply = bound CrossNet.
    """
    N = fb_tokens.shape[0]
    anchors = jnp.broadcast_to(anchor_tokens[None], fb_tokens.shape)
    a_cls, f_cls = cross_apply(anchors, fb_tokens)
    return jnp.einsum("bd,bd->b", a_cls, f_cls, preferred_element_type=jnp.float32)
