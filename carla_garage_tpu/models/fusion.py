"""GPT-style sensor-fusion transformer (TransFuser core).

The reference fuses image and LiDAR features 4× through a small GPT:
average-pool both maps to anchor grids, 1×1-project to a common channel
width, concatenate as tokens, run n_layer self-attention blocks with learned
positional embeddings + a velocity embedding, split tokens back and
bilinear-upsample with a residual add (transfuser.py:222-402).

Here attention runs in bfloat16 on the MXU via jax.nn.dot_product_attention;
dropout is supported but defaults off (deterministic inference inside the
env step).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelfAttentionBlock(nn.Module):
  n_embd: int
  n_head: int
  block_exp: int = 4
  pdrop: float = 0.0

  @nn.compact
  def __call__(self, x, deterministic=True):
    h = nn.LayerNorm(name="ln1")(x)
    h = nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, qkv_features=self.n_embd,
        dropout_rate=self.pdrop, name="attn")(
        h, h, deterministic=deterministic)
    x = x + h
    h = nn.LayerNorm(name="ln2")(x)
    h = nn.Dense(self.block_exp * self.n_embd, name="mlp_fc")(h)
    h = nn.relu(h)
    h = nn.Dense(self.n_embd, name="mlp_proj")(h)
    h = nn.Dropout(self.pdrop, deterministic=deterministic)(h)
    return x + h


class GPTFusion(nn.Module):
  """Joint self-attention over [img tokens ; lidar tokens] (+velocity)."""
  n_embd: int
  n_head: int = 4
  n_layer: int = 2
  block_exp: int = 4
  use_velocity: bool = True

  @nn.compact
  def __call__(self, img_tokens, lidar_tokens, velocity=None,
               deterministic=True):
    """img_tokens [B,Ni,C], lidar_tokens [B,Nl,C] -> same shapes fused."""
    n_img = img_tokens.shape[1]
    x = jnp.concatenate([img_tokens, lidar_tokens], axis=1)
    pos = self.param("pos_emb", nn.initializers.normal(0.02),
                     (1, x.shape[1], self.n_embd))
    x = x + pos
    if self.use_velocity and velocity is not None:
      vel = nn.Dense(self.n_embd, name="vel_emb")(velocity[:, None])
      x = x + vel[:, None, :]
    for i in range(self.n_layer):
      x = SelfAttentionBlock(self.n_embd, self.n_head, self.block_exp,
                             name=f"block{i}")(x, deterministic)
    x = nn.LayerNorm(name="ln_f")(x)
    return x[:, :n_img], x[:, n_img:]


class FusionStage(nn.Module):
  """One of the 4 TransFuser fusion exchanges (transfuser.py:222-257)."""
  n_embd: int
  img_anchors: tuple   # (h, w) pooled image grid
  lidar_anchors: tuple
  n_head: int = 4
  n_layer: int = 2

  @nn.compact
  def __call__(self, img_feat, lidar_feat, velocity=None, deterministic=True):
    """img_feat [B,Hi,Wi,Ci], lidar_feat [B,Hl,Wl,Cl]; returns fused maps of
    the same shapes (residual add)."""
    B, Hi, Wi, Ci = img_feat.shape
    _, Hl, Wl, Cl = lidar_feat.shape
    ih, iw = self.img_anchors
    lh, lw = self.lidar_anchors

    def pool_to(x, oh, ow):
      # adaptive average pool via reshape-mean (sizes divide evenly here)
      B_, H, W, C = x.shape
      return x.reshape(B_, oh, H // oh, ow, W // ow, C).mean((2, 4))

    img_t = nn.Dense(self.n_embd, name="img_proj")(
        pool_to(img_feat, ih, iw).reshape(B, ih * iw, -1))
    lid_t = nn.Dense(self.n_embd, name="lidar_proj")(
        pool_to(lidar_feat, lh, lw).reshape(B, lh * lw, -1))
    img_t, lid_t = GPTFusion(self.n_embd, self.n_head, self.n_layer,
                             name="gpt")(img_t, lid_t, velocity,
                                         deterministic)
    img_up = nn.Dense(Ci, name="img_out")(img_t).reshape(B, ih, iw, Ci)
    lid_up = nn.Dense(Cl, name="lidar_out")(lid_t).reshape(B, lh, lw, Cl)
    img_up = jax.image.resize(img_up, (B, Hi, Wi, Ci), method="bilinear")
    lid_up = jax.image.resize(lid_up, (B, Hl, Wl, Cl), method="bilinear")
    return img_feat + img_up, lidar_feat + lid_up
