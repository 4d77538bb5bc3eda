"""GPT-style sensor-fusion transformer (TransFuser core).

The reference fuses image and LiDAR features 4x through a small GPT per
encoder stage: average-pool both maps to anchor grids, 1x1-conv the LiDAR
channels to the image stage's width, joint self-attention at THAT width
(learned pos emb + n_layer blocks + ln_f), 1x1-conv back, bilinear upsample
and residual add (transfuser.py:139-257 forward; GPT :260-340; stage wiring
:65-100 lidar_channel_to_img / img_channel_to_lidar). Mirrored exactly here
(NHWC, 1x1 convs ARE the channel-match matmuls) so torch checkpoints map
1:1 through convert/torch_import.py.

Attention runs on the MXU via flax MultiHeadDotProductAttention; dropout is
supported but defaults off (deterministic inference inside the env step).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SelfAttentionBlock(nn.Module):
  """transfuser.Block: x + attn(ln1(x)); x + mlp(ln2(x)); ReLU MLP."""
  n_embd: int
  n_head: int
  block_exp: int = 4
  pdrop: float = 0.0

  @nn.compact
  def __call__(self, x, deterministic=True):
    h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
    h = nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, qkv_features=self.n_embd,
        dropout_rate=self.pdrop, name="attn")(
        h, h, deterministic=deterministic)
    x = x + h
    h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
    h = nn.Dense(self.block_exp * self.n_embd, name="mlp_fc")(h)
    h = nn.relu(h)
    h = nn.Dense(self.n_embd, name="mlp_proj")(h)
    h = nn.Dropout(self.pdrop, deterministic=deterministic)(h)
    return x + h


class GPTFusion(nn.Module):
  """Joint self-attention over [img tokens ; lidar tokens]
  (transfuser.GPT:260-340: pos_emb + blocks + ln_f, width = stage width)."""
  n_embd: int
  n_head: int = 4
  n_layer: int = 2
  block_exp: int = 4
  use_velocity: bool = False   # TF++'s GPT takes no velocity input

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
    x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
    return x[:, :n_img], x[:, n_img:]


class FusionStage(nn.Module):
  """One of the 4 TransFuser fusion exchanges (transfuser.py:139-257):
  pool -> lidar_to_img 1x1 -> GPT at the image stage width ->
  img_to_lidar 1x1 -> bilinear upsample -> residual add."""
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

    img_t = pool_to(img_feat, ih, iw)                    # [B,ih,iw,Ci]
    lid_t = pool_to(lidar_feat, lh, lw)
    lid_t = nn.Conv(Ci, (1, 1), name="lidar_to_img")(lid_t)
    img_tok, lid_tok = GPTFusion(Ci, self.n_head, self.n_layer,
                                 name="gpt")(
        img_t.reshape(B, ih * iw, Ci), lid_t.reshape(B, lh * lw, Ci),
        velocity, deterministic)
    img_up = img_tok.reshape(B, ih, iw, Ci)
    lid_up = nn.Conv(Cl, (1, 1), name="img_to_lidar")(
        lid_tok.reshape(B, lh, lw, Ci))
    img_up = jax.image.resize(img_up, (B, Hi, Wi, Ci), method="bilinear")
    lid_up = jax.image.resize(lid_up, (B, Hl, Wl, Cl), method="bilinear")
    return img_feat + img_up, lidar_feat + lid_up
