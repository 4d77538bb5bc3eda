"""Exact flax mirror of HuggingFace BertModel's inputs_embeds path.

The reference PlanT encodes object tokens with HF `prajjwal1/bert-medium`
(plant.py:47-49 AutoModel.from_config; config.py plant_hf_checkpoint).
Feeding `inputs_embeds` through torch BertModel applies: embeddings =
inputs_embeds + position_embeddings[:T] + token_type_embeddings[0], then
LayerNorm(eps=1e-12) + dropout, then n_layers of post-LN encoder blocks
(self-attention with separate q/k/v Linears, output dense + LN(add),
intermediate GELU dense, output dense + LN(add)). This module reproduces
that exactly so converted torch checkpoints match to float tolerance
(tests/test_torch_parity.py::test_bert_encoder_parity).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

LN_EPS = 1e-12   # HF BertConfig.layer_norm_eps


class BertLayer(nn.Module):
  hidden: int
  n_heads: int
  intermediate: int

  @nn.compact
  def __call__(self, x, deterministic=True):
    h = nn.MultiHeadDotProductAttention(
        num_heads=self.n_heads, name="attn")(x, x,
                                             deterministic=deterministic)
    x = nn.LayerNorm(epsilon=LN_EPS, name="attn_ln")(x + h)
    h = nn.Dense(self.intermediate, name="intermediate")(x)
    h = nn.gelu(h, approximate=False)
    h = nn.Dense(self.hidden, name="output")(h)
    return nn.LayerNorm(epsilon=LN_EPS, name="output_ln")(x + h)


class BertEncoder(nn.Module):
  """BertModel(inputs_embeds=...).last_hidden_state (no pooler)."""
  hidden: int = 512          # bert-medium
  n_layers: int = 8
  n_heads: int = 8
  intermediate: int = 2048
  max_positions: int = 512

  @nn.compact
  def __call__(self, inputs_embeds, deterministic=True):
    T = inputs_embeds.shape[1]
    pos = self.param("position_embeddings",
                     nn.initializers.normal(0.02),
                     (self.max_positions, self.hidden))
    ttype = self.param("token_type_embeddings",
                       nn.initializers.normal(0.02), (2, self.hidden))
    x = inputs_embeds + pos[None, :T] + ttype[0][None, None]
    x = nn.LayerNorm(epsilon=LN_EPS, name="emb_ln")(x)
    for i in range(self.n_layers):
      x = BertLayer(self.hidden, self.n_heads, self.intermediate,
                    name=f"layer{i}")(x, deterministic)
    return x
