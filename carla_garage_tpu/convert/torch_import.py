"""Torch -> flax checkpoint conversion (the pretrained-model drop-in path).

The reference loads pretrained TransFuser++ / PlanT ensembles from
`model_*.pth` state_dicts + config.pickle (sensor_agent.py:114-131, :64-71).
This module maps those state_dicts onto this framework's flax param trees.

Layout conventions handled here:
  torch Linear   weight [out,in]            -> Dense kernel [in,out]
  torch Conv2d   weight [out,in,kh,kw]      -> Conv kernel [kh,kw,in,out]
  grouped Conv2d weight [out,in/g,kh,kw]    -> same reorder (flax groups on
                                               the in axis identically)
  torch LayerNorm weight/bias               -> scale/bias
  torch BatchNorm (inference)               -> folded into a preceding conv
                                               OR loaded as scale/bias stats
  torch GRU/GRUCell weight_ih_l0 [3H,in]    -> flax GRUCell Dense triplets
    (gate order r,z,n; flax names ir/iz/in_ and hr/hz/hn; flax `in` dense
    has no bias — torch's b_in goes on the `hn` side? No: torch computes
    n = tanh(W_in x + b_in + r*(W_hn h + b_hn)); flax GRUCell computes
    n = tanh(Dense_in(x) + r * Dense_hn(h)) where Dense_in has bias and
    Dense_hn has bias — so b_in -> in.bias and b_hn -> hn.bias.)
  torch nn.MultiheadAttention in_proj [3C,C] -> flax MHDPA query/key/value
    kernels [C, heads, hd] (+ out kernel [heads, hd, C])

Each `convert_*` function returns a flax params dict for the matching
module in carla_garage_tpu.models.
"""

from __future__ import annotations

import numpy as np


def t2n(t):
  return np.asarray(t.detach().cpu().numpy())


def _k(prefix, name):
  return f"{prefix}.{name}" if prefix else name



def linear(sd, prefix):
  """torch nn.Linear -> flax nn.Dense params."""
  w = t2n(sd[_k(prefix, f"weight")]).T
  out = {"kernel": w}
  if _k(prefix, f"bias") in sd:
    out["bias"] = t2n(sd[_k(prefix, f"bias")])
  return out


def conv2d(sd, prefix):
  """torch nn.Conv2d -> flax nn.Conv params (NHWC)."""
  w = t2n(sd[_k(prefix, f"weight")]).transpose(2, 3, 1, 0)
  out = {"kernel": w}
  if _k(prefix, f"bias") in sd:
    out["bias"] = t2n(sd[_k(prefix, f"bias")])
  return out


def layernorm(sd, prefix):
  return {"scale": t2n(sd[_k(prefix, f"weight")]),
          "bias": t2n(sd[_k(prefix, f"bias")])}


def batchnorm_scale_bias(sd, prefix, eps=1e-5):
  """Inference-mode BatchNorm as an affine (scale, bias) pair:
  y = (x - mean) / sqrt(var + eps) * gamma + beta. Handles affine=False
  (gamma=1, beta=0 — e.g. the reference's velocity_normalization)."""
  mean = t2n(sd[_k(prefix, "running_mean")])
  var = t2n(sd[_k(prefix, "running_var")])
  gamma = t2n(sd[_k(prefix, "weight")]) if _k(prefix, "weight") in sd \
      else np.ones_like(mean)
  beta = t2n(sd[_k(prefix, "bias")]) if _k(prefix, "bias") in sd \
      else np.zeros_like(mean)
  scale = gamma / np.sqrt(var + eps)
  return {"scale": scale, "bias": beta - mean * scale}


def gru_cell(sd, prefix, suffix=""):
  """torch GRUCell (weight_ih/weight_hh) or single-layer GRU
  (weight_ih_l0/...) -> flax nn.GRUCell params."""
  sfx = suffix
  wih = t2n(sd[_k(prefix, f"weight_ih{sfx}")])          # [3H, in]
  whh = t2n(sd[_k(prefix, f"weight_hh{sfx}")])          # [3H, H]
  bih = t2n(sd[_k(prefix, f"bias_ih{sfx}")])
  bhh = t2n(sd[_k(prefix, f"bias_hh{sfx}")])
  H = whh.shape[1]
  wir, wiz, win = wih[:H], wih[H:2 * H], wih[2 * H:]
  whr, whz, whn = whh[:H], whh[H:2 * H], whh[2 * H:]
  bir, biz, bin_ = bih[:H], bih[H:2 * H], bih[2 * H:]
  bhr, bhz, bhn = bhh[:H], bhh[H:2 * H], bhh[2 * H:]
  # flax GRUCell: ir/iz have NO bias on the h side (hr/hz carry it); the
  # r/z gates sum both torch biases; flax `in` Dense has bias, `hn` has
  # bias too -> keep them separate (needed because r multiplies hn+bias).
  return {
      "ir": {"kernel": wir.T, "bias": bir + bhr},
      "iz": {"kernel": wiz.T, "bias": biz + bhz},
      "in": {"kernel": win.T, "bias": bin_},
      "hr": {"kernel": whr.T},
      "hz": {"kernel": whz.T},
      "hn": {"kernel": whn.T, "bias": bhn},
  }


def mha_packed(sd, prefix, n_head):
  """torch nn.MultiheadAttention (packed in_proj) ->
  flax MultiHeadDotProductAttention params."""
  w = t2n(sd[_k(prefix, f"in_proj_weight")])            # [3C, C]
  b = t2n(sd[_k(prefix, f"in_proj_bias")])
  C = w.shape[1]
  hd = C // n_head
  wq, wk, wv = w[:C], w[C:2 * C], w[2 * C:]
  bq, bk, bv = b[:C], b[C:2 * C], b[2 * C:]

  def split(wx, bx):
    return {"kernel": wx.T.reshape(C, n_head, hd),
            "bias": bx.reshape(n_head, hd)}

  wo = t2n(sd[_k(prefix, f"out_proj.weight")])          # [C, C]
  bo = t2n(sd[_k(prefix, f"out_proj.bias")])
  return {
      "query": split(wq, bq),
      "key": split(wk, bk),
      "value": split(wv, bv),
      "out": {"kernel": wo.T.reshape(n_head, hd, C), "bias": bo},
  }


def mha_separate(sd, qp, kp, vp, op, n_head):
  """Separate q/k/v/out Linears (the reference GPT SelfAttention,
  transfuser.py:345-372) -> flax MHDPA params."""
  def split(prefix):
    w = t2n(sd[_k(prefix, f"weight")])                  # [C, C]
    b = t2n(sd[_k(prefix, f"bias")])
    C = w.shape[1]
    hd = C // n_head
    return {"kernel": w.T.reshape(C, n_head, hd),
            "bias": b.reshape(n_head, hd)}

  wo = t2n(sd[f"{op}.weight"])
  bo = t2n(sd[f"{op}.bias"])
  C = wo.shape[1]
  hd = C // n_head
  return {"query": split(qp), "key": split(kp), "value": split(vp),
          "out": {"kernel": wo.T.reshape(n_head, hd, C), "bias": bo}}


# ---------------------------------------------------------------------------
# Module-level converters (reference module -> carla_garage_tpu.models)
# ---------------------------------------------------------------------------

def convert_gpt_block(sd, prefix, n_head):
  """reference transfuser.Block -> fusion.SelfAttentionBlock params."""
  return {
      "ln1": layernorm(sd, _k(prefix, f"ln1")),
      "ln2": layernorm(sd, _k(prefix, f"ln2")),
      "attn": mha_separate(sd, _k(prefix, f"attn.query"), _k(prefix, f"attn.key"),
                           _k(prefix, f"attn.value"), _k(prefix, f"attn.proj"),
                           n_head),
      "mlp_fc": linear(sd, _k(prefix, f"mlp.0")),
      "mlp_proj": linear(sd, _k(prefix, f"mlp.2")),
  }


def convert_gpt(sd, prefix, n_layer, n_head):
  """reference transfuser.GPT -> fusion.GPTFusion params."""
  out = {"pos_emb": t2n(sd[_k(prefix, f"pos_emb")]),
         "ln_f": layernorm(sd, _k(prefix, f"ln_f"))}
  for i in range(n_layer):
    out[f"block{i}"] = convert_gpt_block(sd, _k(prefix, f"blocks.{i}"), n_head)
  return out


def convert_gru_interfuser(sd, prefix, target_point_size=2):
  """reference GRUWaypointsPredictorInterFuser ->
  heads.GRUWaypointsPredictorInterFuser params."""
  out = {
      "gru": gru_cell(sd, _k(prefix, "gru"), "_l0"),
      "decoder": linear(sd, _k(prefix, "decoder")),
  }
  if target_point_size > 0:
    out["encoder"] = linear(sd, _k(prefix, f"encoder"))
  return out


def convert_gru_transfuser(sd, prefix):
  """reference GRUWaypointsPredictorTransFuser ->
  heads.GRUWaypointsPredictorTransFuser params."""
  return {
      "gru": gru_cell(sd, _k(prefix, f"wp_decoder")),
      "decoder": linear(sd, _k(prefix, f"output")),
  }


def convert_centernet_head(sd, prefix=""):
  """reference center_net.LidarCenterNetHead -> heads.CenterNetHead params.

  NOTE the reference applies sigmoid to the heatmap INSIDE forward; our
  head returns logits (decode applies sigmoid), weights are identical."""
  p = (prefix + ".") if prefix else ""
  out = {}
  for ours, theirs in [("heatmap", "heatmap_head"), ("wh", "wh_head"),
                       ("offset", "offset_head"),
                       ("yaw_class", "yaw_class_head"),
                       ("yaw_res", "yaw_res_head"),
                       ("velocity", "velocity_head"),
                       ("brake", "brake_head")]:
    if f"{p}{theirs}.0.weight" not in sd:
      continue
    out[f"{ours}_conv"] = conv2d(sd, f"{p}{theirs}.0")
    out[f"{ours}_out"] = conv2d(sd, f"{p}{theirs}.2")
  return out


def convert_transformer_decoder_layer(sd, prefix, n_head):
  """torch nn.TransformerDecoderLayer (post-LN, batch_first) ->
  heads.TransformerDecoderLayer params."""
  return {
      "self_attn": mha_packed(sd, _k(prefix, f"self_attn"), n_head),
      "cross_attn": mha_packed(sd, _k(prefix, f"multihead_attn"), n_head),
      "ln1": layernorm(sd, _k(prefix, f"norm1")),
      "ln2": layernorm(sd, _k(prefix, f"norm2")),
      "ln3": layernorm(sd, _k(prefix, f"norm3")),
      "ff1": linear(sd, _k(prefix, f"linear1")),
      "ff2": linear(sd, _k(prefix, f"linear2")),
  }


def convert_transformer_decoder(sd, prefix, n_layers, n_head,
                                queries_key=None):
  """torch nn.TransformerDecoder (+ final norm) ->
  heads.TransformerDecoderJoin params. queries_key: state_dict key of the
  learned query parameter (e.g. 'checkpoint_query')."""
  out = {"ln_f": layernorm(sd, _k(prefix, f"norm"))}
  for i in range(n_layers):
    out[f"layer{i}"] = convert_transformer_decoder_layer(
        sd, _k(prefix, f"layers.{i}"), n_head)
  if queries_key is not None:
    out["queries"] = t2n(sd[queries_key])
  return out


def convert_bert_encoder(sd, prefix, n_layers, n_heads):
  """torch transformers BertModel -> models.bert.BertEncoder params.
  prefix: the BertModel's position in the state_dict (e.g. 'model' in the
  reference PlanT)."""
  out = {
      "position_embeddings": t2n(
          sd[_k(prefix, "embeddings.position_embeddings.weight")]),
      "token_type_embeddings": t2n(
          sd[_k(prefix, "embeddings.token_type_embeddings.weight")]),
      "emb_ln": layernorm(sd, _k(prefix, "embeddings.LayerNorm")),
  }
  for i in range(n_layers):
    lp = _k(prefix, f"encoder.layer.{i}")
    out[f"layer{i}"] = {
        "attn": mha_separate(sd, f"{lp}.attention.self.query",
                             f"{lp}.attention.self.key",
                             f"{lp}.attention.self.value",
                             f"{lp}.attention.output.dense", n_heads),
        "attn_ln": layernorm(sd, f"{lp}.attention.output.LayerNorm"),
        "intermediate": linear(sd, f"{lp}.intermediate.dense"),
        "output": linear(sd, f"{lp}.output.dense"),
        "output_ln": layernorm(sd, f"{lp}.output.LayerNorm"),
    }
  return out


def convert_plant(sd, n_layers=8, n_heads=8, num_types=6,
                  num_attributes=7):
  """reference plant.PlanT state_dict -> models.plant.PlanT params.

  Covers the BERT encoder, token/type embeddings, forecast heads, the
  wp GRU head, velocity branch, target-speed MLP and the checkpoint
  decoder (plant.py:26-180 module layout)."""
  out = {
      "bert": convert_bert_encoder(sd, "model", n_layers, n_heads),
      "cls_emb": t2n(sd["cls_emb"]),
      "tok_emb": linear(sd, "tok_emb"),
      "wp_head": linear(sd, "wp_head"),
      "wp_gru": gru_cell(sd, "wp_decoder"),
      "wp_output": linear(sd, "wp_output"),
      "target_speed_fc1": linear(sd, "target_speed_network.0"),
      "target_speed_head": linear(sd, "target_speed_network.2"),
      "checkpoint_decoder": convert_gru_interfuser(
          sd, "checkpoint_decoder", target_point_size=0),
  }
  for i in range(num_types):
    out[f"obj_token{i}"] = t2n(sd[f"obj_token.{i}"])
    out[f"obj_emb{i}"] = linear(sd, f"obj_emb.{i}")
  for i in range(num_attributes):
    out[f"forecast_head{i}"] = linear(sd, f"heads.{i}")
  if "velocity_encoder.0.weight" in sd:
    out["vel_fc1"] = linear(sd, "velocity_encoder.0")
    out["vel_fc2"] = linear(sd, "velocity_encoder.2")
    out["velocity_norm"] = batchnorm_scale_bias(sd, "velocity_normalization")
  return out


def convert_perspective_decoder(sd, prefix):
  """reference transfuser_utils.PerspectiveDecoder ->
  heads.PerspectiveDecoder params (deconv1/2/3 Sequential conv pairs)."""
  return {
      "deconv1_0": conv2d(sd, _k(prefix, f"deconv1.0")),
      "deconv1_1": conv2d(sd, _k(prefix, f"deconv1.2")),
      "deconv2_0": conv2d(sd, _k(prefix, f"deconv2.0")),
      "deconv2_1": conv2d(sd, _k(prefix, f"deconv2.2")),
      "deconv3_0": conv2d(sd, _k(prefix, f"deconv3.0")),
      "deconv3_1": conv2d(sd, _k(prefix, f"deconv3.2")),
  }
