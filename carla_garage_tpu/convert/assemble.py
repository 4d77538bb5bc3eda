"""Full-model checkpoint assembly: one reference `model_*.pth` state_dict
-> one complete flax param tree for models.transfuser.LidarCenterNet.

This is the drop-in path the submodule converters in torch_import.py feed:
the reference loads pretrained TransFuser++ ensembles by globbing
`model_*.pth` files next to a `config.pickle` and merging that config over
defaults (sensor_agent.py:64-71, :114-131). `load_ensemble_directory` does
the same here, emitting (TransfuserConfig, [flax params...]) ready for
make_transfuser_policy.

Key layouts handled beyond torch_import.py's primitives:
  * timm RegNetY (features_only=True keeps the original module names):
      stem.conv / stem.bn
      s{1..4}.b{1..N}.conv1.{conv,bn} / conv2.{conv,bn} / se.{fc1,fc2}
                     .conv3.{conv,bn} / downsample.{conv,bn}
    -> models.backbones.RegNetY param names (stem/stage{i}/b{j}/conv{k}/
       norm{k}/se/down_*), with every BatchNorm FOLDED to an AffineNorm
       (scale, bias) pair — the assembled model must be built with
       norm="bn_affine" (backbones.py docstring).
  * TransfuserBackbone wiring (transfuser.py:23-137): transformers.{i} GPT
    + lidar_channel_to_img.{i} / img_channel_to_lidar.{i} 1x1 convs
    -> fusion{i}.gpt / .lidar_to_img / .img_to_lidar; c5_conv/up_conv5/
    up_conv4 keep their names.
  * LidarCenterNet heads (model.py:24-277): join (nn.TransformerDecoder)
    + checkpoint_query, checkpoint_decoder (InterFuser GRU),
    target_speed_network, extra_sensor_encoder + extra_sensor_pos_embed +
    velocity_normalization, semantic/depth/bev_semantic decoders, and the
    CenterNet head.

The timm stem/stage key layout is exercised against a synthesized
timm-layout torch module in tests/test_assemble.py (timm itself and real
.pth files are not available in this container; the layout follows timm's
RegNet implementation, which `backbone.image_encoder.*` keys embed
verbatim because features_only wraps without renaming).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import pickle

import numpy as np

from carla_garage_tpu.convert import torch_import as ti
from carla_garage_tpu.models.transfuser import TransfuserConfig


def sub_dict(sd, prefix):
  """Restrict a state_dict view to keys under `prefix.`."""
  p = prefix + "."
  return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def infer_regnety_depths(sd, prefix):
  """Per-stage block counts read off the state_dict keys themselves —
  robust against a config.pickle whose arch string disagrees with the
  weights actually stored."""
  depths = []
  for si in range(4):
    bi = 0
    while f"{prefix}.s{si + 1}.b{bi + 1}.conv1.conv.weight" in sd:
      bi += 1
    depths.append(bi)
  return tuple(depths)


def convert_regnety(sd, prefix, depths=None):
  """timm RegNetY state_dict branch -> RegNetY(norm='bn_affine') params.

  Returns {"stem": ..., "stage{i}": {"b{j}": ...}} (caller renames to the
  backbone's image_/lidar_ prefixes). BN running stats are folded
  (torch_import.batchnorm_scale_bias)."""
  if depths is None:
    depths = infer_regnety_depths(sd, prefix)
  out = {"stem": {"conv": ti.conv2d(sd, f"{prefix}.stem.conv"),
                  "norm": ti.batchnorm_scale_bias(sd, f"{prefix}.stem.bn")}}
  for si, depth in enumerate(depths):
    stage = {}
    for bi in range(depth):
      bp = f"{prefix}.s{si + 1}.b{bi + 1}"
      blk = {
          "conv1": ti.conv2d(sd, f"{bp}.conv1.conv"),
          "norm1": ti.batchnorm_scale_bias(sd, f"{bp}.conv1.bn"),
          "conv2": ti.conv2d(sd, f"{bp}.conv2.conv"),
          "norm2": ti.batchnorm_scale_bias(sd, f"{bp}.conv2.bn"),
          "se": {"fc1": ti.conv2d(sd, f"{bp}.se.fc1"),
                 "fc2": ti.conv2d(sd, f"{bp}.se.fc2")},
          "conv3": ti.conv2d(sd, f"{bp}.conv3.conv"),
          "norm3": ti.batchnorm_scale_bias(sd, f"{bp}.conv3.bn"),
      }
      if f"{bp}.downsample.conv.weight" in sd:
        blk["down_conv"] = ti.conv2d(sd, f"{bp}.downsample.conv")
        blk["down_norm"] = ti.batchnorm_scale_bias(sd, f"{bp}.downsample.bn")
      stage[f"b{bi}"] = blk
    out[f"stage{si}"] = stage
  return out


def convert_transfuser_backbone(sd, cfg: TransfuserConfig,
                                prefix: str = "backbone",
                                n_fusion_stages: int = 4):
  """reference transfuser.TransfuserBackbone -> TransfuserBackbone params
  (transfuser.py:23-137 module wiring)."""
  out = {}
  img = convert_regnety(sd, f"{prefix}.image_encoder")
  lid = convert_regnety(sd, f"{prefix}.lidar_encoder")
  out["image_stem"] = img.pop("stem")
  out["lidar_stem"] = lid.pop("stem")
  for i in range(4):
    out[f"image_stage{i}"] = img[f"stage{i}"]
    out[f"lidar_stage{i}"] = lid[f"stage{i}"]
  for i in range(n_fusion_stages):
    out[f"fusion{i}"] = {
        "lidar_to_img": ti.conv2d(sd, f"{prefix}.lidar_channel_to_img.{i}"),
        "img_to_lidar": ti.conv2d(sd, f"{prefix}.img_channel_to_lidar.{i}"),
        "gpt": ti.convert_gpt(sd, f"{prefix}.transformers.{i}",
                              cfg.n_fusion_layers, cfg.n_head),
    }
  out["c5_conv"] = ti.conv2d(sd, f"{prefix}.c5_conv")
  out["up_conv5"] = ti.conv2d(sd, f"{prefix}.up_conv5")
  out["up_conv4"] = ti.conv2d(sd, f"{prefix}.up_conv4")
  return out


def convert_lidar_centernet(sd, cfg: TransfuserConfig):
  """One reference LidarCenterNet state_dict (model.py:24-277,
  transformer_decoder_join configuration) -> {"params": ...} for
  LidarCenterNet(cfg, norm="bn_affine").apply.

  Keys are torch module names; every BatchNorm is folded. When
  cfg.use_wp_gru, the reference routes wp_query through the SAME shared
  decoder weights (model.py:151-175) — mirrored here by copying the join
  weights into our separate join_wp module with wp_query as its queries."""
  p = {"backbone": convert_transfuser_backbone(sd, cfg)}
  p["change_channel"] = ti.conv2d(sd, "change_channel")
  p["extra_fc1"] = ti.linear(sd, "extra_sensor_encoder.0")
  p["extra_fc2"] = ti.linear(sd, "extra_sensor_encoder.2")
  p["extra_sensor_pos_embed"] = ti.t2n(sd["extra_sensor_pos_embed"])
  p["velocity_norm"] = ti.batchnorm_scale_bias(sd, "velocity_normalization")
  join = ti.convert_transformer_decoder(
      sd, "join", cfg.n_decoder_layers, cfg.n_decoder_heads,
      queries_key="checkpoint_query")
  p["join"] = join
  p["checkpoint_decoder"] = ti.convert_gru_interfuser(
      sd, "checkpoint_decoder", target_point_size=2)
  p["target_speed_fc1"] = ti.linear(sd, "target_speed_network.0")
  p["target_speed_head"] = ti.linear(sd, "target_speed_network.2")
  if cfg.use_wp_gru and "wp_query" in sd:
    p["join_wp"] = dict(join, queries=ti.t2n(sd["wp_query"]))
    p["wp_decoder"] = ti.convert_gru_interfuser(
        sd, "wp_decoder", target_point_size=2)
  if cfg.use_semantic and "semantic_decoder.deconv1.0.weight" in sd:
    p["semantic_decoder"] = ti.convert_perspective_decoder(
        sd, "semantic_decoder")
  if cfg.use_depth and "depth_decoder.deconv1.0.weight" in sd:
    p["depth_decoder"] = ti.convert_perspective_decoder(sd, "depth_decoder")
  if cfg.use_bev_semantic and "bev_semantic_decoder.0.weight" in sd:
    p["bev_semantic_conv"] = ti.conv2d(sd, "bev_semantic_decoder.0")
    p["bev_semantic_head"] = ti.conv2d(sd, "bev_semantic_decoder.2")
  if cfg.detect_boxes:
    p["centernet"] = ti.convert_centernet_head(sd, "head")
  return {"params": p}


# Reference GlobalConfig attr -> TransfuserConfig field (config.py lines
# cited in each mapping; only model-relevant fields).
def transfuser_config_from_reference(ref_cfg_attrs: dict) -> TransfuserConfig:
  """Build a TransfuserConfig from a reference config.pickle's attribute
  dict, merged over our defaults (sensor_agent.py:64-71 merge semantics:
  the pickle's values override)."""
  g = ref_cfg_attrs.get
  kw = {}
  kw["image_arch"] = g("image_architecture", "regnety_032")
  kw["lidar_arch"] = g("lidar_architecture", "regnety_032")
  kw["img_h"] = g("camera_height", 256)
  kw["img_w"] = g("camera_width", 1024)
  kw["lidar_h"] = g("lidar_resolution_height", 256)
  kw["lidar_w"] = g("lidar_resolution_width", 256)
  # transfuser.py:47: in_chans = 1 + use_ground_plane
  kw["lidar_channels"] = 1 + int(g("use_ground_plane", False))
  kw["n_head"] = g("n_head", 4)
  kw["n_fusion_layers"] = g("n_layer", 2)
  kw["img_anchors"] = (g("img_vert_anchors", kw["img_h"] // 32),
                       g("img_horz_anchors", kw["img_w"] // 32))
  kw["lidar_anchors"] = (g("lidar_vert_anchors", kw["lidar_h"] // 32),
                         g("lidar_horz_anchors", kw["lidar_w"] // 32))
  kw["bev_features_channels"] = g("bev_features_chanels", 64)  # sic (ref typo)
  kw["d_model"] = g("gru_input_size", 256)
  kw["n_decoder_heads"] = g("num_decoder_heads", 8)
  kw["n_decoder_layers"] = g("num_transformer_decoder_layers", 6)
  kw["pred_len"] = g("pred_len", 8)
  kw["checkpoint_len"] = g("predict_checkpoint_len", 10)
  kw["gru_hidden"] = g("gru_hidden_size", 64)
  kw["num_semantic"] = len(g("semantic_weights", [0] * 7))
  kw["num_bev_semantic"] = len(g("bev_semantic_weights", [0] * 11))
  kw["num_bb_classes"] = g("num_bb_classes", 4)
  kw["num_dir_bins"] = g("num_dir_bins", 12)
  kw["target_speed_bins"] = len(g("target_speeds", [0] * 4))
  kw["use_wp_gru"] = bool(g("use_wp_gru", False))
  kw["use_controller_input_prediction"] = bool(
      g("use_controller_input_prediction", True))
  kw["use_velocity"] = bool(g("use_velocity", True))
  kw["use_semantic"] = bool(g("use_semantic", True))
  kw["use_depth"] = bool(g("use_depth", True))
  kw["use_bev_semantic"] = bool(g("use_bev_semantic", True))
  kw["detect_boxes"] = bool(g("detect_boxes", True))
  # velocity/brake detection branches exist only for temporal configs
  # (center_net.py:67-72)
  kw["bb_velocity_brake"] = not (g("lidar_seq_len", 1) == 1 and
                                 g("seq_len", 1) == 1)
  kw["normalize_imagenet"] = bool(g("normalize_imagenet", True))
  return TransfuserConfig(**kw)


def load_ensemble_directory(path: str):
  """Reference pretrained-model directory -> (TransfuserConfig, [params]).

  Mirrors sensor_agent.py:64-71 + :114-131: read `config.pickle`, merge its
  attributes over defaults, then convert every `model_*.pth` state_dict in
  sorted order. The returned list drops straight into
  make_transfuser_policy(params=[...]) for averaged-ensemble inference.
  Needs torch for deserialization."""
  import torch
  cfg_path = os.path.join(path, "config.pickle")
  attrs = {}
  if os.path.exists(cfg_path):
    with open(cfg_path, "rb") as f:
      loaded = pickle.load(f)
    attrs = loaded if isinstance(loaded, dict) else vars(loaded)
  tcfg = transfuser_config_from_reference(attrs)
  params = []
  for f in sorted(glob.glob(os.path.join(path, "model_*.pth"))):
    sd = torch.load(f, map_location="cpu", weights_only=True)
    params.append(convert_lidar_centernet(sd, tcfg))
  if not params:
    raise FileNotFoundError(f"no model_*.pth under {path}")
  return tcfg, params
