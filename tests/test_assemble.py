"""Full-model checkpoint-assembly parity tests.

Builds the reference's ACTUAL LidarCenterNet (model.py:24-277) with a
synthesized timm-layout RegNetY standing in for `timm.create_model`
(timm is not in this container), random-initializes it, converts the whole
state_dict through convert/assemble.convert_lidar_centernet, and compares
end-to-end outputs of every head — the strongest drop-in verification
available without real .pth files. The fake timm module reproduces timm's
RegNet key layout exactly (stem.conv/bn, s{k}.b{j}.conv1..3/.se/.downsample
ConvNormAct naming), so the stem/stage key mapping is exercised verbatim.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from carla_garage_tpu.convert import assemble  # noqa: E402
from carla_garage_tpu.convert.reference_modules import \
    load_reference_module  # noqa: E402
from carla_garage_tpu.models.transfuser import (LidarCenterNet,  # noqa: E402
                                                TransfuserConfig)

TOL = 2e-4
RNG = np.random.default_rng(0)

# Small spec to keep the CPU parity run fast; key layout identical to
# regnety_032 (same module structure, fewer blocks/channels).
SPEC = dict(depths=(1, 1, 2, 1), widths=(32, 64, 128, 256),
            group_w=16, se_ratio=0.25, stem_w=16)


class ConvNormAct(nn.Module):
  """timm ConvNormAct: .conv + .bn (+ inline act) — the exact submodule
  names timm RegNet state_dicts carry."""

  def __init__(self, cin, cout, k=3, stride=1, groups=1, act=True):
    super().__init__()
    self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                          groups=groups, bias=False)
    self.bn = nn.BatchNorm2d(cout)
    self.act = nn.ReLU(inplace=True) if act else nn.Identity()

  def forward(self, x):
    return self.act(self.bn(self.conv(x)))


class SEModule(nn.Module):
  def __init__(self, channels, rd_channels):
    super().__init__()
    self.fc1 = nn.Conv2d(channels, rd_channels, 1, bias=True)
    self.fc2 = nn.Conv2d(rd_channels, channels, 1, bias=True)

  def forward(self, x):
    s = x.mean((2, 3), keepdim=True)
    return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class Bottleneck(nn.Module):
  """timm RegNetY bottleneck (bottle_ratio 1): conv1 1x1 -> conv2 3x3
  grouped stride -> se -> conv3 1x1 (no act) -> +shortcut -> act."""

  def __init__(self, cin, cout, stride, group_w, se_ratio):
    super().__init__()
    groups = max(cout // group_w, 1)
    self.conv1 = ConvNormAct(cin, cout, 1)
    self.conv2 = ConvNormAct(cout, cout, 3, stride=stride, groups=groups)
    self.se = SEModule(cout, max(int(cin * se_ratio), 8))
    self.conv3 = ConvNormAct(cout, cout, 1, act=False)
    if stride != 1 or cin != cout:
      self.downsample = ConvNormAct(cin, cout, 1, stride=stride, act=False)
    else:
      self.downsample = None
    self.act3 = nn.ReLU(inplace=True)

  def forward(self, x):
    sc = x if self.downsample is None else self.downsample(x)
    h = self.conv3(self.se(self.conv2(self.conv1(x))))
    return self.act3(h + sc)


class FakeRegNetFeatures(nn.Module):
  """timm features_only=True FeatureListNet stand-in: named children
  stem / s1..s4, .items(), .return_layers, .feature_info.info."""

  def __init__(self, in_chans=3, spec=SPEC):
    super().__init__()
    self.stem = ConvNormAct(in_chans, spec["stem_w"], 3, stride=2)
    cin = spec["stem_w"]
    for si, (d, w) in enumerate(zip(spec["depths"], spec["widths"])):
      blocks = nn.Sequential()
      for bi in range(d):
        blocks.add_module(f"b{bi + 1}", Bottleneck(
            cin, w, 2 if bi == 0 else 1, spec["group_w"], spec["se_ratio"]))
        cin = w
      self.add_module(f"s{si + 1}", blocks)
    self.return_layers = {f"s{i + 1}": i for i in range(4)}

    class _Info:
      info = ([{"num_chs": spec["stem_w"], "reduction": 2}] * 0 +
              [{"num_chs": w, "reduction": 4 * 2 ** i}
               for i, w in enumerate(spec["widths"])])

    self.feature_info = _Info()

  def items(self):
    return [(n, m) for n, m in self.named_children()]


@pytest.fixture(scope="module")
def ref_model_and_cfg():
  """Reference LidarCenterNet with the fake timm encoder, in eval mode."""
  import sys
  import types

  # timm stub whose create_model returns the synthesized RegNetY
  timm_stub = types.ModuleType("timm")
  timm_stub.__path__ = []
  timm_stub.create_model = lambda name, pretrained=False, in_chans=3, \
      features_only=True: FakeRegNetFeatures(in_chans)
  # reference config.py touches carla.WeatherParameters at class scope
  carla_stub = types.ModuleType("carla")
  carla_stub.__path__ = []
  wp = types.SimpleNamespace(**{n: None for n in (
      "ClearNoon", "CloudySunset", "WetSunset", "MidRainSunset",
      "WetCloudySunset", "HardRainNoon", "SoftRainSunset")})
  carla_stub.WeatherParameters = wp
  sys.modules["timm"] = timm_stub
  sys.modules["carla"] = carla_stub
  # data.py (imported by model.py) uses the numpy<2 alias np.string_
  np.string_ = np.bytes_
  try:
    ref_cfg_mod = load_reference_module("config")
    ref_model_mod = load_reference_module("model")
  finally:
    sys.modules.pop("timm", None)
    sys.modules.pop("carla", None)

  cfg = ref_cfg_mod.GlobalConfig()
  # shrink inputs so CPU parity stays fast; keep every module enabled
  cfg.camera_height, cfg.camera_width = 64, 128
  cfg.lidar_resolution_height = cfg.lidar_resolution_width = 64
  cfg.pixels_per_meter = 1.0     # keep the valid-pixel grid at 64x64 too
  cfg.img_vert_anchors, cfg.img_horz_anchors = 2, 4
  cfg.lidar_vert_anchors = cfg.lidar_horz_anchors = 2
  cfg.use_wp_gru = False
  cfg.use_plant = False
  torch.manual_seed(0)
  model = ref_model_mod.LidarCenterNet(cfg).eval()
  del np.string_
  return model, cfg


def _our_config(cfg) -> TransfuserConfig:
  attrs = {k: v for k, v in vars(cfg).items()
           if not k.startswith("_")}
  tcfg = assemble.transfuser_config_from_reference(attrs)
  return dataclasses.replace(tcfg, image_arch="regnety_micro",
                             lidar_arch="regnety_micro")


def test_full_model_assembly_parity(ref_model_and_cfg):
  model, cfg = ref_model_and_cfg
  tcfg = _our_config(cfg)
  sd = model.state_dict()
  params = assemble.convert_lidar_centernet(sd, tcfg)

  B = 2
  rgb = RNG.uniform(0, 1, (B, 3, cfg.camera_height,
                           cfg.camera_width)).astype(np.float32)
  lidar = RNG.uniform(0, 1, (B, 1, cfg.lidar_resolution_height,
                             cfg.lidar_resolution_width)).astype(np.float32)
  tp = RNG.normal(size=(B, 2)).astype(np.float32)
  vel = np.abs(RNG.normal(size=(B, 1))).astype(np.float32)
  cmd = np.zeros((B, 6), np.float32)
  cmd[:, 2] = 1.0

  with torch.no_grad():
    (pred_wp, pred_target_speed, pred_checkpoint, pred_semantic, pred_bev,
     pred_depth, pred_bb, _attn, _wp1, _sel) = model.forward(
        torch.tensor(rgb), torch.tensor(lidar),
        target_point=torch.tensor(tp), ego_vel=torch.tensor(vel),
        command=torch.tensor(cmd))

  ours = LidarCenterNet(tcfg, norm="bn_affine")
  out = ours.apply(params, jnp.asarray(rgb.transpose(0, 2, 3, 1)),
                   jnp.asarray(lidar.transpose(0, 2, 3, 1)),
                   jnp.asarray(tp), jnp.asarray(cmd),
                   jnp.asarray(vel[:, 0]))

  def diff(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))

  assert diff(out["pred_target_speed"], pred_target_speed) < TOL
  assert diff(out["pred_checkpoint"], pred_checkpoint) < TOL
  # NCHW->NHWC for the dense heads
  assert diff(out["pred_semantic"],
              pred_semantic.permute(0, 2, 3, 1)) < TOL
  assert diff(out["pred_depth"], pred_depth) < TOL
  # the reference zeroes BEV pixels outside the LiDAR cone
  # (model.py:385 valid_bev_pixels) — a loss/visualization mask, applied
  # here to ours for comparison
  mask = model.valid_bev_pixels.detach().numpy()[0, 0][None, ..., None]
  assert diff(np.asarray(out["pred_bev_semantic"]) * mask,
              pred_bev.permute(0, 2, 3, 1)) < TOL
  bb_ours = out["pred_bb"]
  # reference head returns per-branch maps, sigmoid pre-applied on the
  # heatmap (center_net.py:61); velocity/brake absent at seq_len 1
  assert "velocity" not in bb_ours
  ref_heat = pred_bb[0]
  assert diff(jax.nn.sigmoid(bb_ours["heatmap"]),
              ref_heat.permute(0, 2, 3, 1)) < TOL
  for i, k in [(1, "wh"), (2, "offset"), (3, "yaw_class"), (4, "yaw_res")]:
    assert diff(bb_ours[k], pred_bb[i].permute(0, 2, 3, 1)) < TOL


def test_regnety_032_key_mapping_shapes():
  """The regnety_032 mapping end-to-end on a synthesized timm-layout
  state_dict: every converted leaf must land on the flax init's shape."""
  fake = FakeRegNetFeatures.__new__(FakeRegNetFeatures)
  nn.Module.__init__(fake)
  spec = dict(depths=(2, 5, 13, 1), widths=(72, 216, 576, 1512),
              group_w=24, se_ratio=0.25, stem_w=32)
  FakeRegNetFeatures.__init__(fake, in_chans=3, spec=spec)
  sd = {f"enc.{k}": v for k, v in fake.state_dict().items()}
  conv = assemble.convert_regnety(sd, "enc", spec["depths"])

  from carla_garage_tpu.models.backbones import RegNetY
  m = RegNetY(norm="bn_affine")
  ref_shapes = jax.eval_shape(
      lambda: m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3))))
  ref_tree = ref_shapes["params"]
  flat_c = jax.tree_util.tree_flatten_with_path(conv)[0]
  flat_r = {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(ref_tree)[0]}
  assert len(flat_c) == len(flat_r)
  for p, v in flat_c:
    ks = jax.tree_util.keystr(p)
    assert ks in flat_r, f"unexpected converted key {ks}"
    assert tuple(v.shape) == tuple(flat_r[ks]), \
        f"{ks}: {v.shape} vs {flat_r[ks]}"


def test_ensemble_directory_loader(tmp_path, ref_model_and_cfg):
  """load_ensemble_directory: config.pickle merge + every model_*.pth
  converted (sensor_agent.py:64-71, :114-131)."""
  import pickle
  model, cfg = ref_model_and_cfg
  d = tmp_path / "pretrained"
  d.mkdir()
  attrs = {k: v for k, v in vars(cfg).items()
           if isinstance(v, (int, float, bool, str, list, tuple))}
  # the pickle describes the weights actually stored (here: the fake
  # micro-layout encoder), as a real pretrained dir's pickle would
  attrs["image_architecture"] = attrs["lidar_architecture"] = "regnety_micro"
  with open(d / "config.pickle", "wb") as f:
    pickle.dump(attrs, f)
  torch.save(model.state_dict(), d / "model_0030.pth")
  torch.save(model.state_dict(), d / "model_0031.pth")
  tcfg, params = assemble.load_ensemble_directory(str(d))
  assert len(params) == 2
  assert tcfg.img_h == cfg.camera_height
  assert tcfg.lidar_channels == 1
  assert tcfg.normalize_imagenet
