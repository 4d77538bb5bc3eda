"""Torch -> flax checkpoint-conversion parity tests.

Each test instantiates a randomly-initialized reference torch submodule
(imported from /root/reference/team_code with stubbed deps), converts its
state_dict through convert/torch_import.py, runs both on the same fixed
input, and requires max |diff| < 1e-4 — the acceptance bar for the
pretrained-checkpoint drop-in path (sensor_agent.py:114-131 load path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from carla_garage_tpu.convert import torch_import as ti  # noqa: E402
from carla_garage_tpu.convert.reference_modules import \
    load_reference_module  # noqa: E402

TOL = 1e-4
RNG = np.random.default_rng(0)


def _diff(a, b):
  return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# ---------------------------------------------------------------------------
# GPT fusion block (transfuser.py:260-402)
# ---------------------------------------------------------------------------

def test_gpt_block_parity():
  ref_tf = load_reference_module("transfuser")
  torch.manual_seed(0)
  C, n_head = 64, 4
  block = ref_tf.Block(C, n_head, block_exp=4, attn_pdrop=0.0,
                       resid_pdrop=0.0).eval()
  x = RNG.normal(size=(2, 10, C)).astype(np.float32)
  with torch.no_grad():
    ref = block(torch.tensor(x)).numpy()

  from carla_garage_tpu.models.fusion import SelfAttentionBlock
  m = SelfAttentionBlock(n_embd=C, n_head=n_head)
  params = {"params": ti.convert_gpt_block(block.state_dict(), "", n_head)}
  # strip the leading "." from prefix-less keys
  sd = {k: v for k, v in block.state_dict().items()}
  params = {"params": {
      "ln1": ti.layernorm(sd, "ln1"),
      "ln2": ti.layernorm(sd, "ln2"),
      "attn": ti.mha_separate(sd, "attn.query", "attn.key", "attn.value",
                              "attn.proj", n_head),
      "mlp_fc": ti.linear(sd, "mlp.0"),
      "mlp_proj": ti.linear(sd, "mlp.2"),
  }}
  out = m.apply(params, jnp.asarray(x))
  assert _diff(out, ref) < TOL


def test_gpt_full_parity():
  """Full GPT: pos emb + n_layer blocks + ln_f, split back to maps."""
  ref_tf = load_reference_module("transfuser")
  torch.manual_seed(1)

  class Cfg:
    img_vert_anchors = 2
    img_horz_anchors = 4
    lidar_vert_anchors = 2
    lidar_horz_anchors = 2
    lidar_seq_len = 1
    n_head = 4
    block_exp = 4
    n_layer = 2
    embd_pdrop = 0.0
    attn_pdrop = 0.0
    resid_pdrop = 0.0
    gpt_linear_layer_init_mean = 0.0
    gpt_linear_layer_init_std = 0.02
    gpt_layer_norm_init_weight = 1.0

  C = 32
  gpt = ref_tf.GPT(C, Cfg(), lidar_video=False, lidar_time_frames=1).eval()
  # give the pos emb real values (init is zeros)
  with torch.no_grad():
    gpt.pos_emb.normal_(0, 0.02)
  img = RNG.normal(size=(2, C, 2, 4)).astype(np.float32)
  lid = RNG.normal(size=(2, C, 2, 2)).astype(np.float32)
  with torch.no_grad():
    ref_img, ref_lid = gpt(torch.tensor(img), torch.tensor(lid))
  ref_img = ref_img.numpy().transpose(0, 2, 3, 1)
  ref_lid = ref_lid.numpy().transpose(0, 2, 3, 1)

  from carla_garage_tpu.models.fusion import GPTFusion
  m = GPTFusion(n_embd=C, n_head=4, n_layer=2, use_velocity=False)
  params = {"params": ti.convert_gpt(gpt.state_dict(), "", 2, 4)}
  img_t = jnp.asarray(img.transpose(0, 2, 3, 1).reshape(2, 8, C))
  lid_t = jnp.asarray(lid.transpose(0, 2, 3, 1).reshape(2, 4, C))
  out_img, out_lid = m.apply(params, img_t, lid_t)
  assert _diff(out_img.reshape(2, 2, 4, C), ref_img) < TOL
  assert _diff(out_lid.reshape(2, 2, 2, C), ref_lid) < TOL


# ---------------------------------------------------------------------------
# GRU decoders (model.py:839-913)
# ---------------------------------------------------------------------------

def test_gru_interfuser_parity():
  ref_model = load_reference_module("model")
  torch.manual_seed(2)
  C, H, n_wp = 32, 24, 8
  gru = ref_model.GRUWaypointsPredictorInterFuser(
      input_dim=C, waypoints=n_wp, hidden_size=H, target_point_size=2).eval()
  x = RNG.normal(size=(3, n_wp, C)).astype(np.float32)
  tp = RNG.normal(size=(3, 2)).astype(np.float32)
  with torch.no_grad():
    ref = gru(torch.tensor(x), torch.tensor(tp)).numpy()

  from carla_garage_tpu.models.heads import GRUWaypointsPredictorInterFuser
  m = GRUWaypointsPredictorInterFuser(pred_len=n_wp, hidden_size=H)
  params = {"params": ti.convert_gru_interfuser(gru.state_dict(), "")}
  out = m.apply(params, jnp.asarray(x), jnp.asarray(tp))
  assert _diff(out, ref) < TOL


def test_gru_transfuser_parity():
  ref_model = load_reference_module("model")
  torch.manual_seed(3)

  class Cfg:
    learn_origin = 1
    gru_hidden_size = 24
    use_tp = True

  H, pred_len = 24, 8
  gru = ref_model.GRUWaypointsPredictorTransFuser(
      Cfg(), pred_len=pred_len, hidden_size=H, target_point_size=2).eval()
  z = RNG.normal(size=(3, H + 2)).astype(np.float32)
  tp = RNG.normal(size=(3, 2)).astype(np.float32)
  with torch.no_grad():
    ref = gru(torch.tensor(z), torch.tensor(tp)).numpy()

  from carla_garage_tpu.models.heads import GRUWaypointsPredictorTransFuser
  m = GRUWaypointsPredictorTransFuser(pred_len=pred_len, hidden_size=H,
                                      learn_origin=True)
  sd = gru.state_dict()
  params = {"params": {
      "gru": ti.gru_cell(sd, "wp_decoder"),
      "decoder": ti.linear(sd, "output"),
  }}
  out = m.apply(params, jnp.asarray(z), jnp.asarray(tp))
  assert _diff(out, ref) < TOL


# ---------------------------------------------------------------------------
# CenterNet head (center_net.py:12-75)
# ---------------------------------------------------------------------------

def test_centernet_head_parity():
  ref_cn = load_reference_module("center_net")
  torch.manual_seed(4)

  class Cfg:
    bb_input_channel = 32
    num_bb_classes = 4
    num_dir_bins = 12
    lidar_seq_len = 2          # forces velocity/brake heads to exist
    seq_len = 1
    top_k_center_keypoints = 100
    center_net_max_pooling_kernel = 3
    bb_confidence_threshold = 0.3

  head = ref_cn.LidarCenterNetHead(Cfg()).eval()
  x = RNG.normal(size=(2, 32, 16, 16)).astype(np.float32)
  with torch.no_grad():
    hm, wh, off, yc, yr, vel, brk = head(torch.tensor(x))

  from carla_garage_tpu.models.heads import CenterNetHead
  m = CenterNetHead(num_classes=4, num_dir_bins=12)
  params = {"params": ti.convert_centernet_head(head.state_dict())}
  out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
  assert _diff(jax.nn.sigmoid(out["heatmap"]),
               hm.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["wh"], wh.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["offset"], off.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["yaw_class"], yc.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["yaw_res"], yr.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["velocity"], vel.numpy().transpose(0, 2, 3, 1)) < TOL
  assert _diff(out["brake"], brk.numpy().transpose(0, 2, 3, 1)) < TOL


# ---------------------------------------------------------------------------
# Transformer decoder join (model.py:121-182; torch nn.TransformerDecoder)
# ---------------------------------------------------------------------------

def test_transformer_decoder_parity():
  torch.manual_seed(5)
  import torch.nn as tnn
  d_model, n_head, n_layers, n_q = 32, 4, 2, 5
  layer = tnn.TransformerDecoderLayer(d_model, n_head,
                                      activation=tnn.GELU(),
                                      batch_first=True)
  dec = tnn.TransformerDecoder(layer, num_layers=n_layers,
                               norm=tnn.LayerNorm(d_model)).eval()
  queries = torch.randn(1, n_q, d_model) * 0.02
  mem = RNG.normal(size=(2, 9, d_model)).astype(np.float32)
  with torch.no_grad():
    ref = dec(queries.repeat(2, 1, 1), torch.tensor(mem)).numpy()

  from carla_garage_tpu.models.heads import TransformerDecoderJoin
  m = TransformerDecoderJoin(d_model=d_model, n_head=n_head,
                             n_layers=n_layers, num_queries=n_q)
  sd = dec.state_dict()
  sd["__queries__"] = queries
  params = ti.convert_transformer_decoder(sd, "", n_layers, n_head,
                                          queries_key="__queries__")
  # prefixless: torch names are layers.N... / norm...
  out = m.apply({"params": params}, jnp.asarray(mem))
  assert _diff(out, ref) < TOL


# ---------------------------------------------------------------------------
# PerspectiveDecoder (transfuser_utils.py:668-705)
# ---------------------------------------------------------------------------

def test_perspective_decoder_parity():
  ref_tu = load_reference_module("transfuser_utils")
  torch.manual_seed(6)
  dec = ref_tu.PerspectiveDecoder(in_channels=32, out_channels=3,
                                  inter_channel_0=16, inter_channel_1=8,
                                  inter_channel_2=8, scale_factor_0=2,
                                  scale_factor_1=2).eval()
  x = RNG.normal(size=(2, 32, 4, 8)).astype(np.float32)
  with torch.no_grad():
    ref = dec(torch.tensor(x)).numpy()

  from carla_garage_tpu.models.heads import PerspectiveDecoder
  m = PerspectiveDecoder(out_channels=3, inter_channel_0=16,
                         inter_channel_1=8, inter_channel_2=8,
                         scale_factor_0=2, scale_factor_1=2)
  params = {"params": ti.convert_perspective_decoder(dec.state_dict(), "")}
  # prefixless keys
  sd = dec.state_dict()
  params = {"params": {
      "deconv1_0": ti.conv2d(sd, "deconv1.0"),
      "deconv1_1": ti.conv2d(sd, "deconv1.2"),
      "deconv2_0": ti.conv2d(sd, "deconv2.0"),
      "deconv2_1": ti.conv2d(sd, "deconv2.2"),
      "deconv3_0": ti.conv2d(sd, "deconv3.0"),
      "deconv3_1": ti.conv2d(sd, "deconv3.2"),
  }}
  out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
  assert _diff(out, ref.transpose(0, 2, 3, 1)) < TOL


# ---------------------------------------------------------------------------
# BERT encoder (HF BertModel inputs_embeds path — the PlanT backbone)
# ---------------------------------------------------------------------------

def test_bert_encoder_parity():
  from transformers import BertConfig, BertModel
  torch.manual_seed(7)
  cfg = BertConfig(hidden_size=64, num_hidden_layers=2,
                   num_attention_heads=2, intermediate_size=128,
                   max_position_embeddings=64)
  bert = BertModel(cfg).eval()
  x = RNG.normal(size=(2, 9, 64)).astype(np.float32) * 0.5
  with torch.no_grad():
    ref = bert(inputs_embeds=torch.tensor(x)).last_hidden_state.numpy()

  from carla_garage_tpu.models.bert import BertEncoder
  m = BertEncoder(hidden=64, n_layers=2, n_heads=2, intermediate=128,
                  max_positions=64)
  params = {"params": ti.convert_bert_encoder(bert.state_dict(), "", 2, 2)}
  out = m.apply(params, jnp.asarray(x))
  assert _diff(out, ref) < TOL


# ---------------------------------------------------------------------------
# Full PlanT (plant.py:26-343) — the complete drop-in conversion
# ---------------------------------------------------------------------------

def test_plant_full_parity():
  from transformers import BertConfig
  ref_plant = load_reference_module("plant")
  import types as _t
  bert_cfg = BertConfig(hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=128,
                        max_position_embeddings=64)
  ref_plant.AutoConfig = _t.SimpleNamespace(
      from_pretrained=lambda name: bert_cfg)

  class Cfg:
    plant_precision_pos = 7
    plant_precision_angle = 4
    plant_precision_speed = 5
    plant_precision_brake = 2
    plant_num_attributes = 7
    plant_object_types = 6
    plant_hf_checkpoint = "unused"
    plant_embd_pdrop = 0.0
    plant_pretraining = "dummy"     # skips input asserts
    use_velocity = True
    learn_origin = 1
    use_wp_gru = True
    use_controller_input_prediction = True
    gru_hidden_size = 24
    num_route_points = 5
    target_speeds = [0.0, 2.0, 5.0, 8.0]
    use_speed_weights = False
    target_speed_weights = [1.0, 1.0, 1.0, 1.0]
    use_label_smoothing = False
    label_smoothing_alpha = 0.0
    use_focal_loss = False
    focal_loss_gamma = 2.0
    ignore_index = -999
    pred_len = 4
    wp_dilation = 1
    turn_kp = 1.0; turn_ki = 0.0; turn_kd = 0.0; turn_n = 20
    speed_kp = 5.0; speed_ki = 0.5; speed_kd = 1.0; speed_n = 20

  torch.manual_seed(8)
  net = ref_plant.PlanT(Cfg()).eval()
  # the wp_head expects 64-dim z: reference hardcodes trans_out_features
  # 512(+128); with a 64-hidden test BERT the Linear dims come from the
  # constructor args, so rebuild the mismatched pieces at the test dims.
  import torch.nn as tnn
  torch.manual_seed(9)
  net.wp_head = tnn.Linear(64 + 128, 66)
  net.target_speed_network = tnn.Sequential(
      tnn.Linear(64 + 128 + 3, 128), tnn.ReLU(), tnn.Linear(128, 4))
  net.checkpoint_decoder = ref_plant.GRUWaypointsPredictorInterFuser(
      input_dim=64, hidden_size=24, waypoints=5,
      target_point_size=0).eval()
  net = net.eval()
  # give BN a non-trivial running state
  with torch.no_grad():
    net.velocity_normalization.running_mean.fill_(2.0)
    net.velocity_normalization.running_var.fill_(4.0)

  B, O, R = 2, 6, 5
  boxes = RNG.normal(size=(B, O, 8)).astype(np.float32)
  boxes[..., 7] = np.array([0, 0, 1, 2, 3, 0])   # types incl. padding=car
  route = RNG.normal(size=(B, R, 2)).astype(np.float32) * 5
  light = np.ones((B, 1), np.float32)
  stop = np.zeros((B, 1), np.float32)
  junc = np.ones((B, 1), np.float32)
  vel = RNG.normal(size=(B, 1)).astype(np.float32) + 3
  with torch.no_grad():
    ref_wp, ref_ts, ref_ckpt, ref_fc = net(
        torch.tensor(boxes), torch.tensor(route), None,
        torch.tensor(light), torch.tensor(stop), torch.tensor(junc),
        torch.tensor(vel))

  from carla_garage_tpu.models.plant import PlanT, PlanTConfig
  pcfg = PlanTConfig(hidden=64, n_layers=2, n_heads=2, intermediate=128, max_positions=64,
                     max_objects=O, num_route_points=R, pred_len=4,
                     gru_hidden=24)
  m = PlanT(pcfg)
  params = {"params": ti.convert_plant(net.state_dict(), n_layers=2,
                                       n_heads=2)}
  out = m.apply(params, jnp.asarray(boxes[..., :7]),
                jnp.asarray(boxes[..., 7].astype(np.int32)),
                jnp.asarray(route), jnp.asarray(light[:, 0]),
                jnp.asarray(stop[:, 0]), jnp.asarray(junc[:, 0]),
                jnp.asarray(vel[:, 0]))
  assert _diff(out["pred_wp"], ref_wp.numpy()) < TOL
  assert _diff(out["pred_target_speed"], ref_ts.numpy()) < TOL
  assert _diff(out["pred_checkpoint"], ref_ckpt.numpy()) < TOL
  for i in range(7):
    assert _diff(out["pred_forecast"][i], ref_fc[i].numpy()) < TOL
