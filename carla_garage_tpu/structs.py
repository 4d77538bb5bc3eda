"""Core world-state PyTrees.

The reference keeps world state inside the CARLA C++ server and mirrors it in
Python object caches (``CarlaDataProvider``, carla_data_provider.py:33-802).
Here the world state IS the program state: a fixed-shape struct-of-arrays
PyTree, batch-first (leading axis = parallel episodes), with validity masks
instead of actor churn. Everything is jit/vmap/shard-friendly.

Shapes use these axis names:
  B — batch of parallel episodes (shardable across chips)
  V — vehicle slots (config.sim.max_vehicles), W — walker slots,
  L — traffic-light slots, S — stop-sign slots, R — dense route points,
  K — scenario trigger slots, n — PID window.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


class Cmd:
  """Navigation commands (CARLA RoadOption values, route_manipulation.py)."""
  VOID = -1
  LEFT = 1
  RIGHT = 2
  STRAIGHT = 3
  LANE_FOLLOW = 4
  CHANGE_LANE_LEFT = 5
  CHANGE_LANE_RIGHT = 6


class LightState:
  GREEN = 0
  YELLOW = 1
  RED = 2
  OFF = 3


@struct.dataclass
class EgoState:
  """Ego kinematic state. pos [B,2] m, yaw [B] rad, speed [B] m/s (forward)."""
  pos: jnp.ndarray
  yaw: jnp.ndarray
  speed: jnp.ndarray


@struct.dataclass
class VehicleStates:
  """Background traffic. All [B,V...]; invalid slots are masked."""
  pos: jnp.ndarray          # [B,V,2]
  yaw: jnp.ndarray          # [B,V]
  speed: jnp.ndarray        # [B,V]
  extent: jnp.ndarray       # [B,V,2] half length/width
  valid: jnp.ndarray        # [B,V] bool
  control: jnp.ndarray      # [B,V,3] steer/throttle/brake currently applied
  # Ring buffers for stuck detection (autopilot.py:556-679), [B,V,SB]
  buf_vel: jnp.ndarray
  buf_throttle: jnp.ndarray
  buf_brake: jnp.ndarray
  # Per-NPC route-following: index into its lane polyline
  lane_id: jnp.ndarray      # [B,V] int32 — which lane polyline this NPC follows
  lane_t: jnp.ndarray       # [B,V] arc-position along the polyline (m)
  stand_ticks: jnp.ndarray  # [B,V] int32 consecutive standstill ticks


@struct.dataclass
class WalkerStates:
  pos: jnp.ndarray          # [B,W,2]
  yaw: jnp.ndarray          # [B,W]
  direction: jnp.ndarray    # [B,W,2] unit walk direction
  speed: jnp.ndarray        # [B,W]
  extent: jnp.ndarray       # [B,W,2]
  valid: jnp.ndarray        # [B,W] bool
  seen_frames: jnp.ndarray  # [B,W] int32 — walkers need 1 visible frame (autopilot.py:889-892)
  active: jnp.ndarray       # [B,W] bool — crossing scenario triggered
  walked_m: jnp.ndarray     # [B,W] meters walked since activation


@struct.dataclass
class WalkerSpec:
  """Static crossing-scenario parameters (DynamicObjectCrossing semantics,
  srunner object_crash_vehicle.py:33-404): the walker stands until the ego
  is within trigger_dist OR (when trigger_tta > 0) the ego's
  time-to-arrival drops below trigger_tta seconds — the reference arms
  crossings on InTimeToArrivalToVehicle (:324-326, _time_to_reach), so
  trigger range scales with ego speed. Then it crosses cross_dist meters
  along `direction`."""
  trigger_dist: jnp.ndarray  # [B,W]
  cross_dist: jnp.ndarray    # [B,W]
  walk_speed: jnp.ndarray    # [B,W]
  trigger_tta: jnp.ndarray   # [B,W] seconds; 0 = distance-only


@struct.dataclass
class TrafficLights:
  """Static light definitions + time-derived state.

  Light state is a pure function of sim time (offset + phase durations), so no
  dynamic per-light state is stored. Trigger boxes follow the reference's
  stop-line boxes built from trigger volumes (autopilot.py:944-1011,
  traffic_light.py:12-40).
  """
  pos: jnp.ndarray          # [L,2] stop-line box center (world)
  yaw: jnp.ndarray          # [L] box orientation
  extent: jnp.ndarray       # [L,2] box half-extents
  offset_s: jnp.ndarray     # [L] phase offset in seconds
  green_s: jnp.ndarray      # [L]
  yellow_s: jnp.ndarray     # [L]
  red_s: jnp.ndarray        # [L]
  valid: jnp.ndarray        # [L] bool

  def state_at(self, t: jnp.ndarray) -> jnp.ndarray:
    """Light state at sim time t [.. broadcastable] -> [..,L] int32."""
    cycle = self.green_s + self.yellow_s + self.red_s
    cycle = jnp.where(cycle > 0, cycle, 1.0)
    phase = jnp.mod(t[..., None] + self.offset_s, cycle)
    s = jnp.where(phase < self.green_s, LightState.GREEN,
                  jnp.where(phase < self.green_s + self.yellow_s,
                            LightState.YELLOW, LightState.RED))
    return jnp.where(self.valid, s, LightState.OFF).astype(jnp.int32)


@struct.dataclass
class StopSigns:
  pos: jnp.ndarray          # [S,2] trigger-volume center
  yaw: jnp.ndarray          # [S]
  extent: jnp.ndarray       # [S,2]
  valid: jnp.ndarray        # [S] bool


@struct.dataclass
class Route:
  """Dense (1 m) and sparse (command) route arrays, padded to fixed length.

  Mirrors the outputs of the reference's interpolate_trajectory +
  set_global_plan downsampling (route_manipulation.py:86-158,
  autonomous_agent.py:120-126) — but compiled offline on host.
  """
  points: jnp.ndarray       # [R,2] dense 1 m-spaced centerline
  cmd: jnp.ndarray          # [R] int32 navigation command
  is_junction: jnp.ndarray  # [R] bool
  seg_len: jnp.ndarray      # [R] distance from point i-1 to i (seg_len[0]=0)
  num_valid: jnp.ndarray    # [] int32
  # Sparse command route (~1/50 downsample of dense)
  sparse_points: jnp.ndarray  # [Rs,2]
  sparse_cmd: jnp.ndarray     # [Rs]
  sparse_num_valid: jnp.ndarray  # [] int32

  @property
  def length_m(self) -> jnp.ndarray:
    return jnp.sum(self.seg_len * (jnp.arange(self.seg_len.shape[-1])
                                   < self.num_valid))


@struct.dataclass
class PIDState:
  """Error ring window matching nav_planner.PIDController:15-45 semantics:
  a length-n window pre-filled with zeros; integral = mean(window),
  derivative = window[-1] - window[-2]."""
  window: jnp.ndarray       # [...,n]

  @classmethod
  def create(cls, batch_shape, n):
    return cls(window=jnp.zeros(batch_shape + (n,), jnp.float32))


@struct.dataclass
class PlannerState:
  """Windowed route-pointer planner state (nav_planner.RoutePlanner:48-136).

  Instead of popping a deque we advance an index into the fixed route array."""
  idx: jnp.ndarray          # [B] int32 — first un-popped route point
  is_last: jnp.ndarray      # [B] bool


@struct.dataclass
class ExpertState:
  """Carry state of the privileged expert (autopilot.py:36-153)."""
  planner_dense: PlannerState
  planner_sparse: PlannerState
  pid_turn: PIDState        # [B,n]
  pid_speed: PIDState       # [B,n]
  steer: jnp.ndarray        # [B] previous applied steer
  target_speed: jnp.ndarray  # [B] previous target speed
  junction: jnp.ndarray     # [B] bool
  cleared_stop_signs: jnp.ndarray  # [B,S] bool
  # hazard flags of the last tick (for labels / debugging)
  vehicle_hazard: jnp.ndarray      # [B] bool
  walker_hazard: jnp.ndarray       # [B] bool
  light_hazard: jnp.ndarray        # [B] bool
  stop_sign_hazard: jnp.ndarray    # [B] bool
  walker_close: jnp.ndarray        # [B] bool
  stop_sign_close: jnp.ndarray     # [B] bool


@struct.dataclass
class CriteriaState:
  """Per-episode infraction accumulators (atomic_criteria_local.py →
  statistics_manager_local.py:123-208)."""
  penalty: jnp.ndarray            # [B] running product of infraction penalties
  n_collision_vehicle: jnp.ndarray   # [B] int32
  n_collision_walker: jnp.ndarray    # [B] int32
  n_collision_static: jnp.ndarray    # [B] int32
  n_red_light: jnp.ndarray           # [B] int32
  n_stop_sign: jnp.ndarray           # [B] int32
  route_completion: jnp.ndarray      # [B] fraction [0,1]
  max_route_idx: jnp.ndarray         # [B] int32 farthest passed dense point
  outside_lane_m: jnp.ndarray        # [B] meters driven outside lanes
  driven_m: jnp.ndarray              # [B] meters driven
  blocked_ticks: jnp.ndarray         # [B] int32 consecutive slow ticks
  deviated: jnp.ndarray              # [B] bool (route deviation > 30 m)
  blocked: jnp.ndarray               # [B] bool
  timed_out: jnp.ndarray             # [B] bool
  # per-actor collision cooldowns (ticks): a collision is counted on overlap
  # onset when the actor's cooldown is 0; the cooldown is refreshed while
  # contact persists and decays for collision_dedup_seconds after contact
  # ends, so brief re-contact with the same actor is NOT double-counted but
  # a genuine new collision after the window is (atomic_criteria_local.py
  # :300-437 per-actor temporal dedup)
  veh_overlap: jnp.ndarray           # [B,V] int32 cooldown ticks
  wlk_overlap: jnp.ndarray           # [B,W] int32 cooldown ticks
  static_overlap: jnp.ndarray        # [B] int32 cooldown ticks
  red_light_cooldown: jnp.ndarray    # [B] per-light latched mask, [B,L] bool
  stop_pending: jnp.ndarray          # [B,S] bool — sign targeted (20 m lane lookahead)
  stop_done: jnp.ndarray             # [B,S] bool — stop satisfied / scored
  stop_entered: jnp.ndarray          # [B,S] bool — ego center was inside the box
  # Infraction event log (TrafficEvent analog, statistics_manager:33-57):
  # position + kind + tick of each scored infraction, for the result
  # parser's per-town infraction maps and replay clips
  event_pos: jnp.ndarray             # [B,E,2]
  event_kind: jnp.ndarray            # [B,E] int32 (EventKind)
  event_tick: jnp.ndarray            # [B,E] int32
  event_count: jnp.ndarray           # [B] int32


class EventKind:
  """Infraction event codes in CriteriaState.event_kind."""
  NONE = 0
  COLLISION_VEHICLE = 1
  COLLISION_WALKER = 2
  COLLISION_STATIC = 3
  RED_LIGHT = 4
  STOP_SIGN = 5


@struct.dataclass
class SimState:
  """Full per-tick simulation state for a batch of episodes.

  `expert` is the privileged expert's carry; `agent` is an arbitrary pytree
  carried for a learned policy (UKF, PID windows, buffers, params refs) —
  empty tuple when the expert drives."""
  tick: jnp.ndarray         # [B] int32
  done: jnp.ndarray         # [B] bool
  ego: EgoState
  vehicles: VehicleStates
  walkers: WalkerStates
  expert: ExpertState
  criteria: CriteriaState
  rng: jnp.ndarray          # [B,2] uint32 per-episode PRNG key
  agent: Any = ()
  scenario: Any = ()        # ScenarioState when scenarios are attached

  @property
  def time_s(self) -> jnp.ndarray:
    return self.tick.astype(jnp.float32) / 20.0


@struct.dataclass
class Scene:
  """Read-only per-episode scene definition (batched over B).

  The analog of RouteScenario construction (route_scenario_local.py:173-594):
  the compiled route, the static light/stop layout of the town, scenario
  trigger definitions and NPC spawn slots.
  """
  town_id: jnp.ndarray      # [B] int32 index into the map stack
  route: Route              # [B,...] batched route arrays
  lights: TrafficLights     # [B,L...] (per-episode copy of town lights)
  stops: StopSigns          # [B,S...]
  walkers_spec: WalkerSpec  # [B,W...]
  timeout_ticks: jnp.ndarray  # [B] int32 per-route budget (0.8 s/m + 5 s)
  scenarios: Any = ()       # ScenarioSpecs when scenarios are attached
