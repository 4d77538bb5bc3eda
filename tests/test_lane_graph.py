"""Lane-graph extraction tests: skeleton, graph topology, lane directions,
signalization synthesis, direction raster (maps/lane_graph.py)."""

import numpy as np
import pytest

from carla_garage_tpu.maps import lane_graph as lg


def _cross_road(size=200, ppm=2.0, half=4.0):
  """A plus-shaped two-street town raster at ppm px/m."""
  n = int(size * ppm)
  g = np.arange(n) / ppm
  gx, gy = np.meshgrid(g, g)
  cx = cy = size / 2
  road = (np.abs(gy - cy) <= half) | (np.abs(gx - cx) <= half)
  return road, np.zeros_like(road)


def test_skeletonize_thin_line():
  mask = np.zeros((40, 40), bool)
  mask[18:23, 5:35] = True                 # 5-px-thick horizontal bar
  sk = lg.skeletonize(mask)
  assert sk.sum() < mask.sum() / 3         # thinned
  rows = np.nonzero(sk.any(1))[0]
  assert len(rows) <= 3                    # ~1 px thick


def test_cross_graph_and_lanes():
  road, yellow = _cross_road()
  off = np.zeros(2, np.float32)
  tl = lg.build_town_lanes(road, 2.0, off)
  # one 4-way junction detected, signalized
  assert len(tl.junction_centers) == 1
  assert np.allclose(tl.junction_centers[0], [100, 100], atol=6)
  assert len(tl.light_pos) >= 4            # one light per approach
  assert len(tl.stop_pos) == 0
  # 4 corridor arms x 2 directions = 8 real lanes + connectors
  real = [p for p, c in zip(tl.lane_polys, tl.is_connector) if not c]
  assert len(real) == 8
  # every real lane drives on the right of its corridor: the offset from
  # the corridor centerline is positive along the right vector
  for poly in real:
    mid = poly[len(poly) // 2]
    d = poly[len(poly) // 2 + 1] - poly[len(poly) // 2]
    yaw = np.arctan2(d[1], d[0])
    right = np.array([-np.sin(yaw), np.cos(yaw)])
    # corridor centerline passes through x=100 or y=100
    if abs(np.cos(yaw)) > 0.7:             # horizontal travel
      assert (mid[1] - 100) * right[1] > 0.5
    else:
      assert (mid[0] - 100) * right[0] > 0.5


def test_signal_hints_override_heuristic():
  """signal_hints force ground-truth signalization: the 4-way cross is
  signalized by the heuristic, but an 'unsignalized' hint near its center
  must strip the lights (and grant minor-entry stop signs instead)."""
  road, yellow = _cross_road()
  off = np.zeros(2, np.float32)
  hint_pt = np.array([[100.0, 112.0]], np.float32)   # on an approach
  tl = lg.build_town_lanes(road, 2.0, off,
                           signal_hints={"unsignalized": hint_pt})
  assert len(tl.light_pos) == 0
  tl2 = lg.build_town_lanes(road, 2.0, off,
                            signal_hints={"signalized": hint_pt})
  assert len(tl2.light_pos) >= 4


def test_opposite_lanes_do_not_overlap():
  road, _ = _cross_road()
  tl = lg.build_town_lanes(road, 2.0, np.zeros(2, np.float32))
  real = [(p, lg._poly_yaw(p)) for p, c in
          zip(tl.lane_polys, tl.is_connector) if not c]
  # for every pair of opposite-direction lanes on the same corridor, the
  # midpoints must be laterally separated (the round-1 reverse-lane bug
  # put both directions on the SAME offset polyline)
  for i in range(len(real)):
    for j in range(i + 1, len(real)):
      pi, yi = real[i]
      pj, yj = real[j]
      mi, mj = pi[len(pi) // 2], pj[len(pj) // 2]
      ydiff = abs(np.arctan2(np.sin(yi[0] - yj[0]), np.cos(yi[0] - yj[0])))
      if ydiff > 2.8 and np.linalg.norm(mi - mj) < 20:
        assert np.linalg.norm(mi - mj) > 2.0


def test_connectors_have_successors():
  road, _ = _cross_road()
  tl = lg.build_town_lanes(road, 2.0, np.zeros(2, np.float32))
  conn_ids = np.nonzero(tl.is_connector)[0]
  assert len(conn_ids) > 0
  for ci in conn_ids:
    assert len(tl.lane_successors[ci]) == 1
  # every real incoming lane got at least one connector successor
  n_with = sum(1 for c, s in zip(tl.is_connector, tl.lane_successors)
               if not c and s)
  assert n_with >= 4


def test_direction_raster_matches_lane_yaw():
  road, _ = _cross_road()
  tl = lg.build_town_lanes(road, 2.0, np.zeros(2, np.float32))
  # sample the direction raster at lane midpoints: bin yaw must match
  for poly, conn in zip(tl.lane_polys, tl.is_connector):
    if conn or len(poly) < 6:
      continue
    mid = poly[len(poly) // 2]
    d = poly[len(poly) // 2 + 1] - poly[len(poly) // 2]
    yaw = np.arctan2(d[1], d[0])
    px = int(round(mid[0] * 2.0))
    py = int(round(mid[1] * 2.0))
    b = tl.direction_raster[py, px]
    assert b > 0
    byaw = lg.bin_to_yaw(np.array(float(b)))
    diff = abs(np.arctan2(np.sin(byaw - yaw), np.cos(byaw - yaw)))
    assert diff < 0.5, (yaw, byaw)


def test_one_way_twin_carriageways():
  """Two parallel carriageways across a median: each one-way, twin on the
  left of travel."""
  ppm = 2.0
  n = int(200 * ppm)
  g = np.arange(n) / ppm
  gx, gy = np.meshgrid(g, g)
  road = (np.abs(gy - 90) <= 3.5) | (np.abs(gy - 110) <= 3.5)  # median 13 m
  tl = lg.build_town_lanes(road, ppm, np.zeros(2, np.float32))
  real = [p for p, c in zip(tl.lane_polys, tl.is_connector) if not c]
  assert len(real) >= 2
  for poly in real:
    mid = poly[len(poly) // 2]
    d = poly[min(len(poly) // 2 + 1, len(poly) - 1)] - poly[len(poly) // 2]
    yaw = np.arctan2(d[1], d[0])
    # right-hand rule with the twin on the left: the y=90 carriageway
    # (twin at y=110, i.e. +y) must head so that +y is on its LEFT:
    # left = (sin yaw, -cos yaw) -> need -cos(yaw)*sign(110-90) > 0
    twin_side = 1.0 if mid[1] < 100 else -1.0
    assert -np.cos(yaw) * twin_side > 0.3, (mid, yaw)


@pytest.mark.skipif(not __import__("os").path.isdir(
    "/root/reference/team_code/birds_eye_view/maps"),
    reason="reference assets not available")
def test_town02_import_has_signalization():
  from carla_garage_tpu.maps import importer
  t = importer.load_town("Town02")
  assert len(t.light_pos) >= 12            # 8 junctions, mostly 3-approach
  assert len(t.lane_polys) >= 40
  assert t.raster.shape[0] == 9            # incl. LANE_DIR channel
  assert (t.raster[8] > 0).sum() > 1000    # direction raster populated
  # stopline channel now carries the synthesized trigger boxes
  assert (t.raster[4] > 0).sum() > 50
