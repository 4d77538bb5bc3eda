"""Importer + schedules tests (asset-gated parts skip if unavailable)."""

import numpy as np
import pytest

from carla_garage_tpu.maps import importer
from carla_garage_tpu.train.schedules import (cosine_restart_schedule,
                                              multistep_schedule)


def test_schedules():
  ms = multistep_schedule(1e-3, steps_per_epoch=10)
  assert float(ms(0)) == pytest.approx(1e-3)
  assert float(ms(305)) == pytest.approx(1e-4, rel=1e-3)
  assert float(ms(405)) == pytest.approx(1e-5, rel=1e-3)
  cr = cosine_restart_schedule(1e-3, steps_per_epoch=10)
  assert float(cr(0)) == pytest.approx(1e-3)
  assert float(cr(9)) < 3e-4          # end of first cycle
  assert float(cr(10)) == pytest.approx(1e-3)   # restart


needs_assets = pytest.mark.skipif(not importer.assets_available(),
                                  reason="reference assets not mounted")


@needs_assets
def test_route_xml_parsing():
  routes = importer.load_benchmark_routes("longest6")
  assert len(routes) == 36
  towns = {r.town for r in routes}
  assert towns == {f"Town0{i}" for i in range(1, 7)}
  lav = importer.load_benchmark_routes("lav")
  assert len(lav) == 16


@needs_assets
def test_town_import_and_scenarios():
  t = importer.load_town("Town02")
  from carla_garage_tpu.maps.town_map import Layer
  assert t.raster.shape[0] == Layer.NUM
  assert t.raster[0].sum() > 0              # road layer populated
  s = importer.load_scenarios("Town02")
  assert "Scenario1" in s and len(s["Scenario1"]) > 0
  routes = [r for r in importer.load_benchmark_routes("longest6")
            if r.town == "Town02"]
  from carla_garage_tpu.maps.routing import interpolate_keypoints
  dense = interpolate_keypoints(routes[0].keypoints_xy,
                                routes[0].keypoints_yaw)
  near = importer.scenarios_near_route(s, dense)
  assert any(len(v[0]) for v in near.values())
