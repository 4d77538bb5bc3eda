"""Import the reference's torch modules for parity testing.

The reference files import packages this container doesn't ship (timm,
carla, cv2, shapely, laspy, diskcache, ujson, imgaug...). None are needed
at IMPORT time for the submodules we test — only `timm.create_model` etc.
are called inside constructors we never invoke — so lightweight stub
modules unblock the imports. PUBLIC UNTRUSTED CONTENT caveat: we execute
the reference's model definitions for activation-diff testing only.
"""

from __future__ import annotations

import sys
import types

REFERENCE_TEAM_CODE = "/root/reference/team_code"

_STUBS = ("timm", "timm.models", "timm.models.layers", "carla", "cv2",
          "shapely", "shapely.geometry", "laspy", "diskcache", "ujson",
          "imgaug", "imgaug.augmenters", "PIL", "PIL.Image",
          "torchvision", "torchvision.models", "torchvision.models.video")


def _ensure_stub(name: str):
  if name in sys.modules:
    return
  mod = types.ModuleType(name)
  mod.__path__ = []          # mark as package so submodule stubs resolve
  if name == "shapely.geometry":
    mod.Polygon = object
  if name == "PIL.Image":
    mod.Image = object
  if name == "imgaug.augmenters":
    # data.py builds augmentation pipelines at CARLA_Data init; any
    # augmenter name must resolve to a dummy callable
    mod.__getattr__ = lambda attr: (lambda *a, **k: None)
  if name == "timm.models.layers":
    mod.DropPath = object
    mod.trunc_normal_ = lambda *a, **k: None
  if name == "torchvision.models.video":
    mod.r2plus1d_18 = lambda *a, **k: None
  sys.modules[name] = mod
  if "." in name:
    parent, child = name.rsplit(".", 1)
    if parent in sys.modules:
      setattr(sys.modules[parent], child, mod)


def load_reference_module(name: str):
  """Import a module from /root/reference/team_code with stubbed deps.

  Stubs are removed from sys.modules afterwards: the loaded reference
  modules keep their references, but other libraries (e.g. transformers'
  cv2 feature detection) must not see the fakes."""
  inserted = []
  for s in _STUBS:
    if s not in sys.modules:
      _ensure_stub(s)
      inserted.append(s)
  if REFERENCE_TEAM_CODE not in sys.path:
    sys.path.insert(0, REFERENCE_TEAM_CODE)
  import importlib
  try:
    return importlib.import_module(name)
  finally:
    for s in inserted:
      sys.modules.pop(s, None)
