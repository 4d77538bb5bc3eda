"""Dataset storage — host-side persistence of collected frames.

The reference stores ~350 GB of jpg/png/laz/json.gz on disk
(data_agent.save_sensors:341-372) and decodes it with DataLoader workers.
Here datasets normally never leave the device; this module is the optional
persistence layer (npz shards, ~zstd-free but npz-compressed) for reuse
across processes and for the legacy-dataset conversion role (SURVEY §2.9:
'host converter for the legacy dataset').
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from carla_garage_tpu.sim.datagen import Frames


def save_frames(frames: Frames, path: str):
  """Persist a Frames pytree as one compressed npz shard."""
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  arrays = {f.name: np.asarray(getattr(frames, f.name))
            for f in dataclasses.fields(Frames)}
  np.savez_compressed(path, **arrays)


def load_frames(path: str) -> Frames:
  import jax.numpy as jnp
  with np.load(path) as z:
    return Frames(**{k: jnp.asarray(z[k]) for k in z.files})


def save_plant_dataset(ds, path: str):
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  np.savez_compressed(path, **{f.name: getattr(ds, f.name)
                               for f in dataclasses.fields(ds)})


def load_plant_dataset(path: str):
  from carla_garage_tpu.train.plant_train import PlantDataset
  with np.load(path) as z:
    return PlantDataset(**{k: z[k] for k in z.files})
