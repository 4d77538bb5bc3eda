"""Loss functions: focal, label-smoothed CE, masked regression.

Re-designs of focal_loss.py (class-weighted focal CE) and the loss assembly
of model.compute_loss (model.py:394-445) / train.py loss weighting
(:384-456). All pure functions over logits + targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, weights=None, label_smoothing=0.0,
                  sample_weight=None):
  """CE over the last axis; labels int [..]. Per-class weights [C] optional;
  sample_weight broadcasts against the label shape (e.g. [B] per-sample
  quality gates). Returns mean over all elements (weighted)."""
  num = logits.shape[-1]
  lab = jax.nn.one_hot(labels, num)
  if label_smoothing > 0:
    lab = lab * (1 - label_smoothing) + label_smoothing / num
  logp = jax.nn.log_softmax(logits)
  ce = -jnp.sum(lab * logp, -1)
  if weights is None and sample_weight is None:
    return jnp.mean(ce)
  w = jnp.ones_like(ce)
  if weights is not None:
    w = w * jnp.asarray(weights)[labels]
  if sample_weight is not None:
    sw = sample_weight.reshape(sample_weight.shape +
                               (1,) * (ce.ndim - sample_weight.ndim))
    w = w * sw
  return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)


def focal_ce(logits, labels, gamma=2.0, weights=None):
  """Class-weighted focal cross entropy (focal_loss.py:1-134)."""
  logp = jax.nn.log_softmax(logits)
  p = jnp.exp(logp)
  pt = jnp.take_along_axis(p, labels[..., None], -1)[..., 0]
  lpt = jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
  loss = -jnp.power(1 - pt, gamma) * lpt
  if weights is not None:
    w = jnp.asarray(weights)[labels]
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1e-6)
  return jnp.mean(loss)


def l1_masked(pred, target, mask):
  """Mean absolute error over masked elements (avg-factor semantics of
  center_net.py:77-123)."""
  err = jnp.abs(pred - target)
  m = mask.astype(jnp.float32)
  while m.ndim < err.ndim:
    m = m[..., None]
  m = jnp.broadcast_to(m, err.shape)
  return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1e-6)
