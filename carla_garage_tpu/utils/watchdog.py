"""Host-side watchdog — hang detection for long device operations.

The reference arms thread-timer watchdogs around every simulator tick and
agent call (scenariomanager/watchdog.py:21-80, scenario_manager_local.py:
64-70), interrupting the main thread on timeout. In this framework a hang
can only happen at the host/device boundary (a compile or a wedged TPU
runtime), so the watchdog wraps host-blocking calls.
"""

from __future__ import annotations

import _thread
import contextlib
import threading


class Watchdog:
  """Raises KeyboardInterrupt on the main thread if not stopped in time
  (same trip mechanism as the reference's watchdog.py:58-66)."""

  def __init__(self, timeout_s: float):
    self.timeout_s = timeout_s
    self._timer = None
    self._tripped = False

  def _trip(self):
    self._tripped = True
    _thread.interrupt_main()

  def start(self):
    self._timer = threading.Timer(self.timeout_s, self._trip)
    self._timer.daemon = True
    self._timer.start()

  def update(self):
    """Re-arm (call once per completed unit of work)."""
    self.stop()
    self.start()

  def stop(self):
    if self._timer is not None:
      self._timer.cancel()
      self._timer = None

  @property
  def tripped(self) -> bool:
    return self._tripped


@contextlib.contextmanager
def watchdog(timeout_s: float):
  w = Watchdog(timeout_s)
  w.start()
  try:
    yield w
  finally:
    w.stop()
