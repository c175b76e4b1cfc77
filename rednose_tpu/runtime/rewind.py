"""Rewind/replay checkpoint ring: native C++ extension with Python fallback.

The native implementation (_rewind.cc) mirrors the reference's C++ engine
checkpoint machinery (rednose/helpers/ekf_sym.cc:119-156); the pure-Python
class below is the API-identical fallback used when the extension was not
compiled (and serves as its test oracle, tests/test_rewind.py).
"""

from __future__ import annotations

from bisect import bisect_right

# Number of checkpoints retained, matching the reference's REWIND_TO_KEEP
# (ekf_sym.py:447, ekf_sym.h:18).
REWIND_TO_KEEP = 512


class PyRewindRing:
  """Pure-Python rewind ring (same API as the native RewindRing)."""

  def __init__(self, capacity: int = REWIND_TO_KEEP):
    if capacity <= 0:
      raise ValueError("capacity must be positive")
    self.capacity = capacity
    self._t: list[float] = []
    self._state: list = []
    self._obs: list = []

  def __len__(self):
    return len(self._t)

  def checkpoint(self, t: float, state, obs):
    if self._t and t < self._t[-1]:
      raise ValueError("checkpoint time must be non-decreasing")
    self._t.append(t)
    self._state.append(state)
    self._obs.append(obs)
    if len(self._t) > self.capacity:
      k = len(self._t) - self.capacity
      del self._t[:k], self._state[:k], self._obs[:k]

  def rewind(self, t: float):
    """Roll back to the newest checkpoint with time <= t. Returns
    (t_restore, state_restore, replay_obs_oldest_first); dropped entries'
    observations are the replay list (ekf_sym.py:418-438 semantics)."""
    idx = bisect_right(self._t, t)
    if idx == 0:
      raise ValueError("rewind target older than ring")
    replay = self._obs[idx:]
    del self._t[idx:], self._state[idx:], self._obs[idx:]
    return self._t[-1], self._state[-1], replay

  def can_rewind(self, t: float, max_rewind_age: float) -> bool:
    return (len(self._t) > 0 and t >= self._t[0]
            and t >= self._t[-1] - max_rewind_age)

  def clear(self):
    self._t.clear()
    self._state.clear()
    self._obs.clear()

  def first_t(self):
    return self._t[0] if self._t else None

  def last_t(self):
    return self._t[-1] if self._t else None


try:  # pragma: no cover - exercised when the extension is built
  from rednose_tpu.runtime._rewind import RewindRing as NativeRewindRing
  HAVE_NATIVE = True
except ImportError:  # pragma: no cover
  NativeRewindRing = None
  HAVE_NATIVE = False

RewindRing = NativeRewindRing if HAVE_NATIVE else PyRewindRing
