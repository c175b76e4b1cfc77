"""Offline log replay and multi-pass smoothing.

The reference README describes offline use as "multiple forward and backwards
passes" over a log (README.md:41-45) but ships no driver for it; this module
provides one. A log is a time-ordered list of Observation records; replay
runs them through a filter facade collecting the 9-tuple estimates;
multipass_smooth alternates forward filtering and RTS smoothing, warm-starting
each new forward pass from the previous backward pass's smoothed initial
state (the standard iterated fixed-interval smoother).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np


@dataclasses.dataclass
class Observation:
  t: float
  kind: int
  data: Any
  R: Any = None  # None -> the filter's declared obs_noise for this kind


def replay_log(kf, log: Sequence[Observation]):
  """Run a log through a KalmanFilter facade; returns the estimate list
  (drops rejected/too-old observations, like the reference caller would)."""
  estimates = []
  for obs in log:
    est = kf.predict_and_observe(obs.t, obs.kind, obs.data, R=obs.R)
    if est is not None:
      estimates.append(est)
  return estimates


def multipass_smooth(kf, log: Sequence[Observation], passes: int = 2,
                     norm_quats: bool = False, parallel: bool = False):
  """Iterated forward-filter / backward-smooth over a fixed log.

  Each pass filters forward then RTS-smooths backward; the next pass
  warm-starts from the smoothed estimate of the earliest state (covariance
  kept at the filter's initial prior so information is not double-counted).
  Returns (smoothed list of (x, P), estimates of the final forward pass).
  """
  assert passes >= 1
  smoothed = None
  P0 = kf.filter.covs()
  for _ in range(passes):
    estimates = replay_log(kf, log)
    smoothed = kf.filter.rts_smooth(estimates, norm_quats=norm_quats,
                                    parallel=parallel)
    x0 = smoothed[0][0]
    kf.filter.init_state(np.asarray(x0), P0, None)
  return smoothed, estimates
