"""Phase timers: the reference's planner timing plots, headless.

Reference (SURVEY §5.1): wall-clock timers around every planning phase,
plotted in the GUI timer figure (sampling/planner.cc:169-211, GetDuration
utilities.h:376). Here: a lightweight host-side phase timer that brackets
jitted calls (block_until_ready for honest device timings) plus a hook into
jax.profiler for deep traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

import jax


class PhaseTimer:
  """Accumulates per-phase wall times; thread-safe enough for the agent."""

  def __init__(self):
    self.totals: Dict[str, float] = collections.defaultdict(float)
    self.counts: Dict[str, int] = collections.defaultdict(int)

  @contextlib.contextmanager
  def phase(self, name: str, sync=None):
    """Context manager; pass the phase's output pytree as `sync` to block
    on device completion for honest timings."""
    t0 = time.perf_counter()
    holder = {}
    try:
      yield holder
    finally:
      out = holder.get("out", sync)
      if out is not None:
        jax.block_until_ready(out)
      dt = time.perf_counter() - t0
      self.totals[name] += dt
      self.counts[name] += 1

  def report(self) -> Dict[str, Dict[str, float]]:
    return {
        name: {
            "total_s": self.totals[name],
            "count": self.counts[name],
            "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
        }
        for name in sorted(self.totals)
    }

  def reset(self):
    self.totals.clear()
    self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
  """jax.profiler trace for TensorBoard (TPU timeline)."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
