"""Metering: per-primitive op counting and wall-clock tracing.

Re-design of the reference's compile-time-opt-in metering
(constantine/platforms/metering/tracer.nim:18-150 `{.meter.}` pragma:
call-count + cumulative time per proc, report printer in
metering/reports.nim; driver programs in metering/m_*.nim answer "how many
Fp muls does an MSM do").

TPU version: `Meter.wrap(obj, methods)` monkey-wraps pre-jitted methods
with counters; counts reflect TRACE-time invocations (one per jit trace,
batched over lanes), so `batch_ops` tracks the actual device work:
count * batch. Wall-clock timing uses blocking waits when `time=True`
(dispatch is async otherwise). For kernel-level traces use
`with jax.profiler.trace(dir)` — this module is the op-count layer.

Enable via env CTT_METER=1 (mirrors -d:CTT_METER) or explicitly.
"""

from __future__ import annotations

import functools
import os
import time
from collections import defaultdict


class Meter:
    """Counts (calls, batched lanes, seconds) per labeled primitive."""

    def __init__(self, clock: bool = False):
        self.counts = defaultdict(int)
        self.lanes = defaultdict(int)
        self.secs = defaultdict(float)
        self.clock = clock
        self._wrapped = []

    def wrap(self, obj, methods, prefix: str = None):
        """Wrap obj.<m> for m in methods with counting. Returns obj."""
        prefix = prefix or type(obj).__name__
        for m in methods:
            fn = getattr(obj, m)
            label = f"{prefix}.{m}"

            def wrapper(*a, _fn=fn, _label=label, **kw):
                self.counts[_label] += 1
                lanes = _batch_lanes(a)
                self.lanes[_label] += lanes
                if self.clock:
                    import jax
                    t0 = time.perf_counter()
                    out = _fn(*a, **kw)
                    jax.block_until_ready(out)
                    self.secs[_label] += time.perf_counter() - t0
                    return out
                return _fn(*a, **kw)

            setattr(obj, m, wrapper)
            self._wrapped.append((obj, m, fn))
        return obj

    def unwrap(self):
        for obj, m, fn in self._wrapped:
            setattr(obj, m, fn)
        self._wrapped.clear()

    def reset(self):
        self.counts.clear()
        self.lanes.clear()
        self.secs.clear()

    def report(self) -> str:
        """Formatted table (metering/reports.nim analogue)."""
        rows = ["{:<28} {:>9} {:>13} {:>10}".format(
            "primitive", "calls", "lanes", "seconds")]
        for k in sorted(self.counts):
            rows.append("{:<28} {:>9} {:>13} {:>10.4f}".format(
                k, self.counts[k], self.lanes[k], self.secs.get(k, 0.0)))
        return "\n".join(rows)


def _batch_lanes(args):
    """Estimate batched lanes from the first array-like arg."""
    for a in args:
        if isinstance(a, (tuple, list)) and a:
            a = a[0]
        shape = getattr(a, "shape", None)
        if shape and len(shape) >= 1:
            return int(shape[0])
    return 1


def meter_field(F, meter: Meter = None) -> Meter:
    """Attach a meter to a Field's hot ops — the analogue of building with
    -d:CTT_METER and running metering/m_*.nim drivers."""
    meter = meter or Meter(clock=os.environ.get("CTT_METER_CLOCK") == "1")
    meter.wrap(F, ("mul", "square", "add", "sub", "inv", "batch_inv"),
               prefix=F.name)
    return meter


def meter_group(G, meter: Meter = None) -> Meter:
    meter = meter or Meter(clock=os.environ.get("CTT_METER_CLOCK") == "1")
    meter.wrap(G, ("add", "madd", "double", "scalar_mul"), prefix=G.name)
    return meter


ENABLED = os.environ.get("CTT_METER", "0") == "1"
