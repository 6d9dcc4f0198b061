"""wpgen dynamic speed models (02-config/04-wpgen.md; reference
src/runtime/generator/speed/{profile,controller}.rs).

The reference paces a real-time generator thread with these profiles; the
Spark analog uses them two ways:

- batch (`wpgen --config` with `duration_secs`): the profile integrates
  over the run window to a total row count — `planned_rows()` — which the
  distributed generator then produces in one job (pacing a batch engine
  by sleeping would just waste the cluster).
- streaming: `speed_at(t)` bounds each micro-batch (rows per trigger),
  the Structured-Streaming equivalent of the reference's limiter.

Determinism: the reference's burst/random_walk draw from a thread RNG;
here every stochastic profile takes an explicit seed so tests and
re-runs reproduce. Formula parity is per controller.rs:
  sinusoidal: base + amplitude * sin(2π t / period)        (floor 1)
  stepped:    piecewise by accumulated durations, optional loop,
              clamp-to-last when not looping
  ramp:       start + (end-start) * clamp(t/duration, 0, 1) (floor 1)
  random:     base * (1 + uniform(-variance, +variance))    (floor 1)
  burst:      base, flipping to burst_rate for burst_duration_ms with
              per-check probability = burst_probability / 10
  composite:  average | max | min | sum of the children
"""

from __future__ import annotations

import math
import random

DEFAULT_RATE = 1000  # SpeedProfile::default() == Constant(1000)


class SpeedController:
    """Deterministic port of DynamicSpeedController: profile dict ->
    rate-at-elapsed-time. Profile dicts use the TOML spelling of
    [generator.speed_profile] (type/keys per 04-wpgen.md)."""

    def __init__(self, profile: dict | None, seed: int = 0):
        self.profile = profile or {"type": "constant", "rate": DEFAULT_RATE}
        self._rng = random.Random(seed)
        self._burst_end: float | None = None
        self._children = [
            SpeedController(p, seed=seed + i + 1)
            for i, p in enumerate(self.profile.get("profiles", []))
        ]

    # ------------------------------------------------------------------
    def speed_at(self, t: float) -> int:
        """Rows/sec at elapsed time `t` seconds (controller.rs
        calculate_speed)."""
        p = self.profile
        kind = str(p.get("type", "constant"))
        if kind == "constant":
            return int(p.get("rate", DEFAULT_RATE))
        if kind == "sinusoidal":
            base = float(p.get("base", DEFAULT_RATE))
            amplitude = float(p.get("amplitude", 0))
            period = float(p.get("period_secs", 0))
            if period <= 0:
                return int(base)
            phase = (t / period) * 2.0 * math.pi
            return int(max(1.0, base + amplitude * math.sin(phase)))
        if kind == "stepped":
            steps = [(float(d), int(r)) for d, r in p.get("steps", [])]
            if not steps:
                return DEFAULT_RATE
            total = sum(d for d, _ in steps)
            if total <= 0:
                return steps[0][1]
            eff = t % total if p.get("loop_forever", False) else min(t, total)
            acc = 0.0
            for dur, rate in steps:
                acc += dur
                if eff < acc:
                    return rate
            return steps[-1][1]
        if kind == "burst":
            base = int(p.get("base", DEFAULT_RATE))
            burst_rate = int(p.get("burst_rate", base))
            dur_s = float(p.get("burst_duration_ms", 0)) / 1000.0
            prob = float(p.get("burst_probability", 0.0))
            if self._burst_end is not None:
                if t < self._burst_end:
                    return burst_rate
                self._burst_end = None
            # controller.rs: per-check probability = per-second prob / 10
            if self._rng.random() < prob / 10.0:
                self._burst_end = t + dur_s
                return burst_rate
            return base
        if kind == "ramp":
            start = float(p.get("start", DEFAULT_RATE))
            end = float(p.get("end", start))
            duration = float(p.get("duration_secs", 0))
            if duration <= 0:
                return int(end)
            progress = min(max(t / duration, 0.0), 1.0)
            return int(max(1.0, start + (end - start) * progress))
        if kind == "random_walk":
            base = float(p.get("base", DEFAULT_RATE))
            variance = float(p.get("variance", 0.0))
            noise = self._rng.random() * 2.0 * variance - variance
            return int(max(1.0, base * (1.0 + noise)))
        if kind == "composite":
            if not self._children:
                return DEFAULT_RATE
            rates = [c.speed_at(t) for c in self._children]
            mode = str(p.get("combine_mode", "average"))
            if mode == "max":
                return max(rates)
            if mode == "min":
                return min(rates)
            if mode == "sum":
                return sum(rates)
            return sum(rates) // len(rates)  # average (integer, like Rust)
        raise ValueError(f"unknown speed_profile type {kind!r}")

    # ------------------------------------------------------------------
    def planned_rows(self, duration_secs: float, tick: float = 0.1) -> int:
        """Integrate the profile over [0, duration): the batch-mode total
        a paced generator would have produced. One rate sample per `tick`
        seconds. Default 0.1 s matches the reference limiter's ~100 ms
        check cadence (controller.rs:200: per-check burst probability is
        the per-second probability / 10, calibrated for 100 ms calls), so
        expected burst frequency AND sub-second burst_duration_ms windows
        integrate at the reference's resolution. Accumulates in float,
        scrubs float epsilon with round(.., 6), then truncates once —
        rows are discrete emissions, so a genuine fractional total (e.g.
        3.5 planned rows) floors to 3, while binary tick inexactness
        (25 x 50.0 summing to 1249.999...) still lands on 1250."""
        total = 0.0
        t = 0.0
        while t < duration_secs:
            step = min(tick, duration_secs - t)
            total += self.speed_at(t) * step
            t += tick
        return int(round(total, 6))


def profile_from_generator_conf(gen: dict) -> dict | None:
    """[generator] table -> profile dict. speed_profile wins over the
    scalar `speed` (04-wpgen.md: when speed_profile exists, speed is
    ignored); speed=0 means unlimited (None)."""
    if "speed_profile" in gen:
        return dict(gen["speed_profile"])
    speed = int(gen.get("speed", 0))
    if speed > 0:
        return {"type": "constant", "rate": speed}
    return None
