"""AGC — peak envelope with instant attack / exponential release.

Reference analog: `[U:agc.c]` per-sample attack/release loop (SURVEY.md §2.1
#8). Block formulation per BASELINE.json north_star: the envelope recurrence

    env[n] = max(|x[n]|, release_decay * env[n-1])

is an associative max-decay scan (radioframe/ops/scans.py), O(log T) depth,
vectorized over channels. Gain = clip(target / env, <= max_gain). Matches
golden ``agc`` exactly (same recurrence, fp32).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from radioframe.ops.scans import maxdecay_scan


def release_decay(release_s: float, fs: float) -> float:
    """Per-sample decay for a given release time constant (seconds)."""
    return float(np.exp(-1.0 / (release_s * fs)))


def init_state(num_channels: int):
    return jnp.zeros((num_channels,), dtype=jnp.float32)


def apply(env0, x, decay: float, target: float = 1.0, max_gain: float = 1e4, eps: float = 1e-9):
    """(env0 (C,), x (C, T)) -> (y, new_env, gain)."""
    mag = jnp.abs(x).astype(jnp.float32)
    a = jnp.full_like(mag, jnp.float32(decay))
    env = maxdecay_scan(a, mag, env0)
    gain = jnp.minimum(jnp.float32(max_gain), jnp.float32(target) / jnp.maximum(env, jnp.float32(eps)))
    y = x * gain.astype(x.dtype)
    return y, env[:, -1], gain
