"""Biquad cascade (associative-scan IIR) vs scipy sosfilt."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal

from radioframe.ops.biquad import Biquad, BiquadCascade


def test_single_section_vs_scipy(rng):
    sos = signal.butter(2, 0.2, output="sos")  # one section
    bq = Biquad(sos[0, :3], sos[0, 3:])
    x = rng.standard_normal((3, 500)).astype(np.float32)
    y, _ = jax.jit(bq)(bq.init_state(3), jnp.asarray(x))
    for c in range(3):
        ref = signal.sosfilt(sos, x[c].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-4)


def test_cascade_vs_scipy(rng):
    sos = signal.butter(6, [0.05, 0.3], btype="band", output="sos")
    casc = BiquadCascade(sos)
    x = rng.standard_normal((2, 800)).astype(np.float32)
    y, _ = jax.jit(casc)(casc.init_state(2), jnp.asarray(x))
    for c in range(2):
        ref = signal.sosfilt(sos, x[c].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-3)


def test_streaming_state(rng):
    sos = signal.butter(4, 0.1, output="sos")
    casc = BiquadCascade(sos)
    x = rng.standard_normal((1, 600)).astype(np.float32)
    whole, _ = casc(casc.init_state(1), jnp.asarray(x))
    st = casc.init_state(1)
    outs = []
    for b in np.split(x, 3, axis=-1):
        y, st = casc(st, jnp.asarray(b))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, -1), np.asarray(whole), atol=1e-5)
