"""Block-scan formulations of per-sample recursions (SURVEY.md §7 hard-part #1).

The reference runs per-sample state machines (AGC envelopes, DC blockers,
IIR biquads, squelch) in tiny ISR blocks; on TPU those recursions become
O(log T) ``jax.lax.associative_scan`` over semiring elements, vectorized
across channels. This module holds the two workhorse scans:

  - affine:   s[n] = a[n] * s[n-1] + b[n]        (first-order IIR et al.)
  - max-decay: s[n] = max(a[n] * s[n-1], b[n])   (peak envelopes / AGC)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _affine_combine(l, r):
    al, bl = l
    ar, br = r
    return al * ar, bl * ar + br


def affine_scan(a, b, s0):
    """s[n] = a[n]*s[n-1] + b[n] along the last axis, s[-1] = s0.

    a, b: (..., T); s0: (...,). Returns s (..., T).
    """
    aa, bb = lax.associative_scan(_affine_combine, (a, b), axis=-1)
    return bb + aa * s0[..., None]


def _maxdecay_combine(l, r):
    al, vl = l
    ar, vr = r
    return al * ar, jnp.maximum(vl * ar, vr)


def maxdecay_scan(a, v, s0):
    """s[n] = max(a[n]*s[n-1], v[n]) along the last axis, s[-1] = s0."""
    aa, vv = lax.associative_scan(_maxdecay_combine, (a, v), axis=-1)
    return jnp.maximum(vv, aa * s0[..., None])


def first_order_iir(x, pole, zero_num, s0):
    """y[n] = pole*y[n-1] + zero_num[n]; convenience over affine_scan."""
    a = jnp.full_like(x, pole)
    return affine_scan(a, zero_num, s0)
