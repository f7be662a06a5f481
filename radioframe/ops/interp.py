"""Streaming FIR interpolator (zero-stuff by L + anti-image FIR) — the DUC
upsampling stage (SURVEY.md §2.1 #10), adjoint of ops/fir.FirDecimator.

Zero-stuffing is expressed as ``lhs_dilation`` in conv_general_dilated, so
XLA lowers it as a transposed conv (polyphase — no multiplies on stuffed
zeros) instead of materializing the upsampled stream.

Semantics match golden ``interpolate``: u[mL] = x[m] (else 0),
y[n] = sum_k h[k] u[n-k]; a block of T inputs yields T*L outputs
y[n0 .. n0+T*L-1]. State = last ceil((Lh-1)/L) input samples.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


class FirInterpolator:
    def __init__(self, taps: np.ndarray, L: int):
        taps = np.asarray(taps)
        assert not np.iscomplexobj(taps), "interpolator taps are real"
        self.L = int(L)
        self.Lh = len(taps)
        self.tin = -(-(self.Lh - 1) // self.L)  # ceil((Lh-1)/L) carried inputs
        w = taps[::-1].astype(np.float32)
        self._rhs = np.stack([w, w])[:, None, :]  # (2, 1, Lh) grouped re/im

    def init_state(self, num_channels: int):
        return jnp.zeros((num_channels, self.tin), dtype=jnp.complex64)

    def __call__(self, tail, x):
        """(tail (C, tin), x (C, T)) -> (y (C, T*L), new_tail)."""
        C, T = x.shape
        xp = jnp.concatenate([tail, x], axis=-1)  # (C, tin + T)
        lhs = jnp.stack([jnp.real(xp), jnp.imag(xp)], axis=1)  # (C, 2, tin+T)
        out = lax.conv_general_dilated(
            lhs, jnp.asarray(self._rhs),
            window_strides=(1,),
            padding=((0, self.L - 1),),
            lhs_dilation=(self.L,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=2,
            preferred_element_type=jnp.float32,
        )  # (C, 2, (tin+T)*L - Lh + 1 + (L-1))
        start = self.tin * self.L - (self.Lh - 1)
        y = lax.complex(out[:, 0, start : start + T * self.L],
                        out[:, 1, start : start + T * self.L])
        new_tail = xp[:, xp.shape[-1] - self.tin :]
        return y, new_tail


def cic_interpolator(L: int, N: int, M: int = 1) -> FirInterpolator:
    """CIC interpolator in its FIR-equivalent block form — the DUC's bulk
    interpolation stage, exact adjoint of ``ops.fir.cic_decimator``
    (SURVEY.md §2.1 #10, the FPGA DUC's comb->zero-stuff->integrator chain).

    Zero-stuff by L then boxcar^N ((1-z^-LM)/(1-z^-1))^N — same operator as
    the comb/integrator structure, bounded state (no fp32 integrator growth).
    Taps are scaled to DC gain L so a unit-amplitude baseband stays unit
    amplitude at the DAC rate; passband sinc^N droop is pre-compensated in
    the preceding FIR stage (filter_design.compensated_interp_taps).
    """
    from radioframe.ops.filter_design import cic_equivalent_taps

    return FirInterpolator(cic_equivalent_taps(L, N, M, norm=True) * L, L)
