"""Pallas TPU kernel: multi-channel polyphase FIR decimator.

The flagship hot op (SURVEY.md §2.1 #4): replaces the reference FPGA's
polyphase decimation datapath. TPU-native layout per SURVEY.md §7
hard-part #5:

  - channels -> lane dimension (padded to 128)
  - decimated time -> sublane dimension, tiled across the grid
  - taps k = p + j*R phase-split on host so every in-kernel read is a
    STRIDE-1 shifted window of a phase plane (no strided VMEM access);
    the R*J tap loop unrolls into (TILE, C) VPU fused multiply-adds
  - cross-tile window overlap handled by passing the phase planes twice
    with adjacent block indices (current + next tile) — no halo DMAs

Grid: (2 re/im, M/TILE output tiles). fp32 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(J, cur_ref, nxt_ref, taps_ref, out_ref):
    # cur/nxt: (1, R, TILE, C); taps: (R, J); out: (1, TILE, C)
    R = cur_ref.shape[1]
    TILE = cur_ref.shape[2]
    acc = jnp.zeros(out_ref.shape[1:], dtype=jnp.float32)
    for p in range(R):
        window = jnp.concatenate([cur_ref[0, p], nxt_ref[0, p]], axis=0)  # (2*TILE, C)
        for j in range(J):
            acc = acc + taps_ref[p, j] * window[j : j + TILE, :]
    out_ref[0] = acc


def _pick_tile(M: int) -> int:
    for t in (512, 256, 128, 64, 32, 16, 8):
        if M % t == 0:
            return t
    raise ValueError(f"output length {M} must be a multiple of 8")


def polyphase_fir_decimate(xr, xi, taps_rev, R: int, tile: int | None = None,
                           interpret: bool = False):
    """Core entry: real/imag planes (C, Tp) -> decimated (C, M) planes.

    xr/xi: (C, Tp) f32 where Tp >= T + L - 1 contains tail + block.
    taps_rev: reversed taps w (L,), L padded to a multiple of R by caller.
    Returns (yr, yi) with M = (Tp - (L - 1)) // R.
    """
    C, Tp = xr.shape
    L = taps_rev.shape[0]
    assert L % R == 0
    J = L // R
    T = Tp - (L - 1)
    assert T % R == 0
    M = T // R

    tile = tile or _pick_tile(M)
    grid_m = M // tile

    # lane padding
    Cp = -(-C // 128) * 128
    if Cp != C:
        xr = jnp.pad(xr, ((0, Cp - C), (0, 0)))
        xi = jnp.pad(xi, ((0, Cp - C), (0, 0)))

    # phase planes: ph[p, t, c] = x[c, t*R + p], rows 0..M+J-2 used,
    # padded to (grid_m + 1) * tile rows so the "next tile" block exists
    Tm = M + J - 1
    rows_pad = (grid_m + 1) * tile
    x2 = jnp.stack([xr, xi])  # (2, Cp, Tp)
    ph = x2[:, :, : Tm * R].reshape(2, Cp, Tm, R)  # [b, c, t, p] = x[b, c, tR+p]
    ph = jnp.transpose(ph, (0, 3, 2, 1))  # (2, R, Tm, Cp)
    ph = jnp.pad(ph, ((0, 0), (0, 0), (0, rows_pad - Tm), (0, 0)))

    # w[p, j] = taps_rev[p + j*R] (traceable — taps may be a jit constant)
    taps_mat = jnp.asarray(taps_rev, jnp.float32).reshape(J, R).T

    R_ = R
    kern = functools.partial(_kernel, J)
    out = pl.pallas_call(
        kern,
        grid=(2, grid_m),
        in_specs=[
            pl.BlockSpec((1, R_, tile, Cp), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, R_, tile, Cp), lambda b, i: (b, 0, i + 1, 0)),
            pl.BlockSpec((R_, taps_mat.shape[1]), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, Cp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, M, Cp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * M * Cp * L,
            bytes_accessed=2 * (M + J) * Cp * R * 4 + 2 * M * Cp * 4,
            transcendentals=0,
        ),
    )(ph, ph, taps_mat)
    yr = out[0, :, :C].T  # (C, M)
    yi = out[1, :, :C].T
    return yr, yi


class PallasFirDecimator:
    """Drop-in for ops.fir.FirDecimator (real taps) backed by the kernel."""

    def __init__(self, taps: np.ndarray, R: int = 1, interpret: bool = False):
        taps = np.asarray(taps, dtype=np.float64)
        assert not np.iscomplexobj(taps)
        self.R = int(R)
        self.L_orig = len(taps)
        w = taps[::-1]  # correlation form
        pad = (-len(w)) % self.R
        # zero-pad the REVERSED taps at the END: w[k]=0 for k >= L means
        # extra history samples multiply by zero — harmless, and keeps
        # y[m] = sum_k w[k] xp[mR + k + pad_shift]? (validated by tests)
        w = np.concatenate([np.zeros(pad), w])  # pad at FRONT: shifts window
        self.pad = pad
        self.L = len(w)
        self.tail_len = self.L_orig - 1  # carried input samples == halo size
        self._w = w.astype(np.float32)
        self.interpret = interpret
        self.complex_taps = False

    def init_state(self, num_channels: int):
        return jnp.zeros((num_channels, self.L_orig - 1), dtype=jnp.complex64)

    def __call__(self, tail, x):
        """(tail (C, L_orig-1), x (C, T)) -> (y (C, T//R), new_tail)."""
        C, T = x.shape
        assert T % self.R == 0
        xp = jnp.concatenate([tail, x], axis=-1)  # (C, T + L_orig - 1)
        # front-padding w by `pad` zeros means the window starts `pad`
        # samples earlier: prepend `pad` zeros to the stream
        if self.pad:
            xp = jnp.pad(xp, ((0, 0), (self.pad, 0)))
        yr, yi = polyphase_fir_decimate(
            jnp.real(xp), jnp.imag(xp), jnp.asarray(self._w), self.R,
            interpret=self.interpret)
        y = jax.lax.complex(yr, yi)
        new_tail = xp[:, xp.shape[-1] - (self.L_orig - 1):] if self.L_orig > 1 else xp[:, :0]
        return y, new_tail
