"""Pallas TPU kernel v2: fused NCO mix + stage-1 + (optional) stage-2 decim.

Evolution of kernels/fused_frontend.py driven by round-2 probes (see
ROADMAP.md): the v1 kernel itself runs at ~0.39 ms/block (data-movement
bound; all compute hidden under the copy), but the chain paid ~1.2 ms for
the stage because of everything around it — the per-tile ``tails`` array
(host-built, re-read every grid tile), the stage-1 output round trip
through HBM at fs/R1, and the relayouts feeding stage 2. v2 removes all
three:

  1. **Scratch-carried history.** TPU grid steps execute sequentially
     (dimension_semantics="arbitrary"), so the mixed history frames a tile
     needs are exactly what the previous tile just computed — carried in
     VMEM scratch instead of a host-prepared (grid, 2, H, Cp) array. Only
     tile 0 mixes the block-level raw tail, at its true negative DDS
     indices (same int32 wrap as v1 — bit-identical phases).
  2. **Fused stage 2.** The second FIR decimator (the CIC-compensating
     anti-alias stage) consumes stage-1 outputs while they are still in
     VMEM: per tile, stage 1 produces (TM, Cp), stage 2 folds them with
     scratch-carried y1 history into (TM/R2, Cp) — the only HBM write is
     at the final rate (R1*R2 below input). This retires the standalone
     PallasFirDecimator for the shipped configs (VERDICT r1 #9): the conv
     it lost to is no longer on the hot path at all.
  3. **One carried raw tail.** Block state is just {acc, raw tail of
     H2*R1 + H1 samples}: the stage-2 history (96 stage-1 outputs) is
     recomputed from it each block by a tiny host-side jnp helper
     (~H2*(J0+1)*R1 MACs per channel — audio-rate noise). The same
     recompute makes time sharding work with ONE raw halo and no new
     collective machinery.

Reference analog: the FPGA datapath runs DDS -> CIC -> comp-FIR as one
hardware pipeline with no full-rate buffering anywhere (SURVEY.md §2.1
#1-#4); v2 is that design point on the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radioframe.kernels.fused_frontend import _SCALE, _pick_tile


def _kernel(TM, J0, R, J2, R2,
            xr_ref, xi_ref, tl_ref, y1t_ref, word_ref, acc_ref, w1_ref, w2_ref,
            out_ref, pow_ref, hr_ref, hi_ref, h2r_ref, h2i_ref):
    i = pl.program_id(0)
    Cp = xr_ref.shape[0]
    # int16 ADC ingest: raw counts are upcast to f32 on load (the input
    # scale is folded into the stage-1 taps), halving the kernel's HBM
    # traffic — the stream crosses HBM once, as 2-byte words
    xr_f = xr_ref[...].astype(jnp.float32)
    xi_f = xi_ref[...].astype(jnp.float32)
    x3r = jnp.transpose(xr_f).reshape(TM, R, Cp)
    x3i = jnp.transpose(xi_f).reshape(TM, R, Cp)
    # input power partial (per tile, per channel) — data is already in
    # VMEM, so the chain's power_in metric costs no extra HBM pass
    pow_ref[0] = jnp.sum(xr_f * xr_f + xi_f * xi_f, axis=-1)[None, :]

    # factorized DDS oscillator for the BODY frames g = i*TM + f
    word = word_ref[...]  # (1, Cp) int32
    acc = acc_ref[...]
    g = (i * TM) + jax.lax.broadcasted_iota(jnp.int32, (TM, Cp), 0)
    a1 = (acc + word * (g * R)).astype(jnp.float32) * _SCALE
    p32 = jax.lax.broadcasted_iota(jnp.int32, (R, Cp), 0)
    a2 = (word * p32).astype(jnp.float32) * _SCALE
    c1, s1 = jnp.cos(a1)[:, None, :], jnp.sin(a1)[:, None, :]
    c2, s2 = jnp.cos(a2)[None, :, :], jnp.sin(a2)[None, :, :]
    ca = c1 * c2 - s1 * s2  # (TM, R, Cp)
    sa = c1 * s2 + s1 * c2
    br = x3r * ca - x3i * sa  # mixed body
    bi = x3r * sa + x3i * ca

    # history: tile 0 mixes the block-level RAW tail at g = -J0..-1
    # (bit-identical DDS wrap); later tiles reuse the mixed frames the
    # previous tile stored in scratch — no re-read, no re-mix.
    @pl.when(i == 0)
    def _init_hist():
        t3r = tl_ref[0].reshape(J0, R, Cp)
        t3i = tl_ref[1].reshape(J0, R, Cp)
        gh = (-J0) + jax.lax.broadcasted_iota(jnp.int32, (J0, Cp), 0)
        ah = (acc + word * (gh * R)).astype(jnp.float32) * _SCALE
        ch, sh = jnp.cos(ah)[:, None, :], jnp.sin(ah)[:, None, :]
        hr_ref[...] = t3r * (ch * c2 - sh * s2) - t3i * (ch * s2 + sh * c2)
        hi_ref[...] = t3r * (ch * s2 + sh * c2) + t3i * (ch * c2 - sh * s2)
        if R2 > 1:
            h2r_ref[...] = y1t_ref[0]
            h2i_ref[...] = y1t_ref[1]

    mr = jnp.concatenate([hr_ref[...], br], axis=0)  # (J0+TM, R, Cp)
    mi = jnp.concatenate([hi_ref[...], bi], axis=0)
    hr_ref[...] = mr[TM:]  # next tile's history (mixed, bit-exact reuse)
    hi_ref[...] = mi[TM:]

    # stage-1 polyphase FIR
    accR = jnp.zeros((TM, R, Cp), jnp.float32)
    accI = jnp.zeros((TM, R, Cp), jnp.float32)
    for j in range(J0 + 1):
        wj = w1_ref[j : j + 1]  # (1, R, 1)
        accR = accR + mr[j : j + TM] * wj
        accI = accI + mi[j : j + TM] * wj
    y1r = jnp.sum(accR, axis=1)  # (TM, Cp)
    y1i = jnp.sum(accI, axis=1)

    if R2 == 1:  # single-stage mode
        out_ref[0, 0] = y1r
        out_ref[0, 1] = y1i
        return

    # stage-2 polyphase FIR over stage-1 outputs, history in scratch
    TM2 = TM // R2
    f2r = jnp.concatenate([h2r_ref[...], y1r.reshape(TM2, R2, Cp)], axis=0)
    f2i = jnp.concatenate([h2i_ref[...], y1i.reshape(TM2, R2, Cp)], axis=0)
    h2r_ref[...] = f2r[TM2:]
    h2i_ref[...] = f2i[TM2:]
    acc2R = jnp.zeros((TM2, R2, Cp), jnp.float32)
    acc2I = jnp.zeros((TM2, R2, Cp), jnp.float32)
    for j in range(J2 + 1):
        wj = w2_ref[j : j + 1]  # (1, R2, 1)
        acc2R = acc2R + f2r[j : j + TM2] * wj
        acc2I = acc2I + f2i[j : j + TM2] * wj
    out_ref[0, 0] = jnp.sum(acc2R, axis=1)  # (TM2, Cp)
    out_ref[0, 1] = jnp.sum(acc2I, axis=1)


def _pad_poly(taps, R, J):
    """Reversed taps zero-padded to (J+1, R): y[m] = sum_k wp[k] x[mR - JR + k]."""
    w_rev = np.asarray(taps, np.float64)[::-1]
    wp = np.zeros(((J + 1) * R,), np.float64)
    d = J * R - (len(w_rev) - 1)
    wp[d : d + len(w_rev)] = w_rev
    return wp.reshape(J + 1, R).astype(np.float32)


class FusedFrontend2:
    """Fused NCO + stage-1 (+ optional stage-2) decimation, scratch-carried.

    taps/R: stage 1 (real taps). taps2/R2: optional second real-tap FIR
    stage (R2 must be a power of two; None -> single-stage mode).
    Block state: {"acc" (C,) int32 DDS, "tail" (C, H_carry) RAW iq} with
    H_carry = H2*R1 + H1 (fused2) or H1 — the stage-2 history is
    recomputed from the raw tail (``y1_history``), so the time-sharded
    chain needs only ONE raw halo of H_carry samples.
    """

    MAX_GRID = 128

    def __init__(self, taps, R: int, taps2=None, R2: int = 1, interpret: bool = False,
                 input_scale: float = 1.0):
        # input_scale is folded into the stage-1 taps (the chain is linear),
        # so int16 ADC counts (scale 2**-15) cost nothing at runtime
        self.input_scale = float(input_scale)
        h1 = np.asarray(taps, np.float64) * self.input_scale
        assert not np.iscomplexobj(h1)
        self.R = int(R)
        self.L = len(h1)
        self.J0 = max(1, -(-(self.L - 1) // self.R))
        self.H = self.J0 * self.R  # stage-1 raw history
        self.w1 = _pad_poly(h1, self.R, self.J0)
        self.fuse2 = taps2 is not None
        if self.fuse2:
            h2 = np.asarray(taps2, np.float64)
            assert not np.iscomplexobj(h2)
            self.R2 = int(R2)
            assert self.R2 & (self.R2 - 1) == 0, "stage-2 R must be a power of two"
            self.L2 = len(h2)
            self.J2 = max(1, -(-(self.L2 - 1) // self.R2))
            self.w2 = _pad_poly(h2, self.R2, self.J2)
            self.H2 = self.J2 * self.R2  # carried stage-1 output samples
        else:
            self.R2, self.J2, self.H2 = 1, 1, 0
            self.w2 = np.zeros((2, 1), np.float32)  # placeholder, unused
        self.H_carry = self.H2 * self.R + self.H  # raw samples in state/halo
        self.tail_len = self.H_carry
        self.decim = self.R * self.R2
        self.interpret = interpret

    def init_state(self, num_channels: int):
        return {
            "acc": jnp.zeros((num_channels,), jnp.int32),
            "tail": jnp.zeros((num_channels, self.H_carry), jnp.complex64),
        }

    def y1_history(self, acc, words, tail):
        """Stage-1 outputs for the H2 samples preceding the block.

        Mixes the raw carried tail at its negative DDS indices and applies
        the stage-1 polyphase windows — ~H2*(J0+1)*R MACs per channel,
        audio-rate noise. fp path differs from the kernel's factorized
        oscillator only in rounding (same angles mod 2 pi)."""
        Hs = tail.shape[-1]
        n = jnp.arange(-Hs, 0, dtype=jnp.int32)
        theta = (acc[:, None] + words[:, None] * n[None, :]).astype(jnp.float32) * _SCALE
        mixed = tail * jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
        wp = jnp.asarray(self.w1.reshape(-1))  # ((J0+1)*R,)
        W1 = (self.J0 + 1) * self.R
        cols = [mixed[:, j * self.R : j * self.R + W1] @ wp for j in range(self.H2)]
        return jnp.stack(cols, axis=-1)  # (C, H2) complex

    def step(self, state, iq, words, return_power: bool = False):
        """(state, iq (C, T) c64, words (C,) i32) -> (state, y (C, T//decim))
        [+ per-channel input power sum when ``return_power``]."""
        if iq.shape[0] == 1 and words.shape[0] > 1:
            iq = jnp.broadcast_to(iq, (words.shape[0], iq.shape[1]))
        return self.step_planes(state, jnp.real(iq), jnp.imag(iq), words,
                                return_power=return_power)

    def step_planes(self, state, xr, xi, words, return_power: bool = False):
        """Plane-input form: xr/xi (C, T) float32, or int16 ADC counts when
        the frontend was built with ``input_scale=2**-15`` — the int16 path
        halves the kernel's HBM read traffic (the dominant cost; the stream
        crosses HBM once). Returns (state, y) or (state, y, power_sum) with
        power_sum (C,) = sum |x|^2 in RAW input units (caller applies
        input_scale**2)."""
        R, R2, J0, J2 = self.R, self.R2, self.J0, self.J2
        if xr.shape[0] == 1 and words.shape[0] > 1:
            xr = jnp.broadcast_to(xr, (words.shape[0], xr.shape[1]))
            xi = jnp.broadcast_to(xi, (words.shape[0], xi.shape[1]))
        C, T = xr.shape
        assert T % (R * R2) == 0 and T >= self.H_carry
        M = T // R
        TM = _pick_tile(M, J0, R)
        while TM % R2:
            TM //= 2
        assert TM >= max(J0, 8) and TM % R2 == 0, (TM, J0, R2)
        grid_m = M // TM
        if grid_m > self.MAX_GRID:
            chunk_T = self.MAX_GRID * TM * R
            ys, pws = [], []
            for t0 in range(0, T, chunk_T):
                state, y, pw = self.step_planes(
                    state, xr[:, t0 : t0 + chunk_T], xi[:, t0 : t0 + chunk_T],
                    words, return_power=True)
                ys.append(y)
                pws.append(pw)
            y = jnp.concatenate(ys, axis=-1)
            if return_power:
                return state, y, sum(pws)
            return state, y
        W = TM * R
        TM2 = TM // R2

        Cp = -(-C // 128) * 128
        if Cp != C:
            xr = jnp.pad(xr, ((0, Cp - C), (0, 0)))
            xi = jnp.pad(xi, ((0, Cp - C), (0, 0)))
        word2 = jnp.zeros((1, Cp), jnp.int32).at[0, :C].set(words.astype(jnp.int32))
        acc2 = jnp.zeros((1, Cp), jnp.int32).at[0, :C].set(state["acc"])
        raw1 = state["tail"][:, self.H_carry - self.H :]  # last H1 raw samples
        tail = jnp.zeros((2, self.H, Cp), jnp.float32)
        tail = tail.at[0, :, :C].set(jnp.real(raw1).astype(jnp.float32).T)
        tail = tail.at[1, :, :C].set(jnp.imag(raw1).astype(jnp.float32).T)
        y1t = jnp.zeros((2, max(J2, 1), max(R2, 1), Cp), jnp.float32)
        if self.fuse2:
            y1h = self.y1_history(state["acc"], words.astype(jnp.int32), state["tail"])
            y1t = y1t.at[0, :, :, :C].set(
                jnp.real(y1h).astype(jnp.float32).T.reshape(J2, R2, C))
            y1t = y1t.at[1, :, :, :C].set(
                jnp.imag(y1h).astype(jnp.float32).T.reshape(J2, R2, C))

        kern = functools.partial(_kernel, TM, J0, R, J2, R2)
        w1in = jnp.asarray(self.w1)[:, :, None]
        w2in = jnp.asarray(self.w2)[:, :, None]
        M2 = M // R2
        out = pl.pallas_call(
            kern,
            grid=(grid_m,),
            in_specs=[
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((2, self.H, Cp), lambda i: (0, 0, 0)),
                pl.BlockSpec((2, max(J2, 1), max(R2, 1), Cp), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((J0 + 1, R, 1), lambda i: (0, 0, 0)),
                pl.BlockSpec((self.w2.shape[0], self.w2.shape[1], 1),
                             lambda i: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, 2, TM2, Cp), lambda i: (i, 0, 0, 0)),
                       pl.BlockSpec((1, 1, Cp), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((grid_m, 2, TM2, Cp), jnp.float32),
                       jax.ShapeDtypeStruct((grid_m, 1, Cp), jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((J0, R, Cp), jnp.float32),
                pltpu.VMEM((J0, R, Cp), jnp.float32),
                pltpu.VMEM((max(J2, 1), max(R2, 1), Cp), jnp.float32),
                pltpu.VMEM((max(J2, 1), max(R2, 1), Cp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),  # sequential grid
                # explicit 32 MB scoped limit: the default (larger) budget
                # measured slower on the PFB+DFT kernel — the compiler
                # trades double-buffering headroom for it (r5,
                # tools/probe_pfbdft_stages.py)
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * M * Cp * (J0 + 1) * R
                + 2 * 2 * M2 * Cp * (J2 + 1) * R2 + 10 * T * Cp,
                bytes_accessed=2 * T * Cp * xr.dtype.itemsize + 2 * M2 * Cp * 4,
                transcendentals=2 * (M + J0 + R) * Cp,
            ),
        )(xr, xi, tail, y1t, word2, acc2, w1in, w2in)
        out, powp = out
        y2 = out.transpose(1, 0, 2, 3).reshape(2, M2, Cp)
        y = jax.lax.complex(y2[0, :, :C].T, y2[1, :, :C].T)  # (C, M2)
        new_tail = jax.lax.complex(
            xr[:C, T - self.H_carry :].astype(jnp.float32),
            xi[:C, T - self.H_carry :].astype(jnp.float32))
        new_state = {
            "acc": state["acc"] + words.astype(jnp.int32) * jnp.int32(T),
            "tail": new_tail,
        }
        if return_power:
            return new_state, y, jnp.sum(powp[:, 0, :C], axis=0)
        return new_state, y
