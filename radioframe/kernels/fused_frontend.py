"""Pallas TPU kernel: fused NCO mix + first-stage polyphase decimation.

Stage timing (tools/bench_stages.py, TPU v5 lite) shows the full-rate front
end — NCO complex mix then the CIC/FIR first decimator — is ~68% of the RX
chain's per-block compute, and both stages are HBM-bound: each makes a full
ADC-rate round trip through HBM. This kernel fuses them (ROADMAP perf #2):

    raw IQ planes (C, T) --one HBM read--> [mix * e^{-jθ} ; polyphase FIR
    decimate by R, all in VMEM] --one HBM write--> (C, T/R)

eliminating the full-rate intermediate entirely (~420 MB -> ~160 MB of HBM
traffic per 128ch x 131072-sample block).

Reference analog: the FPGA DDS + CIC datapath computes exactly this fusion in
hardware — every ADC sample is mixed and integrated in one pipeline pass,
never buffered at full rate (SURVEY.md §2.1 #1-#4). This is the TPU-native
version of that design point.

Design notes (SURVEY.md §7 hard-part #5):
  - channels -> lanes (padded to 128); time -> sublanes. Input blocks arrive
    channel-major (C, W) straight from HBM (no host-side transpose of the
    full-rate stream) and are transposed to time-major once inside VMEM.
  - time is reshaped to (frames, R) so each output sample m consumes whole
    frames m-J0..m; cross-tile history is J0 frames, delivered per-tile via a
    tiny host-prepared `tails` array (grid, H, C) instead of re-reading the
    neighbor block (tails are 0.2% of the stream).
  - the DDS oscillator is generated in-kernel from the int32 Q0.32 phase
    accumulator (exact wrap semantics == ops/nco.py), factorized as
    exp(-jθ(frame)) * exp(-jθ(phase)) so transcendental count is
    (frames + R) per channel instead of (frames * R).
  - taps are baked into the kernel as constants (they are filter design
    output, static per chain build); the (J0+1) x R tap loop unrolls into
    VPU FMAs over (TILE, R, C) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_SCALE = np.float32(-(2.0 * np.pi) * 2.0 ** -32)  # int32 Q0.32 turns -> -radians


def _kernel(TM, J0, R, xr_ref, xi_ref, tl_ref, word_ref, acc_ref, w2_ref, out_ref):
    i = pl.program_id(0)
    Cp = xr_ref.shape[0]
    # time-major planes: (W, Cp) -> frames (TM, R, Cp); the reshape is free
    # (sublane split on native (8,128) tiles), the transpose is one in-VMEM
    # vector transpose instead of a full-rate HBM transpose on host.
    x3r = jnp.transpose(xr_ref[...]).reshape(TM, R, Cp)
    x3i = jnp.transpose(xi_ref[...]).reshape(TM, R, Cp)
    t3r = tl_ref[0, 0].reshape(J0, R, Cp)
    t3i = tl_ref[0, 1].reshape(J0, R, Cp)
    fr = jnp.concatenate([t3r, x3r], axis=0)  # (F=TM+J0, R, Cp)
    fi = jnp.concatenate([t3i, x3i], axis=0)
    F = TM + J0

    # factorized DDS oscillator: global input frame g = i*TM - J0 + f holds
    # samples n = g*R + p; θ(n) = (acc + word*n) mod 2^32 (int32 wrap ==
    # ops/nco.py exactly); e^{-jθ(n)} = e^{-jθc(g)} * e^{-jθf(p)}
    word = word_ref[...]  # (1, Cp) int32
    acc = acc_ref[...]
    g = (i * TM - J0) + jax.lax.broadcasted_iota(jnp.int32, (F, Cp), 0)
    a1 = (acc + word * (g * R)).astype(jnp.float32) * _SCALE  # (F, Cp)
    p32 = jax.lax.broadcasted_iota(jnp.int32, (R, Cp), 0)
    a2 = (word * p32).astype(jnp.float32) * _SCALE  # (R, Cp)
    c1, s1 = jnp.cos(a1)[:, None, :], jnp.sin(a1)[:, None, :]
    c2, s2 = jnp.cos(a2)[None, :, :], jnp.sin(a2)[None, :, :]
    ca = c1 * c2 - s1 * s2  # (F, R, Cp)
    sa = c1 * s2 + s1 * c2
    mr = fr * ca - fi * sa  # mixed = x * e^{-jθ}
    mi = fr * sa + fi * ca

    # polyphase FIR: y[m] = sum_{j,p} w2[j,p] * mixed[m+j, p]
    accR = jnp.zeros((TM, R, Cp), jnp.float32)
    accI = jnp.zeros((TM, R, Cp), jnp.float32)
    for j in range(J0 + 1):
        wj = w2_ref[j : j + 1]  # (1, R, 1), broadcasts over time tiles + lanes
        accR = accR + mr[j : j + TM] * wj
        accI = accI + mi[j : j + TM] * wj
    # NOTE: an in-kernel output transpose to (Cp, TM) blocks was tried to
    # kill the host-side relayout — it REGRESSED the chain 8.08 -> 4.86
    # Gsps on TPU v5 lite (and failed to lower at TM=64), so the output
    # stays time-major and the wrapper transposes once at decimated rate.
    out_ref[0, 0] = jnp.sum(accR, axis=1)  # (TM, Cp)
    out_ref[0, 1] = jnp.sum(accI, axis=1)


def _pick_tile(M: int, J0: int, R: int) -> int:
    # VMEM budget: the kernel holds ~8 live (TM+J0, R, Cp=128) f32 arrays
    # (frames, oscillator, mixed, accumulators); keep (TM+J0)*R <= 4096 so
    # their stack stays well under the 16 MB scoped-vmem limit (observed
    # OOM at R=32 with TM=128: 17.76 MB > 16 MB).
    budget = max(8, 4096 // R - J0)
    for t in (128, 64, 32, 16, 8):
        if t <= budget and M % t == 0 and t >= J0:
            return t
    raise ValueError(f"output length {M} incompatible with history {J0} frames")


class FusedFrontend:
    """Fused replacement for ``nco.mix_down`` + the first ``FirDecimator``.

    State: ``{"acc": (C,) int32 DDS accumulators, "tail": (C, H) complex64
    RAW (pre-mix) history}``. Carrying the tail raw is what makes the fusion
    exact: the DDS phase is affine in the sample index, so the kernel re-mixes
    history samples at negative indices n∈[-H,0) with θ(n) = acc + word*n —
    bit-identical phase to when they were current (int32 wrap included).
    """

    def __init__(self, taps: np.ndarray, R: int, interpret: bool = False):
        h = np.asarray(taps, np.float64)
        assert not np.iscomplexobj(h), "fused front end expects real taps"
        self.R = int(R)
        self.L = len(h)
        w_rev = h[::-1]
        self.J0 = max(1, -(-(self.L - 1) // self.R))  # history frames
        self.H = self.J0 * self.R  # carried raw samples (>= L-1, frame-aligned)
        d = self.H - (self.L - 1)
        wp = np.zeros(((self.J0 + 1) * self.R,), np.float64)
        wp[d : d + self.L] = w_rev  # y[m] = sum_k wp[k] x[mR - H + k]
        self.w2 = wp.reshape(self.J0 + 1, self.R).astype(np.float32)
        self.tail_len = self.H
        self.interpret = interpret

    def init_state(self, num_channels: int):
        return {
            "acc": jnp.zeros((num_channels,), jnp.int32),
            "tail": jnp.zeros((num_channels, self.H), jnp.complex64),
        }

    def boundary_correction(self, acc, words, tail):
        """Contribution of the raw history ``tail`` (C, H) to outputs m < J0.

        The fused front end is linear in its input and the DDS oscillator is
        input-independent, so  y(tail | block) = y(0 | block) + y(tail | 0).
        This evaluates the second term directly (J0 output samples per
        channel — tiny). It is the fix-up half of the overlapped halo
        exchange (SURVEY.md §2.3 ring-halo row): start the async remote copy,
        run ``step`` on the local block with a ZERO tail (the interior — no
        dependency on the neighbor), then add this correction once the halo
        lands. Phases are the DDS's own: θ(n) = (acc + word·n) in int32 Q0.32
        wrap for n in [-H, 0), identical (mod 2π, up to fp rounding) to the
        in-kernel factorized oscillator.

        Returns (C, J0) complex64 to add onto ``y[:, :J0]``.
        """
        H, J0, R = self.H, self.J0, self.R
        n = jnp.arange(-H, 0, dtype=jnp.int32)
        theta = (acc[:, None] + words[:, None] * n[None, :]).astype(jnp.float32) * _SCALE
        osc = jax.lax.complex(jnp.cos(theta), jnp.sin(theta))
        mixed = tail * osc  # (C, H)
        wp = jnp.asarray(self.w2.reshape(-1), jnp.float32)  # ((J0+1)*R,)
        padded = jnp.pad(mixed, ((0, 0), (0, J0 * R)))
        # y_corr[m] = sum_k wp[k] * x[mR - H + k] with x zero outside the tail
        ys = [padded[:, m * R : m * R + (J0 + 1) * R] @ wp for m in range(J0)]
        return jnp.stack(ys, axis=-1)  # (C, J0)

    # max grid steps per pallas_call: caps the kernel's staged output buffer
    # at 128 * (2*TM*Cp) * 4 B = 16 MB (one VMEM) — larger blocks OOM the
    # scoped-vmem allocator when XLA keeps the output VMEM-resident (seen at
    # R=32, T=655k: f32[160,2,128,128] > 16 MB limit). Longer inputs are
    # processed as bit-exact streaming chunks (state threads through).
    MAX_GRID = 128

    def step(self, state, iq, words):
        """(state, iq (C, T) c64, words (C,) i32) -> (state, y (C, T//R) c64)."""
        R, H, J0 = self.R, self.H, self.J0
        if iq.shape[0] == 1 and words.shape[0] > 1:  # shared wideband input
            iq = jnp.broadcast_to(iq, (words.shape[0], iq.shape[1]))
        C, T = iq.shape
        assert T % R == 0, f"block length {T} must be a multiple of R={R}"
        M = T // R
        TM = _pick_tile(M, J0, R)
        grid_m = M // TM
        if grid_m > self.MAX_GRID:
            chunk_T = self.MAX_GRID * TM * R
            ys = []
            for t0 in range(0, T, chunk_T):
                state, y = self.step(state, iq[:, t0 : t0 + chunk_T], words)
                ys.append(y)
            return state, jnp.concatenate(ys, axis=-1)
        W = TM * R

        Cp = -(-C // 128) * 128
        xr = jnp.real(iq).astype(jnp.float32)
        xi = jnp.imag(iq).astype(jnp.float32)
        if Cp != C:
            xr = jnp.pad(xr, ((0, Cp - C), (0, 0)))
            xi = jnp.pad(xi, ((0, Cp - C), (0, 0)))
        word2 = jnp.zeros((1, Cp), jnp.int32).at[0, :C].set(words.astype(jnp.int32))
        acc2 = jnp.zeros((1, Cp), jnp.int32).at[0, :C].set(state["acc"])

        # per-tile raw history, time-major: tails[i] = last H samples before
        # block i (state tail for i=0, end of block i-1 otherwise). 0.2% of
        # the stream — cheap to build, saves re-reading neighbor blocks.
        t0r = jnp.zeros((H, Cp), jnp.float32).at[:, :C].set(
            jnp.real(state["tail"]).astype(jnp.float32).T)
        t0i = jnp.zeros((H, Cp), jnp.float32).at[:, :C].set(
            jnp.imag(state["tail"]).astype(jnp.float32).T)
        blr = jnp.moveaxis(xr.reshape(Cp, grid_m, W)[:, :, W - H :], 0, -1)  # (g, H, Cp)
        bli = jnp.moveaxis(xi.reshape(Cp, grid_m, W)[:, :, W - H :], 0, -1)
        tlr = jnp.concatenate([t0r[None], blr[:-1]], axis=0)
        tli = jnp.concatenate([t0i[None], bli[:-1]], axis=0)
        tails = jnp.stack([tlr, tli], axis=1)  # (grid_m, 2, H, Cp)

        kern = functools.partial(_kernel, TM, J0, R)
        w2in = jnp.asarray(self.w2)[:, :, None]  # (J0+1, R, 1)
        out = pl.pallas_call(
            kern,
            grid=(grid_m,),
            in_specs=[
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((Cp, W), lambda i: (0, i)),
                pl.BlockSpec((1, 2, H, Cp), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((1, Cp), lambda i: (0, 0)),
                pl.BlockSpec((self.J0 + 1, R, 1), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, TM, Cp), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid_m, 2, TM, Cp), jnp.float32),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * M * Cp * (J0 + 1) * R + 10 * T * Cp,
                bytes_accessed=2 * T * Cp * 4 + 2 * M * Cp * 4 + tails.size * 4,
                transcendentals=2 * (M + J0 * grid_m + R * grid_m) * Cp,
            ),
        )(xr, xi, tails, word2, acc2, w2in)
        y2 = out.transpose(1, 0, 2, 3).reshape(2, M, Cp)  # (2, M, Cp)
        y = jax.lax.complex(y2[0, :, :C].T, y2[1, :, :C].T)  # (C, M)
        new_state = {
            "acc": state["acc"] + words.astype(jnp.int32) * jnp.int32(T),
            "tail": iq[:, T - H :],
        }
        return new_state, y
