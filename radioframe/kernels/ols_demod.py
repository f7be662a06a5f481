"""Pallas TPU kernel: fused OLS mode-filter bank + demod bank + AGC.

STATUS (r4 measurements, ROADMAP round-4 log): EXPERIMENTAL, OFF by
default — parity-exact but NOT faster than the XLA back end on this
hardware. The hypothesis was that the XLA formulation's ~0.47 ms/block
(tools/bench_stages.py: ols_selected 0.30 + demod/AGC 0.17) was ~10
separate near-bandwidth HBM passes a VMEM-resident kernel would delete.
Measured: per-frame grid = 19.94 Gsps chain (parity with XLA's 19.81);
frame-batched FI=4 = 15.77 (slower: the exact in-kernel scan forms — a
(hop, hop) triangular DC/attack matmul per frame — cost more than XLA's
chunked audio-rate scans, and 8.4 MB is too little data to amortize
Pallas grid overheads); FI=8 ballooned Mosaic compile past 25 min. The
audio-rate stage is simply not HBM-bound the way the full-rate stages
are. Kept in-tree as the documented negative result + the left-multiplied
sublane-DFT pattern (which IS the useful artifact: (k1,n1) @ (n1,n2,C)
keeps channels on lanes with zero transposes anywhere).

Design: ONE kernel keeps a frame window in VMEM: overlap-save window ->
Cooley-Tukey MXU DFT -> per-channel selected frequency response ->
inverse DFT -> discard prefix -> demod bank + attack/release AGC (the
shared demod_agc_tile body from kernels/demod_agc.py); HBM sees the
audio-rate stream once in and the demodulated audio once out.

Layout: time on sublanes, channels on lanes (C = one lane tile). The DFT
runs over the SUBLANE axis by LEFT-multiplying the CT factor matrices —
(k1, n1) @ (n1, n2, C) and (k2, n2) @ (k1, n2, C) — so the minor dim stays
C throughout and the (k2, k1, C) output flattens to natural frequency
order with no transposes anywhere (same factor algebra as ops/ols.CtDft).
The overlap window's L-1-row prefix is carried in VMEM scratch across the
sequential grid (== the OLS tail contract, seeded from block state).

Reference analog: `[U:audio_filters.c]` + `[U:audio_processor.c]`'s
per-block filter->demod->AGC loop, which runs in-cache on the MCU; this
is that locality on the TPU memory hierarchy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radioframe.kernels.demod_agc import (agc_prefix_consts,
                                          demod_agc_tile,
                                          release_decays_ok)
from radioframe.kernels.pfb_dft import _bf16_split
from radioframe.ops import demod as demod_op


def _lmm_p(prec):
    """LEFT matmul: (k, n) @ rhs contracting rhs axis ``rax`` -> k leads.

    prec: lax.Precision or "b3" (manual bf16x3 split, see pfb_dft._mm_p)."""
    def lmm(w, b, rax):
        dims = (((1,), (rax,)), ((), ()))
        if prec == "b3":
            w_hi, w_lo = _bf16_split(w)
            b_hi, b_lo = _bf16_split(b)
            d = lambda x, y: lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)
            return d(w_hi, b_hi) + d(w_hi, b_lo) + d(w_lo, b_hi)
        return lax.dot_general(w, b, dims, precision=prec,
                               preferred_element_type=jnp.float32)
    return lmm


def _ct_consts(N: int):
    """Left-multiply CT factors for an N = N1*N2 DFT over sublanes."""
    N2 = 128 if N % 128 == 0 and N >= 128 else 1 << (N.bit_length() // 2)
    N1 = N // N2
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    W1 = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N1)) / N1)
    W2 = np.exp(-2j * np.pi * np.outer(np.arange(N2), np.arange(N2)) / N2)
    TW = np.exp(-2j * np.pi * np.outer(np.arange(N1), np.arange(N2)) / N)
    fwd = (f32(W1.real), f32(W1.imag), f32(W2.real), f32(W2.imag),
           f32(TW.real), f32(TW.imag))
    inv = (f32(W1.real), f32(-W1.imag), f32(W2.real / N), f32(-W2.imag / N),
           f32(TW.real), f32(-TW.imag))
    return N1, N2, fwd, inv


def _ct_dft_b(lmm, N1, N2, consts, wr4, wi4):
    """Frame-batched DFT: (F, N1, N2, C) planes -> (F, nfft, C) planes.

    Batching the F frames into ONE pair of contractions per stage makes the
    factor matmuls F-times larger (the per-frame form was MXU-latency-
    bound: grid-of-8 measured parity with plain XLA). All reshapes split or
    merge dims at sublane position or higher with the lane dim untouched —
    the only shape casts Mosaic's layout inference accepts in-kernel."""
    F, _, _, C = wr4.shape
    w1r, w1i, w2r, w2i, twr, twi = consts
    # stage 1: contract n1 (rhs axis 1) -> (k1, F, N2, C)
    ar = lmm(w1r, wr4, 1) - lmm(w1i, wi4, 1)
    ai = lmm(w1r, wi4, 1) + lmm(w1i, wr4, 1)
    tr = twr[:, None, :, None]
    ti = twi[:, None, :, None]
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    # stage 2: contract n2 (rhs axis 2) -> (k2, k1, F, C); then frame-major
    xr = lmm(w2r, br, 2) - lmm(w2i, bi, 2)
    xi = lmm(w2r, bi, 2) + lmm(w2i, br, 2)
    # (k2, k1, F, C) -> (F, k2, k1, C) -> (F, nfft, C): flat k2*N1+k1 == k
    xr = jnp.transpose(xr, (2, 0, 1, 3)).reshape(F, N1 * N2, C)
    xi = jnp.transpose(xi, (2, 0, 1, 3)).reshape(F, N1 * N2, C)
    return xr, xi


def _kernel(hop, nfft, N1, N2, C, FI, prec, grid,
            en_ssb, en_lsb, en_cw, en_am, en_nfm, alphas, dev_scale,
            xr_ref, xi_ref, tl_ref, hr_ref2, hi_ref2,
            w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
            v1r_ref, v1i_ref, v2r_ref, v2i_ref, vwr_ref, vwi_ref,
            mode_ref, cw_word_ref, cw_acc_ref, rel_ref, al_ref, tgt_ref,
            mg_ref, ltri_ref, atri_ref, dcol_ref, st_in_ref,
            audio_ref, st_out_ref,
            scr_r, scr_i, carry_ref):
    i = pl.program_id(0)
    lmm = _lmm_p(prec)
    L1 = nfft - hop  # == L - 1, the OLS tail / window prefix

    @pl.when(i == 0)
    def _seed():
        scr_r[...] = tl_ref[0]
        scr_i[...] = tl_ref[1]
        carry_ref[...] = st_in_ref[...]

    wr = jnp.concatenate([scr_r[...], xr_ref[0]], axis=0)  # (L1 + FI*hop, C)
    wi = jnp.concatenate([scr_i[...], xi_ref[0]], axis=0)
    scr_r[...] = wr[FI * hop:]
    scr_i[...] = wi[FI * hop:]
    # FI overlap-save windows on a LEADING frame axis -> (FI, nfft, C); the
    # (FI, N1, N2, C) view then only splits the sublane dim (lane intact)
    fr = jnp.stack([wr[j * hop: j * hop + nfft] for j in range(FI)], axis=0)
    fi = jnp.stack([wi[j * hop: j * hop + nfft] for j in range(FI)], axis=0)

    fwd = (w1r_ref[...], w1i_ref[...], w2r_ref[...], w2i_ref[...],
           twr_ref[...], twi_ref[...])
    inv = (v1r_ref[...], v1i_ref[...], v2r_ref[...], v2i_ref[...],
           vwr_ref[...], vwi_ref[...])
    Xr, Xi = _ct_dft_b(lmm, N1, N2, fwd,
                       fr.reshape(FI, N1, N2, C), fi.reshape(FI, N1, N2, C))
    # per-channel selected frequency response (runtime-gathered planes)
    hr = hr_ref2[...][None, :, :]
    hi = hi_ref2[...][None, :, :]
    Yr = Xr * hr - Xi * hi
    Yi = Xr * hi + Xi * hr
    yr, yi = _ct_dft_b(lmm, N1, N2, inv,
                       Yr.reshape(FI, N1, N2, C), Yi.reshape(FI, N1, N2, C))
    # overlap-save: first L-1 rows of each frame are circular wrap
    sr = yr[:, L1:]
    si = yi[:, L1:]

    for j in range(FI):
        audio, _ = demod_agc_tile(
            i * FI + j, hop, 0, en_ssb, en_lsb, en_cw, en_am, en_nfm,
            alphas, dev_scale, sr[j], si[j], mode_ref[...], cw_word_ref[...],
            cw_acc_ref[...], rel_ref[...], al_ref[...], tgt_ref[...],
            mg_ref[...], ltri_ref, atri_ref, dcol_ref, carry_ref)
        audio_ref[0, j] = audio

    @pl.when(i == grid - 1)
    def _emit_state():
        st_out_ref[...] = carry_ref[...]


class FusedOlsDemod:
    """Flagship audio back end: (OLS tail, x (C, Ta) audio-rate complex,
    per-channel selected response H (C, nfft), mode + AGC constants,
    st_in (7, C)) -> (audio (C, Ta) f32, st_out (7, C), new_tail).

    Streaming contract identical to OverlapSaveBank.apply_selected followed
    by demod_op.bank_apply + AgcBank.apply (parity: tests/test_rx_chain.py
    TestFusedBackend). Time rides sublanes, channels ride lanes; see module
    docstring for why no transposes exist anywhere in the kernel.
    """

    MAX_GRID = 512

    def __init__(self, nfft: int, hop: int, C: int, fs_audio: float,
                 nfm_deviation_hz: float, enabled=(0, 1, 2, 3, 4),
                 attack_alphas: tuple = (), interpret: bool = False,
                 dft_precision: str = "highest"):
        assert nfft & (nfft - 1) == 0, "pow2 nfft"
        assert 0 < hop < nfft
        if not (interpret or C % 128 == 0):
            # same full-lane-tile gate as the channelizer kernels
            # (pfb_dft.fused_channels_ok): with partial lane tiles the
            # in-kernel (F, k2, k1, C) -> (F, nfft, C) merge lowers to a
            # shape cast Mosaic's layout inference rejects — found by the
            # r5 on-TPU suite (the kernel had only ever run interpret)
            raise ValueError(
                f"FusedOlsDemod needs channels % 128 == 0 when compiled "
                f"(got {C}); use the dense back end for smaller C")
        self.nfft, self.hop, self.C = int(nfft), int(hop), int(C)
        self.N1, self.N2, self._fwd, self._inv = _ct_consts(self.nfft)
        self._prec = {"highest": lax.Precision.HIGHEST, "b3": "b3"}[dft_precision]
        self.dev_scale = float(fs_audio / (2.0 * np.pi * nfm_deviation_hz))
        en = frozenset(map(int, enabled))
        assert demod_op.SAM not in en, "SAM needs the dense XLA bank"
        self.en = en
        self.attack_alphas = tuple(sorted({float(a) for a in attack_alphas
                                           if float(a) != 0.0}))
        self.interpret = interpret
        # the AGC tile length is the hop; same rescale-boundedness guard
        # contract as FusedDemodAgc.release_ok
        self.max_tf = self.hop

    def release_ok(self, release_values) -> bool:
        return release_decays_ok(release_values, self.hop)

    def __call__(self, tail, x, h_sel, mode, cw_word, cw_acc, rel, al, tgt,
                 mg, st_in):
        """tail (C, L-1) c64; x (C, Ta) c64; h_sel (C, nfft) c64."""
        C, Ta = x.shape
        nfft, hop = self.nfft, self.hop
        assert C == self.C and Ta % hop == 0
        F = Ta // hop
        FI = F
        # <=4 frames per step: FI=8 ballooned Mosaic compile time past 25
        # minutes (8 unrolled demod tile bodies + batched DFT); FI=4 keeps
        # the batched-matmul win with a tractable program
        while FI > 4 or F % FI:
            FI -= 1
        grid = F // FI
        assert grid <= self.MAX_GRID, "chunk longer blocks upstream"
        L1 = nfft - hop
        # time-major planes (free on the chain side: built once per block
        # at audio rate); the kernel never transposes anything
        xr = jnp.real(x).T.reshape(grid, FI * hop, C)
        xi = jnp.imag(x).T.reshape(grid, FI * hop, C)
        tl = jnp.stack([jnp.real(tail).T, jnp.imag(tail).T]).astype(jnp.float32)
        hr2 = jnp.real(h_sel).T.astype(jnp.float32)  # (nfft, C)
        hi2 = jnp.imag(h_sel).T.astype(jnp.float32)

        TF = hop
        ltri, atri, dcol = agc_prefix_consts(TF, self.attack_alphas)
        n_a = atri.shape[0]

        en = self.en
        kern = functools.partial(
            _kernel, hop, nfft, self.N1, self.N2, C, FI, self._prec, grid,
            demod_op.SSB in en, demod_op.LSB in en, demod_op.CW in en,
            demod_op.AM in en, demod_op.NFM in en, self.attack_alphas,
            self.dev_scale)
        c = jnp.asarray
        row = lambda a, dt: jnp.asarray(a, dt).reshape(1, C)
        whole = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))
        audio, st_out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, FI * hop, C), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, FI * hop, C), lambda i: (i, 0, 0)),
                whole((2, L1, C)),
                whole((nfft, C)), whole((nfft, C)),
                whole((self.N1, self.N1)), whole((self.N1, self.N1)),
                whole((self.N2, self.N2)), whole((self.N2, self.N2)),
                whole((self.N1, self.N2)), whole((self.N1, self.N2)),
                whole((self.N1, self.N1)), whole((self.N1, self.N1)),
                whole((self.N2, self.N2)), whole((self.N2, self.N2)),
                whole((self.N1, self.N2)), whole((self.N1, self.N2)),
                whole((1, C)), whole((1, C)), whole((1, C)), whole((1, C)),
                whole((1, C)), whole((1, C)), whole((1, C)),
                whole((TF, TF)),
                whole((n_a, TF, TF)),
                whole((TF, 1 + len(self.attack_alphas))),
                whole((7, C)),
            ],
            out_specs=[
                pl.BlockSpec((1, FI, hop, C), lambda i: (i, 0, 0, 0)),
                whole((7, C)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((grid, FI, hop, C), jnp.float32),
                jax.ShapeDtypeStruct((7, C), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((L1, C), jnp.float32),
                            pltpu.VMEM((L1, C), jnp.float32),
                            pltpu.VMEM((7, C), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=16 * Ta * (self.N1 + self.N2)
                + 2 * Ta * TF + 40 * Ta * C // max(C, 1),
                bytes_accessed=3 * Ta * C * 4,
                transcendentals=3 * Ta,
            ),
        )(xr, xi, tl, c(hr2), c(hi2),
          *(c(a) for a in self._fwd), *(c(a) for a in self._inv),
          row(mode, jnp.int32), row(cw_word, jnp.int32),
          row(cw_acc, jnp.int32), row(rel, jnp.float32),
          row(al, jnp.float32), row(tgt, jnp.float32), row(mg, jnp.float32),
          c(ltri), c(atri), c(dcol), st_in.astype(jnp.float32))
        audio = audio.reshape(Ta, C).T  # (C, Ta)
        xp_last = x[:, Ta - L1:] if Ta >= L1 else jnp.concatenate(
            [tail, x], axis=-1)[:, -L1:]
        return audio, st_out, xp_last
