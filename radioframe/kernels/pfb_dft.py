"""Pallas TPU kernel: fused polyphase filterbank + M-point DFT.

The config-5 hot loop (SURVEY.md §7 P6; VERDICT r2 ask #3). The XLA
formulation pays ~2.1 ms/block at M=4096, F=2048: the K=8 shifted
multiply-adds re-read the frame planes from HBM, the FFT makes its own
passes, and the (F, M) -> (M, F) transpose adds another. Fused form: each
grid step loads ONE tile of frames into VMEM, runs the K-tap polyphase
accumulation in registers, and applies the M-point DFT as a Cooley-Tukey
M1 x M2 decomposition — two small complex matmuls on the MXU (f32 via
precision=HIGHEST; the bf16 default was measured 1.7e-2 relative error,
far outside audio tolerance) with a twiddle multiply between. The input
stream crosses HBM exactly once.

    X[M1*k2 + k1] = sum_{n2} W2[n2, k2] * TW[n2, k1]
                    * sum_{n1} u[M2*n1 + n2] W1[n1, k1]

History: the K-1 frames a tile needs are what the previous tile just
loaded — carried in VMEM scratch (sequential grid), the same pattern as
kernels/fused_frontend2.py; tile 0 seeds from the carried block tail.

Reference analog: the FPGA's channelizer pipeline (DDC per channel at
line rate with no full-rate buffering); here the TPU memory hierarchy
plays the role of the FPGA's register fabric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dft_consts(M: int):
    """Cooley-Tukey factors M = M1*M2 (both pow2) + twiddles, host f32.

    M2 is kept at the TPU lane width (128) when possible so every kernel
    value keeps a full-lane minor dim — no in-kernel reshapes (Mosaic
    rejects lane splits; the 3D shaping happens host-side, where the
    row-major reshape is free)."""
    M2 = 128 if M % 128 == 0 and M >= 128 else 1 << (M.bit_length() // 2)
    M1 = M // M2
    assert M1 * M2 == M and M1 * M2 > 1
    n1k1 = np.outer(np.arange(M1), np.arange(M1))
    n2k2 = np.outer(np.arange(M2), np.arange(M2))
    n2k1 = np.outer(np.arange(M2), np.arange(M1))
    W1 = np.exp(-2j * np.pi * n1k1 / M1)
    W2 = np.exp(-2j * np.pi * n2k2 / M2)
    TW = np.exp(-2j * np.pi * n2k1 / M)
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return (M1, M2, f32(W1.real), f32(W1.imag), f32(W2.real), f32(W2.imag),
            f32(TW.real), f32(TW.imag))


def fused_channels_ok(M: int, interpret: bool) -> bool:
    """One predicate for every fused-channelizer front end and caller:
    pow2 M always; compiled Mosaic additionally needs full 128-lane tiles
    (M % 128 == 0 — smaller M lowers to lane-merging relayouts Mosaic
    rejects, found at M=64 on hardware in r4)."""
    return (M & (M - 1)) == 0 and (interpret or M % 128 == 0)


def _bf16_split(a):
    """Error-free split a = hi + lo with both parts bf16 (the b3 trick)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm_p(prec):
    """(TF, n, m) contract axis 1 (n) with b (n, k) -> (TF, m, k).

    prec is a lax.Precision, or the string "b3" for a MANUAL bf16x3
    split-product (a_hi@b_hi + a_hi@b_lo + a_lo@b_hi, f32 accumulation):
    ~2^-21 relative error at HALF the MXU passes of HIGHEST (3 one-pass
    bf16 dots vs 6) — Mosaic rejects precision=HIGH in-kernel, so the
    classic error-free-split is spelled out. Identical split terms CSE
    across the four real matmuls sharing an operand."""
    dims = (((1,), (0,)), ((), ()))
    if prec == "b3":
        def mm(a, b):
            a_hi, a_lo = _bf16_split(a)
            b_hi, b_lo = _bf16_split(b)
            d = lambda x, y: lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)
            return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
        return mm

    def mm(a, b):
        return lax.dot_general(a, b, dims, precision=prec,
                               preferred_element_type=jnp.float32)
    return mm


def batched_dft_consts(M: int, TF: int):
    """Host constants for dft_tile's TF-batched orientation (r5).

    W1^T broadcast to (TF, k1, n1) for the batched stage-1 matmul, TW^T as
    (1, k1, n2), W2 as (n2, k2). Returns (M1, M2, bw1r, bw1i, twtr, twti,
    w2r, w2i) ready for jnp.asarray."""
    M1, M2, w1r, w1i, w2r, w2i, twr, twi = _dft_consts(M)
    c = lambda a: np.ascontiguousarray(a, np.float32)
    bw1r = c(np.broadcast_to(w1r.T, (TF, M1, M1)))
    bw1i = c(np.broadcast_to(w1i.T, (TF, M1, M1)))
    twtr = c(twr.T)[None]  # (1, k1, n2)
    twti = c(twi.T)[None]
    return M1, M2, bw1r, bw1i, twtr, twti, w2r, w2i


def dft_tile(prec, ur, ui, bw1r, bw1i, twtr, twti, w2r, w2i):
    """One frame-tile M-point Cooley-Tukey DFT in the MXU-efficient
    orientation (r5 speed-of-light round 3; tools/probe_pfbdft_stages.py).

    The r3/r4 orientation contracted (TF*n2 rows, n1=32) x (n1, k1=32):
    32 output columns leave 3/4 of the MXU lanes idle, and the probe showed
    the DFT stage alone cost 0.97 of the kernel's 1.07 ms/block. Here
    stage 1 runs as a TF-BATCHED (k1, n1) x (n1, n2) matmul producing
    (TF, k1, n2) — output lanes n2=128 (full width) — the twiddle applies
    in that layout, and stage 2 contracts the MINOR axis n2 at full depth
    straight into native (TF, k1, k2). No relayouts anywhere; measured
    0.971 -> 0.637 ms/block for the bare PFB+DFT kernel (1.52x).

    ``prec``: lax.Precision or "b3" (manual bf16x3 split — see _mm_p doc).
    """
    bdims = (((2,), (1,)), ((0,), (0,)))  # batched stage 1
    mdims = (((2,), (0,)), ((), ()))      # minor-axis stage 2
    if prec == "b3":
        def mk(dims):
            def mm(a, b):
                a_hi, a_lo = _bf16_split(a)
                b_hi, b_lo = _bf16_split(b)
                d = lambda x, y: lax.dot_general(
                    x, y, dims, preferred_element_type=jnp.float32)
                return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)
            return mm
        bmm, mm2 = mk(bdims), mk(mdims)
    else:
        bmm = lambda a, b: lax.dot_general(a, b, bdims, precision=prec,
                                           preferred_element_type=jnp.float32)
        mm2 = lambda a, b: lax.dot_general(a, b, mdims, precision=prec,
                                           preferred_element_type=jnp.float32)
    # A[k1, n2] = sum_n1 W1[n1, k1] u[n1, n2]
    ar = bmm(bw1r, ur) - bmm(bw1i, ui)  # (TF, k1, n2)
    ai = bmm(bw1r, ui) + bmm(bw1i, ur)
    br = ar * twtr - ai * twti
    bi = ar * twti + ai * twtr
    # X[k1, k2] = sum_n2 B[k1, n2] W2[n2, k2]
    yr = mm2(br, w2r) - mm2(bi, w2i)    # (TF, k1, k2) — native order
    yi = mm2(br, w2i) + mm2(bi, w2r)
    return yr, yi


def _kernel(TF, K, M1, M2, prec,
            xr_ref, xi_ref, tl_ref, h_ref,
            bw1r_ref, bw1i_ref, w2r_ref, w2i_ref, twtr_ref, twti_ref,
            yr_ref, yi_ref, hr_ref, hi_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():  # block-level tail -> history scratch
        hr_ref[...] = tl_ref[0]
        hi_ref[...] = tl_ref[1]

    fr = jnp.concatenate([hr_ref[...], xr_ref[...]], axis=0)  # (TF+K-1, M1, M2)
    fi = jnp.concatenate([hi_ref[...], xi_ref[...]], axis=0)
    hr_ref[...] = fr[TF:]
    hi_ref[...] = fi[TF:]

    # polyphase accumulation: u[f, p] = sum_t h[t, p] * fr[f + K-1-t, p]
    ur = jnp.zeros((TF, M1, M2), jnp.float32)
    ui = jnp.zeros((TF, M1, M2), jnp.float32)
    for t in range(K):
        w = h_ref[t][None]
        ur = ur + w * fr[K - 1 - t: K - 1 - t + TF]
        ui = ui + w * fi[K - 1 - t: K - 1 - t + TF]

    yr_ref[...], yi_ref[...] = dft_tile(
        prec, ur, ui, bw1r_ref[...], bw1i_ref[...], twtr_ref[...],
        twti_ref[...], w2r_ref[...], w2i_ref[...])


class FusedPfbDft:
    """Fused PFB + DFT. Same streaming contract as ops/pfb.PfbChannelizer
    restricted to B=1: (tail (1, (K-1)M) c64, x (1, T) c64) -> (y (1, M, F)
    c64, new_tail). M must be a power of two (the DFT factorization)."""

    MAX_GRID = 256

    def __init__(self, num_channels: int, taps_per_channel: int = 8,
                 window: str = "hamming", interpret: bool = False,
                 dft_precision: str = "highest"):
        from radioframe.ops.filter_design import pfb_prototype_taps
        from jax import lax as _lax

        # DFT matmul precision: "highest" = 6-pass f32 (the r3 default;
        # plain bf16 measured 1.7e-2 rel err — unusable). "b3" = manual
        # 3-pass bf16x3 split (~2^-21 rel, half the MXU passes; Mosaic has
        # no precision=HIGH) — verified on-chip by tools/verify_tpu.py
        # before being trusted (r4).
        self._prec = {"highest": _lax.Precision.HIGHEST,
                      "b3": "b3"}[dft_precision]

        self.M = int(num_channels)
        assert self.M & (self.M - 1) == 0, "fused PFB needs pow2 M"
        if not fused_channels_ok(self.M, interpret):
            raise ValueError(
                f"fused channelizer kernels need num_channels % 128 == 0 on "
                f"TPU (got {self.M}); use the dense path for smaller M")
        self.K = int(taps_per_channel)
        proto = pfb_prototype_taps(self.M, self.K, window)
        self._h = np.ascontiguousarray(proto.reshape(self.K, self.M)
                                       .astype(np.float32))
        (self.M1, self.M2, self._w1r, self._w1i, self._w2r, self._w2i,
         self._twr, self._twi) = _dft_consts(self.M)
        self.interpret = interpret
        # kernel-native channel order (VERDICT r3 ask #3): the DFT emits
        # (k1, k2) row-major, i.e. native column r holds channel
        # chan_perm[r] = M1*(r % M2) + r // M2; the untangle transpose that
        # reorders the full-rate DATA is a fixed permutation, so callers can
        # instead permute the per-channel CONSTANT vectors (mode, AGC rows,
        # carries — O(M), not O(F*M)) via these indices and take planes in
        # native order (call_planes(native=True)).
        r = np.arange(self.M)
        self.chan_perm = self.M1 * (r % self.M2) + r // self.M2  # native -> channel
        self.chan_inv = np.argsort(self.chan_perm)               # channel -> native

    def init_state(self, batch: int = 1):
        assert batch == 1
        return jnp.zeros((1, (self.K - 1) * self.M), dtype=jnp.complex64)

    def _pick_tf(self, F: int) -> int:
        # VMEM budget: ~12 live (TF, M) f32 arrays + double-buffered I/O
        # blocks; 32 frames at M=4096 fits the 32 MB scoped limit
        cap = max(8, min(256, (32 * 4096) // self.M))
        tf = 1
        while tf * 2 <= min(F, cap) and F % (tf * 2) == 0:
            tf *= 2
        return tf

    def __call__(self, tail, x):
        """Channel-major complex contract (ops/pfb interface)."""
        (yr, yi), new_tail = self.call_planes(tail, x)
        y = jnp.moveaxis(lax.complex(yr, yi), 0, -1)[None]  # (1, M, F)
        return y.astype(jnp.complex64), new_tail

    def call_planes(self, tail, x, native: bool = False):
        """Frame-major planes contract for fused back ends
        (kernels/demod_agc.py): -> ((yr, yi) each (F, M) f32, new_tail).

        ``native=True`` skips the (F, k1, k2) -> flat-channel untangle
        transpose (a full-rate data movement): column r then holds channel
        ``chan_perm[r]``, and the caller permutes its per-channel constant
        vectors instead — O(M) index work replacing an O(F*M) pass."""
        B, T = x.shape
        assert B == 1 and T % self.M == 0
        K, M = self.K, self.M
        F = T // M
        TF = self._pick_tf(F)
        grid = F // TF
        assert grid * TF == F
        if grid > self.MAX_GRID:  # sequential chunking, same state contract
            chunk_T = self.MAX_GRID * TF * M
            yrs, yis = [], []
            for t0 in range(0, T, chunk_T):
                (yr, yi), tail = self.call_planes(tail, x[:, t0: t0 + chunk_T],
                                                  native=native)
                yrs.append(yr)
                yis.append(yi)
            return (jnp.concatenate(yrs, axis=0),
                    jnp.concatenate(yis, axis=0)), tail

        M1, M2 = self.M1, self.M2
        # host-side 3D shaping: row-major (F, M) -> (F, M1, M2) is free and
        # keeps every kernel value at a full-lane minor dim (no in-kernel
        # reshapes — Mosaic rejects lane splits)
        xr = jnp.real(x[0]).reshape(F, M1, M2)
        xi = jnp.imag(x[0]).reshape(F, M1, M2)
        t2 = tail[0].reshape(K - 1, M1, M2)
        tl = jnp.stack([jnp.real(t2), jnp.imag(t2)]).astype(jnp.float32)

        kern = functools.partial(_kernel, TF, K, M1, M2, self._prec)
        c = lambda a: jnp.asarray(a)
        h3 = self._h.reshape(K, M1, M2)
        (_, _, bw1r, bw1i, twtr, twti, w2r, w2i) = batched_dft_consts(M, TF)
        yr, yi = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                pl.BlockSpec((2, K - 1, M1, M2), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((K, M1, M2), lambda i: (0, 0, 0)),
                pl.BlockSpec((TF, M1, M1), lambda i: (0, 0, 0)),
                pl.BlockSpec((TF, M1, M1), lambda i: (0, 0, 0)),
                pl.BlockSpec((M2, M2), lambda i: (0, 0)),
                pl.BlockSpec((M2, M2), lambda i: (0, 0)),
                pl.BlockSpec((1, M1, M2), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, M1, M2), lambda i: (0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                       pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((F, M1, M2), jnp.float32),
                       jax.ShapeDtypeStruct((F, M1, M2), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((K - 1, M1, M2), jnp.float32),
                            pltpu.VMEM((K - 1, M1, M2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),  # sequential: history
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * F * M * K  # polyphase MACs (x2 planes)
                + 8 * F * M * (self.M1 + self.M2),  # 8 real matmuls
                bytes_accessed=4 * F * M * 4,
                transcendentals=0,
            ),
        )(xr, xi, tl, c(h3), c(bw1r), c(bw1i),
          c(w2r), c(w2i), c(twtr), c(twti))

        # kernel emits (F, k1, k2); flat channel index is k = M1*k2 + k1
        if native:  # free row-major flatten: column r = channel chan_perm[r]
            yr = yr.reshape(F, M)
            yi = yi.reshape(F, M)
        else:
            yr = jnp.transpose(yr, (0, 2, 1)).reshape(F, M)
            yi = jnp.transpose(yi, (0, 2, 1)).reshape(F, M)
        new_tail = x[:, T - (K - 1) * M:] if T >= (K - 1) * M else (
            jnp.concatenate([tail, x], axis=-1)[:, -(K - 1) * M:])
        return (yr, yi), new_tail
