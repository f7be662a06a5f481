"""Pallas TPU kernel: the ENTIRE channelizer in one VMEM pass.

Composition of kernels/pfb_dft.py (polyphase accumulate + Cooley-Tukey MXU
DFT) and kernels/demod_agc.py (demod bank + attack/release AGC + waterfall
power), fused so the (F, M) channel planes never touch HBM at all: the
two-kernel r3 formulation wrote 67 MB of planes and immediately re-read
them (134 MB of HBM traffic per 8.4 M-sample block — more than the input
stream itself). Here each grid step polyphase-filters one frame tile,
DFTs it on the MXU, and demodulates it while it is still in registers;
HBM sees only the wideband input once and the audio/waterfall outputs.

Channel layout is the DFT's native (k1, k2) order throughout (see
pfb_dft.FusedPfbDft.chan_perm); per-channel constants arrive pre-permuted
from the chain (pipelines/channelizer.py _step_fused). Both carried states
(PFB frame history and the 7-row demod/AGC carry) live in VMEM scratch
across the sequential grid, seeded from block state at tile 0 — the same
streaming contract as the two separate kernels, so this kernel is a
drop-in for their composition (parity-tested in tests/test_channelizer.py
TestSinglePassChannelizer).

Reference analog: the FPGA runs DDC, channel filter, and AGC as ONE
hardware pipeline with no full-rate buffering between stages (SURVEY.md
§2.1 #1-#9); this is that design point on the TPU memory hierarchy.
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
                                          demod_pre_tables,
                                          release_decays_ok)
from radioframe.kernels.pfb_dft import (_dft_consts, batched_dft_consts,
                                        dft_tile, fused_channels_ok)
from radioframe.ops import demod as demod_op


def _kernel(TF, K, M1, M2, prec, grid, wf_avg,
            en_ssb, en_lsb, en_cw, en_am, en_nfm, alphas, dev_scale,
            apply_agc, emit_env,
            # inputs: PFB part
            xr_ref, xi_ref, tl_ref, h_ref,
            w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
            # inputs: demod part (native channel order, (1, M1, M2) each)
            mode_ref, cw_word_ref, cw_acc_ref, rel_ref, al_ref, tgt_ref,
            mg_ref, ltri_ref, atri_ref, dcol_ref, st_in_ref,
            pa_ref, pinv_ref, pc_ref, ps_ref,  # per-block precomputed tables
            # outputs, then scratch (env_ref present only under emit_env)
            audio_ref, wf_ref, st_out_ref, *rest):
    if emit_env:
        env_ref, hr_ref, hi_ref, carry_ref = rest
    else:
        env_ref, (hr_ref, hi_ref, carry_ref) = None, rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _seed():
        hr_ref[...] = tl_ref[0]
        hi_ref[...] = tl_ref[1]
        carry_ref[...] = st_in_ref[...]

    # ---- PFB: polyphase accumulation over K frame taps ------------------
    fr = jnp.concatenate([hr_ref[...], xr_ref[...]], axis=0)  # (TF+K-1, M1, M2)
    fi = jnp.concatenate([hi_ref[...], xi_ref[...]], axis=0)
    hr_ref[...] = fr[TF:]
    hi_ref[...] = fi[TF:]
    ur = jnp.zeros((TF, M1, M2), jnp.float32)
    ui = jnp.zeros((TF, M1, M2), jnp.float32)
    for t in range(K):
        w = h_ref[t][None]
        ur = ur + w * fr[K - 1 - t: K - 1 - t + TF]
        ui = ui + w * fi[K - 1 - t: K - 1 - t + TF]

    # ---- M-point DFT, Cooley-Tukey M1 x M2 in the MXU-efficient batched
    # orientation (pfb_dft.dft_tile, r5) -> native (TF, k1, k2) ------------
    yr, yi = dft_tile(prec, ur, ui, w1r_ref[...], w1i_ref[...],
                      twr_ref[...], twi_ref[...], w2r_ref[...], w2i_ref[...])

    # ---- demod bank + AGC + waterfall, straight from registers ----------
    out = demod_agc_tile(
        i, TF, wf_avg, en_ssb, en_lsb, en_cw, en_am, en_nfm, alphas,
        dev_scale, yr, yi, mode_ref[...], cw_word_ref[...], cw_acc_ref[...],
        rel_ref[...], al_ref[...], tgt_ref[...], mg_ref[...],
        ltri_ref, atri_ref, dcol_ref, carry_ref,
        pre=(pa_ref[...], pinv_ref[...], pc_ref[...], ps_ref[...]),
        apply_agc=apply_agc, emit_env=emit_env)
    audio_ref[...] = out[0]
    wf_ref[...] = out[1][None]
    if emit_env:
        env_ref[...] = out[2]

    @pl.when(i == grid - 1)
    def _emit_state():
        st_out_ref[...] = carry_ref[...]


class FusedChannelizerOne:
    """Single-pass channelizer: wideband planes -> native-order audio.

    (tail (1, (K-1)M) c64, x (1, T) c64, per-channel constants in NATIVE
    (k1, k2) order, st_in (7, M) native) ->
    (audio (F, M) f32 native, power (M,), wf_power (F/avg, M), st_out).
    Same streaming state contract as FusedPfbDft + FusedDemodAgc composed.
    """

    MAX_GRID = 256

    def __init__(self, num_channels: int, taps_per_channel: int,
                 fs_channel: float, nfm_deviation_hz: float,
                 wf_avg: int = 1, enabled=(0, 1, 2, 3, 4),
                 attack_alphas: tuple = (), window: str = "hamming",
                 interpret: bool = False, dft_precision: str = "highest",
                 apply_agc: bool = True, emit_env: bool = False):
        # apply_agc=False: demod-only variant for the TIME-SHARDED
        # single-pass channelizer (shard/channelizer.py) — each shard runs
        # PFB+DFT+demod on its local wideband slice for ALL M channels
        # (AM/NFM lookbacks seed exactly from the halo) and the AGC
        # release/attack/gain, whose carries cross shard boundaries, is
        # completed in XLA on the audio-rate output (demod_agc_tile doc).
        # emit_env=True (requires apply_agc=False, AM statically disabled):
        # the release env IS computed in-kernel (zero-entering when st_in
        # row 4 is zero) and returned as a 5th output, collapsing the
        # sharded AGC completion to one elementwise max (r5).
        from radioframe.ops.filter_design import pfb_prototype_taps

        self.M = int(num_channels)
        assert self.M & (self.M - 1) == 0, "fused channelizer needs pow2 M"
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
        self._prec = {"highest": lax.Precision.HIGHEST,
                      "b3": "b3"}[dft_precision]
        self.fs = float(fs_channel)
        self.dev_scale = float(fs_channel / (2.0 * np.pi * nfm_deviation_hz))
        self.wf_avg = max(1, int(wf_avg))
        # VMEM frame-tile cap: the union of both kernels' live sets (~20
        # (TF, M) f32 arrays at peak); 32 frames at M=4096 fits 32 MB
        self.max_tf = max(8, min(128, (32 * 4096) // self.M))
        if (self.wf_avg & (self.wf_avg - 1)) or self.wf_avg > self.max_tf:
            raise ValueError(
                f"waterfall_frame_avg={self.wf_avg} must be a power of two "
                f"<= {self.max_tf} at M={self.M} (single-pass kernel tile)")
        en = frozenset(map(int, enabled))
        assert demod_op.SAM not in en, "SAM needs the dense XLA bank"
        self.en = en
        self.attack_alphas = tuple(sorted({float(a) for a in attack_alphas
                                           if float(a) != 0.0}))
        self.apply_agc = bool(apply_agc)
        self.emit_env = bool(emit_env)
        if self.emit_env:
            # real errors, not asserts: these are CORRECTNESS gates (wrong
            # AGC on AM channels for shards d>0), like the M%128 gate above
            if self.apply_agc:
                raise ValueError("emit_env is a demod-only mode "
                                 "(requires apply_agc=False)")
            if demod_op.AM in en:
                raise ValueError(
                    "emit_env needs AM statically disabled: the AM "
                    "DC-block's cross-shard audio fixup lands AFTER the "
                    "in-kernel env would have latched |audio| "
                    "(demod_agc_tile doc)")
        self.interpret = interpret

    def release_ok(self, release_values) -> bool:
        """Same rescale-boundedness guard as FusedDemodAgc.release_ok."""
        return release_decays_ok(release_values, self.max_tf)

    def init_tail(self):
        return jnp.zeros((1, (self.K - 1) * self.M), dtype=jnp.complex64)

    def _pick_tf(self, F: int) -> int:
        tf = 1
        while tf * 2 <= min(F, self.max_tf) and F % (tf * 2) == 0:
            tf *= 2
        assert tf % self.wf_avg == 0, (tf, self.wf_avg)
        return tf

    def __call__(self, tail, x, mode, cw_word, cw_acc, rel, al, tgt, mg,
                 st_in):
        """All per-channel vectors in NATIVE order; x (1, T) complex."""
        return self.call_planes(tail, jnp.real(x[0]), jnp.imag(x[0]), mode,
                                cw_word, cw_acc, rel, al, tgt, mg, st_in)

    def call_planes(self, tail, wr, wi, mode, cw_word, cw_acc, rel, al, tgt,
                    mg, st_in):
        """Plane-input form: wr/wi (T,) f32 — the production interface (the
        ADC stream arrives as separate I/Q words, and interleaved complex64
        would cost two extra full-rate de/re-interleave passes here)."""
        T = wr.shape[-1]
        assert T % self.M == 0
        K, M, M1, M2 = self.K, self.M, self.M1, self.M2
        F = T // M
        TF = self._pick_tf(F)
        grid = F // TF
        if grid > self.MAX_GRID:  # sequential chunking, same state contract
            chunk_T = self.MAX_GRID * TF * M
            outs = []
            for t0 in range(0, T, chunk_T):
                res = self.call_planes(
                    tail, wr[t0: t0 + chunk_T], wi[t0: t0 + chunk_T], mode,
                    cw_word, cw_acc, rel, al, tgt, mg, st_in)
                pw, st_in = res[1], res[3]
                cw_acc = cw_acc + cw_word * jnp.int32(chunk_T // M)
                tail = jax.lax.complex(
                    wr[t0 + chunk_T - (K - 1) * M: t0 + chunk_T],
                    wi[t0 + chunk_T - (K - 1) * M: t0 + chunk_T])[None]
                outs.append(res)
            # power row 6 accumulates THROUGH st_in across chunks — the
            # final chunk's pw is already the whole-block total (and the
            # env carry row 4 chains through st_in, so chunked emit_env
            # stays exact)
            ret = (jnp.concatenate([o[0] for o in outs], axis=0), pw,
                   jnp.concatenate([o[2] for o in outs], axis=0), st_in)
            if self.emit_env:
                ret += (jnp.concatenate([o[4] for o in outs], axis=0),)
            return ret

        xr = wr.reshape(F, M1, M2)
        xi = wi.reshape(F, M1, M2)
        t2 = tail[0].reshape(K - 1, M1, M2)
        tl = jnp.stack([jnp.real(t2), jnp.imag(t2)]).astype(jnp.float32)
        ltri, atri, dcol = agc_prefix_consts(TF, self.attack_alphas)
        n_a = atri.shape[0]
        (_, _, bw1r, bw1i, twtr, twti, w2r, w2i) = \
            batched_dft_consts(M, TF)  # MXU-efficient DFT orientation (r5)
        # per-block tile-constant tables (see demod_agc_tile ``pre``): the
        # single-pass kernel is compute-bound, so the rel**f1 pow array and
        # the CW fine-tone trig arrays are paid ONCE here instead of per
        # grid step (grid recomputed them ~64x per block)
        pa, pinv, pc, ps = demod_pre_tables(
            TF, rel, cw_word, (M1, M2), demod_op.CW in self.en)

        en = self.en
        kern = functools.partial(
            _kernel, TF, K, M1, M2, self._prec, grid, self.wf_avg,
            demod_op.SSB in en, demod_op.LSB in en, demod_op.CW in en,
            demod_op.AM in en, demod_op.NFM in en, self.attack_alphas,
            self.dev_scale, self.apply_agc, self.emit_env)
        c = lambda a: jnp.asarray(a)
        h3 = self._h.reshape(K, M1, M2)
        cmap = lambda v, dt: jnp.asarray(v, dt).reshape(1, M1, M2)
        whole3 = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp))
        wf_block = TF // self.wf_avg
        audio, wf, st_out, *env = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                whole3((2, K - 1, M1, M2)),
                whole3((K, M1, M2)),
                whole3((TF, M1, M1)), whole3((TF, M1, M1)),
                whole3((M2, M2)), whole3((M2, M2)),
                whole3((1, M1, M2)), whole3((1, M1, M2)),
                whole3((1, M1, M2)), whole3((1, M1, M2)),
                whole3((1, M1, M2)), whole3((1, M1, M2)),
                whole3((1, M1, M2)), whole3((1, M1, M2)),
                whole3((1, M1, M2)),
                whole3((TF, TF)),
                whole3((n_a, TF, TF)),
                whole3((TF, 1 + len(self.attack_alphas))),
                whole3((7, M1, M2)),
                whole3((TF, M1, M2)), whole3((TF, M1, M2)),
                whole3((TF, M1, M2)), whole3((TF, M1, M2)),
            ],
            out_specs=[
                pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, wf_block, M1, M2), lambda i: (i, 0, 0, 0)),
                whole3((7, M1, M2)),
            ] + ([pl.BlockSpec((TF, M1, M2), lambda i: (i, 0, 0))]
                 if self.emit_env else []),
            out_shape=[
                jax.ShapeDtypeStruct((F, M1, M2), jnp.float32),
                jax.ShapeDtypeStruct((grid, wf_block, M1, M2), jnp.float32),
                jax.ShapeDtypeStruct((7, M1, M2), jnp.float32),
            ] + ([jax.ShapeDtypeStruct((F, M1, M2), jnp.float32)]
                 if self.emit_env else []),
            scratch_shapes=[pltpu.VMEM((K - 1, M1, M2), jnp.float32),
                            pltpu.VMEM((K - 1, M1, M2), jnp.float32),
                            pltpu.VMEM((7, M1, M2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),  # sequential: carries
                # 32 MB, NOT higher: raising the scoped limit to 100 MB
                # measured ~45% SLOWER on the bare PFB+DFT kernel (the
                # compiler trades double-buffering headroom for the bigger
                # budget) — tools/probe_pfbdft_stages.py, r5
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * F * M * K + 8 * F * M * (M1 + M2) + 40 * F * M,
                bytes_accessed=3 * F * M * 4,
                transcendentals=3 * F * M,
            ),
        )(xr, xi, tl, c(h3), c(bw1r), c(bw1i), c(w2r),
          c(w2i), c(twtr), c(twti),
          cmap(mode, jnp.int32), cmap(cw_word, jnp.int32),
          cmap(cw_acc, jnp.int32), cmap(rel, jnp.float32),
          cmap(al, jnp.float32), cmap(tgt, jnp.float32),
          cmap(mg, jnp.float32), c(ltri), c(atri), c(dcol),
          st_in.astype(jnp.float32).reshape(7, M1, M2), pa, pinv, pc, ps)

        audio = audio.reshape(F, M)
        wf = wf.reshape(F // self.wf_avg, M)
        st_out = st_out.reshape(7, M)
        if self.emit_env:
            return audio, st_out[6], wf, st_out, env[0].reshape(F, M)
        return audio, st_out[6], wf, st_out
