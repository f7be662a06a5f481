"""TxChain — the DUC transmit block program (SURVEY.md §3.3, the adjoint pass).

Reference analog: TX half of `[U:audio_processor.c]` (mic EQ/compressor ->
modulator) + the FPGA DUC (interpolating FIR/CIC -> TX NCO -> DAC). Here:

    (state, audio (C, Ta), freq_words (C,), mode (C,)) -> (state, iq (C, Ta*L))

- speech processor: DC block + compressor (fast-attack AGC toward a target)
- modulator bank: SSB (one-sided complex BPF via OLS), CW (audio as keying
  envelope), AM (1 + depth*audio), NFM (phase-integrator FM) — dense + masked
  like the RX demod bank
- interpolation stages: FirInterpolator (transposed conv), then mix up with
  the TX DDS NCO. Full duplex = RxChain.step and TxChain.step composed in one
  jitted program (pipelines/duplex.py, BASELINE.json config 4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from radioframe.core.config import TxConfig
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.ops import filter_design as FD
from radioframe.ops import nco
from radioframe.ops.interp import FirInterpolator
from radioframe.ops.ols import OverlapSave
from radioframe.ops.scans import affine_scan

TWO_PI = 2.0 * np.pi


class TxChain:
    def __init__(self, cfg: TxConfig):
        self.cfg = cfg
        mf = cfg.mode_filters
        self.ssb_bpf = OverlapSave(
            FD.complex_bandpass_taps(mf.numtaps, mf.ssb_lo, mf.ssb_hi, cfg.fs_audio),
            hop=512,
        )
        # interpolation plan: ints are FIR stages; CicStage entries are CIC
        # interpolators (FIR-equivalent block form). A FIR stage immediately
        # before a CIC gets inverse-sinc pre-compensation for the CIC's
        # passband droop — the FPGA DUC's comp-FIR folded in, mirror of the
        # RX side (SURVEY.md §2.1 #10).
        from radioframe.core.config import CicStage as _Cic
        from radioframe.ops.interp import cic_interpolator

        self.interps = []
        fs = cfg.fs_audio
        stages = tuple(cfg.interp_stages)
        for i, st in enumerate(stages):
            if isinstance(st, _Cic):
                self.interps.append(cic_interpolator(st.R, st.N, st.M))
                fs *= st.R
                continue
            L = int(st)
            fs_out = fs * L
            nxt = stages[i + 1] if i + 1 < len(stages) else None
            if isinstance(nxt, _Cic):
                taps = FD.compensated_interp_taps(
                    cfg.numtaps_per_stage, L, fs_out, 0.5 * cfg.fs_audio * 0.9,
                    cic_L=nxt.R, cic_N=nxt.N, cic_M=nxt.M)
            else:
                taps = FD.interp_taps(cfg.numtaps_per_stage, L, fs_out, 0.5 * fs * 0.9)
            self.interps.append(FirInterpolator(taps, L))
            fs = fs_out
        assert abs(fs - cfg.fs_out) < 1e-6, (fs, cfg.fs_out)
        self.comp_decay = agc_op.release_decay(cfg.compressor_release_s, cfg.fs_audio)
        # TX mic equalizer (reference TX EQ bands): peaking biquad cascade
        # run as 2x2 associative scans (ops/biquad.py)
        self.mic_eq = None
        if cfg.mic_eq_bands:
            from radioframe.ops.biquad import BiquadCascade

            self.mic_eq = BiquadCascade(FD.peaking_eq_sos(cfg.mic_eq_bands, cfg.fs_audio))
        # phase step per unit audio for NFM (rad/sample at audio rate)
        self.fm_k = TWO_PI * cfg.nfm_deviation_hz / cfg.fs_audio
        self.min_block = int(np.lcm(self.ssb_bpf.hop, 1))

    def init_state(self, num_channels: int | None = None):
        C = self.cfg.channels if num_channels is None else num_channels
        return {
            "dc": demod_op.dc_block_init(C),
            "eq": self.mic_eq.init_state(C) if self.mic_eq else (),
            "comp": agc_op.init_state(C),
            "ssb": self.ssb_bpf.init_state(C),
            "fm_phase": jnp.zeros((C,), jnp.float32),
            "interp": tuple(ip.init_state(C) for ip in self.interps),
            "nco": nco.init_state(C),
        }

    def step(self, state, audio, freq_words, mode):
        cfg = self.cfg
        C, Ta = audio.shape
        assert Ta % self.min_block == 0
        # --- speech processor: DC block + mic EQ + compressor ----------------
        a, dc_state = demod_op.dc_block(state["dc"], audio)
        eq_state = state.get("eq", ())
        if self.mic_eq is not None:
            a, eq_state = self.mic_eq(state["eq"], a)
        a, comp_env, _ = agc_op.apply(
            state["comp"], a, self.comp_decay,
            target=cfg.compressor_target, max_gain=cfg.compressor_max_gain)
        # --- modulator bank -------------------------------------------------
        ac = a.astype(jnp.complex64)
        y_ssb, ssb_tail = self.ssb_bpf(state["ssb"], ac)
        y_cw = jnp.clip(audio, 0.0, 1.0).astype(jnp.complex64)  # keying envelope
        y_am = (1.0 + cfg.am_depth * a).astype(jnp.complex64)
        # NFM: phase integrator as cumsum (affine scan a=1) with carried phase
        dphi = self.fm_k * a
        phase = affine_scan(jnp.ones_like(dphi), dphi, state["fm_phase"])
        y_nfm = jnp.exp(1j * phase.astype(jnp.float32)).astype(jnp.complex64)
        new_fm_phase = jnp.mod(phase[:, -1], jnp.float32(TWO_PI))
        # LSB = conj of the USB analytic signal (real audio mirror)
        stacked = jnp.stack([y_ssb, y_cw, y_am, y_nfm, jnp.conj(y_ssb)])  # (5, C, Ta)
        base = jnp.take_along_axis(stacked, mode[None, :, None].astype(jnp.int32), axis=0)[0]
        # --- interpolate to fs_out -----------------------------------------
        x = base
        interp_tails = []
        for ip, tail in zip(self.interps, state["interp"]):
            x, t = ip(tail, x)
            interp_tails.append(t)
        # --- TX NCO mix up --------------------------------------------------
        iq, nco_acc = nco.mix_up(x, freq_words, state["nco"])
        new_state = {
            "dc": dc_state,
            "eq": eq_state,
            "comp": comp_env,
            "ssb": ssb_tail,
            "fm_phase": new_fm_phase,
            "interp": tuple(interp_tails),
            "nco": nco_acc,
        }
        return new_state, iq
