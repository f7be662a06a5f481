"""Config 4: DUC transmit chain + full duplex.

Interpolator vs golden; TX->RX loopback: a TxChain SSB/AM/NFM signal fed
into RxChain must demodulate back to the input audio (the adjoint-pair
property that replaces on-air testing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import jrun, jwrap

from radioframe.core.config import RxConfig, TxConfig
from radioframe.diag.metrics import audio_snr_db
from radioframe.golden import model as G
from radioframe.io import fixtures as FX
from radioframe.ops import demod as demod_op
from radioframe.ops import filter_design as FD
from radioframe.ops import nco
from radioframe.ops.interp import FirInterpolator
from radioframe.pipelines.duplex import DuplexChain

FS_IQ, FS_AUDIO = 192_000.0, 48_000.0


class TestInterpolator:
    def test_vs_golden(self, rng):
        L = 4
        taps = FD.interp_taps(64 * L + 1, L, FS_IQ, 3000.0)
        op = FirInterpolator(taps, L)
        x = (rng.standard_normal((2, 256)) + 1j * rng.standard_normal((2, 256))).astype(np.complex64)
        y, _ = jrun(lambda x: op(op.init_state(2), x), x)
        for c in range(2):
            ref, _ = G.interpolate(x[c].astype(np.complex128), L, taps)
            np.testing.assert_allclose(np.asarray(y)[c], ref[: y.shape[-1]], atol=1e-4)

    def test_streaming(self, rng):
        L = 3
        taps = FD.interp_taps(97, L, 144_000.0, 3000.0)
        op = FirInterpolator(taps, L)
        x = (rng.standard_normal((1, 300)) + 1j * rng.standard_normal((1, 300))).astype(np.complex64)
        whole, _ = jrun(lambda x: op(op.init_state(1), x), x)
        st = jrun(lambda: op.init_state(1))
        step = jwrap(op)
        outs = []
        for blk in np.split(x, 3, axis=-1):
            y, st = step(st, blk)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=-1), np.asarray(whole), atol=1e-5)


class TestDuplexLoopback:
    def _loopback(self, mode_name, audio, tx_off, rx_off, neutral_agc=False):
        """TX at +tx_off, receive at rx_off; returns demodulated audio."""
        C = 1
        from radioframe.core.config import AgcConfig

        # transparent compressor: scoring vs original audio, so no dynamics
        agc = AgcConfig(target=1e9, max_gain=1.0) if neutral_agc else AgcConfig()
        dpx = DuplexChain(RxConfig(channels=C, agc=agc),
                          TxConfig(channels=C, compressor_max_gain=1.0))
        Ta = audio.shape[-1]
        tx_words = jnp.asarray([nco.freq_word(tx_off, FS_IQ)], jnp.int32)
        rx_words = jnp.asarray([nco.freq_word(rx_off, FS_IQ)], jnp.int32)
        m = jnp.asarray([demod_op.MODE_NAMES[mode_name]], jnp.int32)
        step = jwrap(dpx.step)
        st = jrun(lambda: dpx.init_state(C))
        # first pass: transmit (rx input zeros), then feed tx_iq back into rx
        zeros_iq = np.zeros((C, Ta * 4), np.complex64)
        st, _, tx_iq, _ = step(st, zeros_iq, audio[None, :].astype(np.float32),
                               rx_words, m, tx_words, m)
        st2 = jrun(lambda: dpx.init_state(C))
        st2, rx_audio, _, _ = step(st2, tx_iq, np.zeros((C, Ta), np.float32),
                                   rx_words, m, tx_words, m)
        return np.asarray(rx_audio)[0]

    def test_ssb_loopback(self):
        n = 96 * 2048 // 4  # audio samples
        audio = FX.voicelike_audio(FS_AUDIO, n)
        out = self._loopback("ssb", audio, 25_000.0, 25_000.0, neutral_agc=True)
        # reference = audio through the TX and RX SSB bandpass (band-edge
        # energy of the voice-band noise is removed twice, by design)
        bpf = FD.complex_bandpass_taps(513, 300.0, 2700.0, FS_AUDIO)  # match chain ModeFilters.numtaps
        ref, _ = G.ols_filter(audio.astype(np.complex128), bpf)
        ref, _ = G.ols_filter(ref, bpf)
        ref = 4.0 * np.real(ref)
        settle = 16 * 1024
        snr = audio_snr_db(ref[settle:], out[settle:], trim=1024)
        assert snr > 25.0, f"SSB loopback SNR {snr:.1f} dB"

    @pytest.mark.slow
    def test_am_loopback(self):
        n = 96 * 2048 // 4
        t = np.arange(n) / FS_AUDIO
        audio = (0.6 * np.sin(2 * np.pi * 600.0 * t)).astype(np.float32)
        out = self._loopback("am", audio, -30_000.0, -30_000.0)
        settle = 16 * 1024
        snr = audio_snr_db(audio[settle:], out[settle:], trim=1024)
        assert snr > 15.0, f"AM loopback SNR {snr:.1f} dB"

    @pytest.mark.slow
    def test_nfm_loopback(self):
        n = 96 * 2048 // 4
        t = np.arange(n) / FS_AUDIO
        audio = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        out = self._loopback("nfm", audio, 40_000.0, 40_000.0)
        settle = 16 * 1024
        snr = audio_snr_db(audio[settle:], out[settle:], trim=1024)
        assert snr > 15.0, f"NFM loopback SNR {snr:.1f} dB"
