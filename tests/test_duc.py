"""ADC-rate DUC (SURVEY.md §2.1 #10): CIC interpolator op, the 61.44 Msps
TX preset (adjoint of the adc_61m44 RX plan), and its sharded version."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import jrun, jwrap

from radioframe.core import presets
from radioframe.core.config import CicStage, TxConfig
from radioframe.golden import model as G
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.ops.interp import cic_interpolator
from radioframe.pipelines.tx_chain import TxChain


class TestCicInterpolator:
    def test_vs_golden(self, rng):
        L, N = 8, 3
        op = cic_interpolator(L, N)
        x = (rng.standard_normal((1, 96)) + 1j * rng.standard_normal((1, 96))).astype(np.complex64)
        y, _ = jrun(lambda x: op(op.init_state(1), x), x)
        taps = np.asarray(op._w).reshape(-1)[: op.Lh]
        want, _ = G.interpolate(x[0].astype(np.complex128), L, taps)
        np.testing.assert_allclose(np.asarray(y)[0], want, atol=1e-5)

    def test_streaming(self, rng):
        L, N = 4, 4
        op = cic_interpolator(L, N)
        x = (rng.standard_normal((2, 120)) + 1j * rng.standard_normal((2, 120))).astype(np.complex64)
        whole, _ = jrun(lambda x: op(op.init_state(2), x), x)
        st = jrun(lambda: op.init_state(2))
        step = jwrap(op)
        outs = []
        for blk in np.split(x, 3, axis=-1):
            y, st = step(st, blk)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, -1), np.asarray(whole), atol=1e-5)

    def test_dc_gain_is_L(self):
        """A constant baseband keeps its amplitude at the DAC rate."""
        L = 16
        op = cic_interpolator(L, 4)
        x = np.ones((1, 64), np.complex64)
        y, _ = jrun(lambda x: op(op.init_state(1), x), x)
        # steady state (past the filter warm-up)
        np.testing.assert_allclose(np.abs(np.asarray(y)[0, 256:]), 1.0, rtol=1e-5)


class TestAdcRateDuc:
    def _tx(self, C=1):
        return TxChain(presets.tx_adc_61m44(channels=C, compressor_max_gain=1.0))

    def test_plan(self):
        tx = self._tx()
        assert tx.cfg.interp == 1280
        assert abs(tx.cfg.fs_out - 61_440_000.0) < 1e-6
        assert len(tx.interps) == 3

    def test_ssb_tone_spectrum_at_dac_rate(self):
        """1 kHz SSB audio -> a clean carrier at f_tx + 1 kHz at 61.44 Msps;
        interpolation images (offsets of the 48k/240k/1.92M stage rates)
        suppressed > 40 dBc."""
        tx = self._tx()
        fs_a, fs_out = 48_000.0, 61_440_000.0
        Ta = 4096
        t = np.arange(Ta) / fs_a
        audio = (0.7 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        f_tx = 12_345_000.0
        w = jnp.asarray([nco.freq_word(f_tx, fs_out)], jnp.int32)
        mode = jnp.asarray([demod_op.SSB], jnp.int32)
        st = jrun(lambda: tx.init_state(1))
        # two blocks: score the second (filters settled)
        step = jwrap(tx.step)
        st, _ = step(st, audio[None, :], w, mode)
        st, iq = step(st, audio[None, :], w, mode)
        X = np.fft.fft(np.asarray(iq)[0] * np.hanning(Ta * 1280))
        f = np.fft.fftfreq(Ta * 1280, 1.0 / fs_out)
        p = np.abs(X) ** 2
        k = int(np.argmax(p))
        f_want = nco.word_to_freq(int(np.asarray(w)[0]), fs_out) + 1000.0
        assert abs(f[k] - f_want) < 30.0, (f[k], f_want)
        # spurious: everything further than 5 kHz from the carrier
        spur = p[np.abs(f - f[k]) > 5_000.0].max()
        assert 10 * np.log10(p[k] / spur) > 40.0, 10 * np.log10(p[k] / spur)

    @pytest.mark.slow
    def test_streaming_matches_oneshot(self, rng):
        tx = self._tx(C=2)
        Ta = 2 * 512
        audio = rng.standard_normal((2, 2 * Ta)).astype(np.float32) * 0.3
        w = jnp.asarray(nco.freq_word([1e6, -3e6], tx.cfg.fs_out))
        mode = jnp.asarray([demod_op.SSB, demod_op.NFM], jnp.int32)
        _, whole = jrun(lambda a: tx.step(tx.init_state(2), a, w, mode), audio)
        st = jrun(lambda: tx.init_state(2))
        step = jwrap(tx.step)
        outs = []
        for blk in np.split(audio, 2, axis=-1):
            st, y = step(st, blk, w, mode)
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, np.asarray(whole), atol=2e-4)

    @pytest.mark.slow
    def test_sharded_matches_unsharded_at_adc_rate(self, rng):
        """Time+channel-sharded ADC-rate DUC == unsharded (config 4 at rate)."""
        from radioframe.shard.tx import ShardedTxChain

        C = 4
        tx = self._tx(C=C)
        mesh = jax.make_mesh((2, 4), ("channel", "time"), devices=jax.devices()[:8])
        sharded = ShardedTxChain(tx, mesh)
        Ta = 4 * 512  # 4 x hop per time shard
        audio = rng.standard_normal((C, Ta)).astype(np.float32) * 0.3
        w = jnp.asarray(nco.freq_word(np.linspace(-20e6, 20e6, C), tx.cfg.fs_out))
        mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
        st_r, st_s = tx.init_state(C), tx.init_state(C)
        step_r, step_s = jax.jit(tx.step), jax.jit(sharded.step)
        for _ in range(2):  # second block exercises carry handoff
            st_r, iq_r = step_r(st_r, jnp.asarray(audio), w, mode)
            st_s, iq_s = step_s(st_s, jnp.asarray(audio), w, mode)
        np.testing.assert_allclose(np.asarray(iq_s), np.asarray(iq_r), atol=5e-4)
        np.testing.assert_array_equal(np.asarray(st_s["nco"]), np.asarray(st_r["nco"]))
