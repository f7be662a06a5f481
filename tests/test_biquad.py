"""Biquad cascade (associative-scan IIR) vs scipy sosfilt."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import jrun, jwrap
from scipy import signal

from radioframe.ops.biquad import Biquad, BiquadCascade


def test_single_section_vs_scipy(rng):
    sos = signal.butter(2, 0.2, output="sos")  # one section
    bq = Biquad(sos[0, :3], sos[0, 3:])
    x = rng.standard_normal((3, 500)).astype(np.float32)
    y, _ = jrun(lambda x: bq(bq.init_state(3), x), x)
    for c in range(3):
        ref = signal.sosfilt(sos, x[c].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-4)


def test_cascade_vs_scipy(rng):
    sos = signal.butter(6, [0.05, 0.3], btype="band", output="sos")
    casc = BiquadCascade(sos)
    x = rng.standard_normal((2, 800)).astype(np.float32)
    y, _ = jrun(lambda x: casc(casc.init_state(2), x), x)
    for c in range(2):
        ref = signal.sosfilt(sos, x[c].astype(np.float64))
        np.testing.assert_allclose(np.asarray(y)[c], ref, atol=1e-3)


@pytest.mark.slow
def test_streaming_state(rng):
    sos = signal.butter(4, 0.1, output="sos")
    casc = BiquadCascade(sos)
    x = rng.standard_normal((1, 600)).astype(np.float32)
    whole, _ = jrun(lambda x: casc(casc.init_state(1), x), x)
    st = jrun(lambda: casc.init_state(1))
    step = jwrap(casc)
    outs = []
    for b in np.split(x, 3, axis=-1):
        y, st = step(st, b)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, -1), np.asarray(whole), atol=1e-5)


@pytest.mark.slow
class TestMicEq:
    """TX mic equalizer (reference TX EQ bands) wired through ops/biquad."""

    BANDS = ((300.0, -6.0, 1.0), (1200.0, 4.0, 1.2), (2400.0, 3.0, 1.5))

    def _tx(self, bands):
        from radioframe.core.config import TxConfig
        from radioframe.pipelines.tx_chain import TxChain

        # compressor neutralized (gain = min(1, 1e9/env) = 1) and no
        # interpolation (fs_out = fs_audio) so the EQ is the only
        # difference between the two chains at the output
        return TxChain(TxConfig(channels=2, mic_eq_bands=bands,
                                fs_out=48_000.0, interp_stages=(),
                                compressor_target=1e9, compressor_max_gain=1.0))

    def test_eq_matches_scipy_sosfilt(self, rng):
        """Chain-with-EQ == sosfilt(eq, chain-without) on the speech path."""
        from scipy import signal

        from radioframe.ops import demod as demod_op
        from radioframe.ops.filter_design import peaking_eq_sos

        audio = rng.standard_normal((2, 4 * 512)).astype(np.float32) * 0.3
        tx0, tx1 = self._tx(()), self._tx(self.BANDS)
        w = jnp.zeros((2,), jnp.int32)
        mode = jnp.asarray([demod_op.AM, demod_op.AM], jnp.int32)  # linear mod
        _, iq0 = jrun(lambda a: tx0.step(tx0.init_state(2), a, w, mode), audio)
        _, iq1 = jrun(lambda a: tx1.step(tx1.init_state(2), a, w, mode), audio)
        # AM: iq = 1 + depth*a -> recover the speech-path signal
        a0 = (np.real(np.asarray(iq0)) - 1.0) / 0.9
        a1 = (np.real(np.asarray(iq1)) - 1.0) / 0.9
        sos = peaking_eq_sos(self.BANDS, 48_000.0)
        want = signal.sosfilt(sos, a0, axis=-1)
        np.testing.assert_allclose(a1, want, atol=1e-4)

    @pytest.mark.slow
    def test_sharded_eq_matches_unsharded(self, rng):
        from radioframe.ops import demod as demod_op
        from radioframe.shard.tx import ShardedTxChain

        tx = self._tx(self.BANDS)
        mesh = jax.make_mesh((2, 4), ("channel", "time"), devices=jax.devices()[:8])
        sharded = ShardedTxChain(tx, mesh)
        audio = rng.standard_normal((2, 8 * 512)).astype(np.float32) * 0.3
        w = jnp.zeros((2,), jnp.int32)
        mode = jnp.asarray([demod_op.SSB, demod_op.NFM], jnp.int32)
        st_r, st_s = tx.init_state(2), tx.init_state(2)
        for _ in range(2):
            st_r, iq_r = jax.jit(tx.step)(st_r, jnp.asarray(audio), w, mode)
            st_s, iq_s = jax.jit(sharded.step)(st_s, jnp.asarray(audio), w, mode)
        np.testing.assert_allclose(np.asarray(iq_s), np.asarray(iq_r), atol=5e-4)
        for a, b in zip(st_s["eq"], st_r["eq"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestNfmDeemphasis:
    def test_deemph_matches_scipy_and_leaves_other_modes(self, rng):
        from scipy import signal

        from radioframe.core.config import RxConfig
        from radioframe.ops import demod as demod_op
        from radioframe.ops import nco
        from radioframe.ops.filter_design import deemphasis_sos
        from radioframe.pipelines.rx_chain import RxChain

        C = 4
        ch0 = RxChain(RxConfig(channels=C, ols_hop=512))
        ch1 = RxChain(RxConfig(channels=C, ols_hop=512, nfm_deemphasis_s=531e-6))
        T = 8 * ch0.min_block
        iq = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64)
        words = jnp.asarray(nco.freq_word(np.linspace(-50e3, 50e3, C), 192e3))
        mode = jnp.asarray([demod_op.SSB, demod_op.NFM, demod_op.AM, demod_op.NFM], jnp.int32)
        _, a0, _ = jrun(lambda iq: ch0.step(ch0.init_state(C), iq, words, mode), iq)
        _, a1, _ = jrun(lambda iq: ch1.step(ch1.init_state(C), iq, words, mode), iq)
        a0, a1 = np.asarray(a0), np.asarray(a1)
        sos = deemphasis_sos(531e-6, 48_000.0)
        for c, m in enumerate([0, 3, 2, 3]):
            if m == 3:  # NFM: de-emphasized
                want = signal.sosfilt(sos, a0[c])
                np.testing.assert_allclose(a1[c], want, atol=1e-4)
            else:  # other modes untouched
                np.testing.assert_array_equal(a1[c], a0[c])

    @pytest.mark.slow
    def test_sharded_deemph_matches_unsharded(self, rng):
        from radioframe.core.config import RxConfig
        from radioframe.ops import demod as demod_op
        from radioframe.ops import nco
        from radioframe.pipelines.rx_chain import RxChain
        from radioframe.shard.rx import ShardedRxChain

        C = 8
        chain = RxChain(RxConfig(channels=C, ols_hop=512, nfm_deemphasis_s=531e-6))
        mesh = jax.make_mesh((2, 4), ("channel", "time"), devices=jax.devices()[:8])
        sharded = ShardedRxChain(chain, mesh)
        T = 8 * chain.min_block
        iq = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64)
        words = jnp.asarray(nco.freq_word(np.linspace(-80e3, 80e3, C), 192e3))
        mode = jnp.asarray(np.arange(C) % 4, jnp.int32)
        st_r, st_s = chain.init_state(C), chain.init_state(C)
        for _ in range(2):
            st_r, a_r, _ = jax.jit(chain.step)(st_r, jnp.asarray(iq), words, mode)
            st_s, a_s, _ = jax.jit(sharded.step)(st_s, jnp.asarray(iq), words, mode)
        np.testing.assert_allclose(np.asarray(a_s)[:, 512:],
                                   np.asarray(a_r)[:, 512:], atol=2e-4)
        for a, b in zip(st_s["deemph"], st_r["deemph"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
