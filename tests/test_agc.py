"""Attack/release/hang AGC with per-mode constants (SURVEY.md §2.1 #8,
reference `[U:agc.c]` parity): golden-model agreement, streaming handoff,
hang/attack behavior, and sharded equality with per-mode profiles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import jrun, jwrap

from radioframe.core.config import DEFAULT_AGC_MODES, AgcConfig, RxConfig
from radioframe.golden import model as G
from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.ops import nco


class TestSlidingMax:
    @pytest.mark.parametrize("W", [1, 3, 16, 100, 257])
    def test_vs_naive(self, rng, W):
        C, T = 3, 200  # W may exceed T (streaming history case)
        xp = rng.standard_normal((C, T + W - 1)).astype(np.float32)
        got = np.asarray(jrun(lambda xp: agc_op.sliding_max(xp, T, W), xp))
        want = np.stack([[xp[c, t : t + W].max() for t in range(T)] for c in range(C)])
        np.testing.assert_array_equal(got, want)


class TestGoldenAgcFull:
    @pytest.mark.slow
    def test_streaming_matches_whole(self, rng):
        x = rng.standard_normal(400)
        whole, _, _ = G.agc_full(x, 0.99, attack_alpha=0.9, hang_samples=17)
        st = None
        outs = []
        for blk in np.split(x, 4):
            y, st, _ = G.agc_full(blk, 0.99, attack_alpha=0.9, hang_samples=17, state=st)
            outs.append(y)
        np.testing.assert_allclose(np.concatenate(outs), whole, rtol=1e-12)

    def test_reduces_to_simple_agc(self, rng):
        """attack=0, hang=0 is exactly the instant-attack/release model."""
        x = rng.standard_normal(300)
        a, _, _ = G.agc(x, 0.995, target=0.5)
        b, _, _ = G.agc_full(x, 0.995, attack_alpha=0.0, hang_samples=0, target=0.5)
        np.testing.assert_allclose(a, b, rtol=1e-12)


class TestAgcBank:
    def _bank(self, fs=1000.0):
        cfgs = (
            AgcConfig(release_s=0.2, attack_s=0.01, hang_s=0.05, target=0.5),   # SSB
            AgcConfig(release_s=0.1, attack_s=0.0, hang_s=0.0, target=1.0),     # CW
            AgcConfig(release_s=0.4, attack_s=0.02, hang_s=0.02, target=0.5),   # AM
            AgcConfig(),                                                        # NFM
            AgcConfig(release_s=0.2, attack_s=0.01, hang_s=0.05, target=0.5),   # LSB
            AgcConfig(release_s=0.4, attack_s=0.02, hang_s=0.02, target=0.5),   # SAM
        )
        return agc_op.AgcBank(cfgs, fs), cfgs

    def test_matches_golden_per_mode(self, rng):
        bank, cfgs = self._bank()
        C, T = 6, 500
        mode = np.arange(C, dtype=np.int32)  # one channel per mode
        x = rng.standard_normal((C, T)).astype(np.float32)
        y, _, gain = jrun(lambda x, m: bank.apply(bank.init_state(C), x, m),
                          x, mode)
        for c in range(C):
            k = mode[c]
            want, _, _ = G.agc_full(
                x[c].astype(np.float64), float(bank.release[k]), float(bank.alpha[k]),
                agc_op.hang_samples(cfgs[k].hang_s, 1000.0),
                float(bank.target[k]), float(bank.max_gain[k]))
            np.testing.assert_allclose(np.asarray(y)[c], want, atol=2e-5,
                                       err_msg=f"mode {k}")

    @pytest.mark.slow
    def test_streaming_matches_whole(self, rng):
        bank, _ = self._bank()
        C, T = 6, 600
        mode = jnp.asarray(np.arange(C) % 6, jnp.int32)
        x = rng.standard_normal((C, T)).astype(np.float32)
        whole, _, _ = jrun(lambda x, m: bank.apply(bank.init_state(C), x, m),
                           x, mode)
        st = jrun(lambda: bank.init_state(C))
        step = jwrap(bank.apply)
        outs = []
        for blk in np.split(x, 3, axis=-1):
            y, st, _ = step(st, blk, mode)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, -1), np.asarray(whole), atol=1e-6)

    def test_hang_holds_then_releases(self):
        """A peak is held flat for the hang time, then released exponentially."""
        fs = 1000.0
        bank = agc_op.AgcBank((AgcConfig(release_s=0.05, attack_s=0.0, hang_s=0.05),) * 6, fs)
        T = 300
        x = np.zeros((1, T), np.float32)
        x[0, 10] = 1.0
        mode = np.zeros((1,), np.int32)
        _, _, gain = jrun(lambda x, m: bank.apply(bank.init_state(1), x, m),
                          x, mode)
        g = np.asarray(gain)[0]
        hang = agc_op.hang_samples(0.05, fs)  # 50 samples
        # flat during the hang window after the peak
        np.testing.assert_allclose(g[10 : 10 + hang + 1], g[10], rtol=1e-6)
        # releasing afterwards: gain recovers strictly
        assert g[10 + hang + 20] > g[10 + hang] * 1.2

    def test_attack_time_constant(self):
        """After a step up, the envelope rises with the attack time constant."""
        fs = 1000.0
        attack_s = 0.02
        bank = agc_op.AgcBank((AgcConfig(release_s=1.0, attack_s=attack_s, hang_s=0.0,
                                         target=1.0, max_gain=100.0),) * 6, fs)
        T = 400
        x = np.full((1, T), 0.01, np.float32)
        x[0, 200:] = 1.0
        mode = np.zeros((1,), np.int32)
        _, _, gain = jrun(lambda x, m: bank.apply(bank.init_state(1), x, m),
                          x, mode)
        g = np.asarray(gain)[0]
        # instant attack would snap gain to ~1 at the step sample; with
        # attack smoothing it is still far above its settled value there
        assert g[200] > 5.0 * g[-1]
        # after one time constant the envelope has covered ~63% of the step
        n_tau = int(attack_s * fs)
        env = 1.0 / g  # target=1
        frac = (env[200 + n_tau] - env[199]) / (1.0 - env[199])
        assert 0.5 < frac < 0.75, frac


@pytest.mark.slow
class TestShardedPerModeAgc:
    def test_sharded_matches_unsharded_with_agc_modes(self, rng):
        """Full RX chain with DEFAULT_AGC_MODES: (2,4) mesh == unsharded.

        Exercises the hang-halo (hist_len=960 <= T_loc=1024), the
        per-channel release/attack cross-shard scans, and per-mode gather."""
        from radioframe.pipelines.rx_chain import RxChain
        from radioframe.shard.rx import ShardedRxChain

        C = 8
        cfg = RxConfig(channels=C, ols_hop=512, agc_modes=DEFAULT_AGC_MODES)
        chain = RxChain(cfg)
        assert chain.agc_bank.hist_len == 960
        mesh = jax.make_mesh((2, 4), ("channel", "time"), devices=jax.devices()[:8])
        sharded = ShardedRxChain(chain, mesh)
        T = 8 * chain.min_block
        iq = (rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64)
        words = jnp.asarray(nco.freq_word(np.linspace(-80e3, 80e3, C), 192e3))
        mode = jnp.asarray(np.arange(C) % 6, jnp.int32)
        st_r, st_s = chain.init_state(C), chain.init_state(C)
        step_r, step_s = jax.jit(chain.step), jax.jit(sharded.step)
        for _ in range(2):  # second block exercises hist carry handoff
            iq_b = jnp.asarray(iq)
            st_r, a_r, _ = step_r(st_r, iq_b, words, mode)
            st_s, a_s, _ = step_s(st_s, iq_b, words, mode)
        np.testing.assert_allclose(np.asarray(a_s)[:, 512:],
                                   np.asarray(a_r)[:, 512:], atol=2e-4)
        for name in ("env", "lpf", "hist"):
            np.testing.assert_allclose(np.asarray(st_s["agc"][name]),
                                       np.asarray(st_r["agc"][name]),
                                       atol=2e-4, err_msg=f"agc.{name}")
