"""Config 5 core: PFB channelizer op, pipeline, and pod-sharded version."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import FUSED_M, FUSED_M_SMALL, jrun, jwrap

from radioframe.diag.metrics import audio_snr_db
from radioframe.golden import model as G
from radioframe.ops import demod as demod_op
from radioframe.ops import filter_design as FD
from radioframe.ops.pfb import PfbChannelizer
from radioframe.pipelines.channelizer import ChannelizerChain, ChannelizerConfig
from radioframe.shard.channelizer import ShardedChannelizer

# kernel tests: interpret on the CPU mesh, COMPILED for real under
# RADIOFRAME_TEST_TPU=1 (SURVEY 4.2 #5: same tests run unmodified on TPU)
_INTERP = jax.default_backend() == "cpu"


def _wideband(rng, T):
    return (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(np.complex64)


class TestPfbOp:
    def test_vs_golden(self, rng):
        M, K = 16, 8
        op = PfbChannelizer(M, K)
        x = _wideband(rng, 64 * M)
        y, _ = jrun(lambda x: op(op.init_state(1), x), x[None, :])
        proto = FD.pfb_prototype_taps(M, K)
        ref = G.pfb_channelize(x.astype(np.complex128), M, proto)  # (F, M)
        np.testing.assert_allclose(np.asarray(y)[0], ref.T, atol=1e-4)

    def test_streaming(self, rng):
        M, K = 8, 4
        op = PfbChannelizer(M, K)
        x = _wideband(rng, 96 * M)
        whole, _ = jrun(lambda x: op(op.init_state(1), x), x[None, :])
        st = jrun(lambda: op.init_state(1))
        step = jwrap(op)
        outs = []
        for blk in np.split(x, 3):
            y, st = step(st, blk[None, :])
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, np.asarray(whole), atol=1e-5)

    def test_tone_channel_isolation(self, rng):
        M, K = 32, 8
        op = PfbChannelizer(M, K)
        fs = 32_000.0
        c = 11
        t = np.arange(64 * M) / fs
        x = np.exp(2j * np.pi * (c * fs / M) * t).astype(np.complex64)
        y, _ = jrun(lambda x: op(op.init_state(1), x), x[None, :])
        p = np.mean(np.abs(np.asarray(y)[0][:, K:]) ** 2, axis=-1)
        assert np.argmax(p) == c
        assert 10 * np.log10(p[c] / np.delete(p, c).max()) > 30.0


class TestChannelizerChain:
    def test_am_channel_demod(self):
        """AM signal at channel 37's center -> channel 37 demods the tone."""
        M = 64
        cfg = ChannelizerConfig(fs_in=64_000.0 * M, num_channels=M,
                                emit_spectrum=True, spectrum_nfft=1024)
        chain = ChannelizerChain(cfg)
        fs_ch = cfg.fs_channel  # 64 kHz
        F = 4096  # frames (channel-rate samples)
        T = F * M
        tt = np.arange(F) / fs_ch
        tone = 0.7 * np.sin(2 * np.pi * 1000.0 * tt)
        base = (1.0 + 0.8 * tone).astype(np.complex128)
        # upconvert the AM baseband to channel 37's center at wideband rate
        n = np.arange(T) / cfg.fs_in
        up = np.repeat(base, M)  # crude ZOH interpolation is fine within a channel
        wide = (up * np.exp(2j * np.pi * (37 * fs_ch) * n)).astype(np.complex64)
        mode = jnp.full((M,), demod_op.AM, jnp.int32)
        st = jrun(chain.init_state)
        st, audio, aux = jwrap(chain.step)(st, wide, mode)
        audio = np.asarray(audio)
        # channel 37 carries the tone
        snr = audio_snr_db(tone[512:], audio[37][512:], trim=128)
        assert snr > 15.0, f"channelized AM SNR {snr:.1f} dB"
        # channel power concentrated at 37
        cp = np.asarray(aux["channel_power"])
        assert np.argmax(cp) == 37
        assert aux["waterfall"].shape[-1] == 1024


class TestShardedChannelizer:
    @pytest.mark.parametrize("D", [2, 8])
    def test_matches_unsharded(self, rng, D):
        M = 64
        cfg = ChannelizerConfig(fs_in=64_000.0 * M, num_channels=M,
                                emit_spectrum=True, spectrum_nfft=512)
        chain = ChannelizerChain(cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        T = D * 16 * chain.min_block // 8
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)

        st = jrun(chain.init_state)
        ref_st, ref_audio, ref_aux = jwrap(chain.step)(st, wide, mode)
        st2 = jrun(chain.init_state)
        got_st, got_audio, got_aux = jwrap(sharded.step)(st2, wide, mode)
        # skip the PFB warm-up (K-1 = 7 frames): near-zero partial-conv
        # output there makes NFM's arctan2 ill-conditioned under CPU-mesh
        # fp nondeterminism (see tests/test_sharded.py WARMUP note)
        W = chain.pfb.K
        np.testing.assert_allclose(np.asarray(got_audio)[:, W:],
                                   np.asarray(ref_audio)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_aux["waterfall"]),
                                   np.asarray(ref_aux["waterfall"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(got_st["agc"]["env"]),
                                   np.asarray(ref_st["agc"]["env"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_st["pfb"]), np.asarray(ref_st["pfb"]),
                                   atol=1e-5)

    @pytest.mark.slow
    def test_config5_full_scale_4096_channels(self, rng):
        """BASELINE config 5 at its TRUE scale: M=4096 channels on the
        8-device mesh, sharded == unsharded, plus per-channel AGC/demod and
        the wideband waterfall. Minimum legal block (T = 8 shards x 32768;
        halo (K-1)*M = 28672 <= T_loc = 32768)."""
        M, D = 4096, 8
        cfg = ChannelizerConfig(fs_in=61_440_000.0, num_channels=M,
                                emit_spectrum=True, spectrum_nfft=4096)
        chain = ChannelizerChain(cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        T = D * chain.min_block  # 262144 wideband samples, F=64 frames/channel
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 6, jnp.int32)  # all six modes in play

        st = jrun(chain.init_state)
        ref_st, ref_audio, ref_aux = jwrap(chain.step)(st, wide, mode)
        st2 = jrun(chain.init_state)
        got_st, got_audio, got_aux = jwrap(sharded.step)(st2, wide, mode)
        assert got_audio.shape == (M, T // M)
        W = chain.pfb.K  # PFB warm-up frames (see note above)
        np.testing.assert_allclose(np.asarray(got_audio)[:, W:],
                                   np.asarray(ref_audio)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_aux["channel_power"]),
                                   np.asarray(ref_aux["channel_power"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_aux["waterfall"]),
                                   np.asarray(ref_aux["waterfall"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(got_st["agc"]["env"]),
                                   np.asarray(ref_st["agc"]["env"]), atol=2e-4)

    def test_sharded_streaming(self, rng):
        """Multi-block streaming: pfb/demod/AGC carry handoff AND the EMA
        waterfall's cross-shard affine-scan completion, sharded == unsharded
        (VERDICT r2 ask #8)."""
        M, D = 32, 4
        cfg = ChannelizerConfig(fs_in=32_000.0 * M, num_channels=M,
                                emit_spectrum=True, spectrum_nfft=256,
                                spectrum_avg=0.7)
        chain = ChannelizerChain(cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        T = D * 2 * chain.min_block
        wide = _wideband(rng, 2 * T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)

        st = jrun(chain.init_state)
        ref, ref_wf = [], []
        step = jwrap(chain.step)
        for b in np.split(wide, 2):
            st, a, aux = step(st, b, mode)
            ref.append(np.asarray(a))
            ref_wf.append(np.asarray(aux["waterfall"]))
        ref_st = st
        ref = np.concatenate(ref, axis=-1)
        st = jrun(chain.init_state)
        got, got_wf = [], []
        sstep = jwrap(sharded.step)
        for b in np.split(wide, 2):
            st, a, aux = sstep(st, b, mode)
            got.append(np.asarray(a))
            got_wf.append(np.asarray(aux["waterfall"]))
        got = np.concatenate(got, axis=-1)
        W = chain.pfb.K  # PFB warm-up frames (see note above)
        np.testing.assert_allclose(got[:, W:], ref[:, W:], atol=2e-4)
        # EMA waterfall lines agree across the stream (block 2 depends on
        # block 1's carried EMA state — the handoff under sharding)
        np.testing.assert_allclose(np.concatenate(got_wf),
                                   np.concatenate(ref_wf), atol=1e-2)
        # end-of-stream state parity: every carried leaf
        np.testing.assert_allclose(np.asarray(st["pfb"]),
                                   np.asarray(ref_st["pfb"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(st["spec"]),
                                   np.asarray(ref_st["spec"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(st["agc"]["env"]),
                                   np.asarray(ref_st["agc"]["env"]), atol=2e-4)


class TestPfbWaterfall:
    """waterfall_from_pfb: the PFB output IS the panorama (prototype-windowed
    periodogram); lines must localize tones correctly and shard exactly."""

    def test_tone_lands_in_its_bin(self, rng):
        M = 64
        cfg = ChannelizerConfig(fs_in=64_000.0 * M, num_channels=M,
                                emit_spectrum=True, waterfall_from_pfb=True,
                                waterfall_frame_avg=4)
        chain = ChannelizerChain(cfg)
        T = 8 * chain.min_block
        c = 11  # tone centered on channel 11 (+c*fs/M)
        t = np.arange(T) / cfg.fs_in
        wide = (np.exp(2j * np.pi * (c * cfg.fs_in / M) * t)
                + 0.01 * _wideband(rng, T)).astype(np.complex64)
        st = jrun(chain.init_state)
        assert st["spec"] == ()  # stateless waterfall: no dead leaf
        _, _, aux = jwrap(chain.step)(st, wide, 
                                        jnp.zeros((M,), jnp.int32))
        wf = np.asarray(aux["waterfall"])  # (F/avg, M) dB, low..high
        assert wf.shape == (T // M // 4, M)
        # lines are fftshift-rolled: channel c sits at column M//2 + c
        peak_col = int(np.argmax(wf[-1]))
        assert peak_col == (M // 2 + c) % M, (peak_col, M // 2 + c)
        assert wf[-1, peak_col] - np.median(wf[-1]) > 20.0  # tone >> floor

    def test_sharded_matches_unsharded(self, rng):
        M, D = 64, 4
        cfg = ChannelizerConfig(fs_in=64_000.0 * M, num_channels=M,
                                emit_spectrum=True, waterfall_from_pfb=True,
                                waterfall_frame_avg=4)
        chain = ChannelizerChain(cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        T = D * 2 * chain.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st = jrun(chain.init_state)
        _, ref_audio, ref_aux = jwrap(chain.step)(st, wide, mode)
        st2 = jrun(chain.init_state)
        _, got_audio, got_aux = jwrap(sharded.step)(st2, wide, mode)
        W = chain.pfb.K
        np.testing.assert_allclose(np.asarray(got_audio)[:, W:],
                                   np.asarray(ref_audio)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_aux["waterfall"]),
                                   np.asarray(ref_aux["waterfall"]), atol=1e-2)


class TestEnabledModes:
    def test_subset_matches_full_bank(self, rng):
        """Static mode-subset gating: channels using enabled modes produce
        identical audio to the full bank; disabled-mode states pass through."""
        M = 32
        full = ChannelizerConfig(fs_in=32_000.0 * M, num_channels=M,
                                 emit_spectrum=False)
        sub = ChannelizerConfig(fs_in=32_000.0 * M, num_channels=M,
                                emit_spectrum=False,
                                enabled_modes=(0, 1, 2, 3))
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)  # only modes 0-3 used
        wide = _wideband(rng, 4 * ChannelizerChain(full).min_block)
        outs = []
        for cfg in (full, sub):
            chain = ChannelizerChain(cfg)
            st = jrun(chain.init_state)
            st, audio, _ = jwrap(chain.step)(st, wide, mode)
            outs.append((np.asarray(audio), st))
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        # disabled SAM's state untouched in the subset chain
        np.testing.assert_array_equal(
            np.asarray(outs[1][1]["demod"]["sam_carrier"]),
            np.zeros((2, M), np.float32))


class TestFusedPfbDft:
    """kernels/pfb_dft.py == ops/pfb.py (interpret mode on the CPU mesh)."""

    def test_matches_xla_pfb(self, rng):
        from radioframe.kernels.pfb_dft import FusedPfbDft

        M, K = FUSED_M, 8
        ref_op = PfbChannelizer(M, K)
        fus = FusedPfbDft(M, K, interpret=_INTERP)
        x = _wideband(rng, 32 * M)
        yr, _ = jrun(lambda x: ref_op(ref_op.init_state(1), x), x[None, :])
        yf, _ = jrun(lambda x: fus(fus.init_state(1), x), x[None, :])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   atol=2e-4, rtol=1e-4)

    def test_streaming_matches(self, rng):
        from radioframe.kernels.pfb_dft import FusedPfbDft

        M, K = FUSED_M_SMALL, 8
        ref_op = PfbChannelizer(M, K)
        fus = FusedPfbDft(M, K, interpret=_INTERP)
        x = _wideband(rng, 96 * M)
        whole, _ = jrun(lambda x: ref_op(ref_op.init_state(1), x), x[None, :])
        st = jrun(lambda: fus.init_state(1))
        step = jwrap(fus)
        outs = []
        for blk in np.split(x, 3):
            y, st = step(st, blk[None, :])
            outs.append(np.asarray(y))
        got = np.concatenate(outs, axis=-1)
        np.testing.assert_allclose(got, np.asarray(whole), atol=2e-4, rtol=1e-4)

    def test_chain_with_fused_pfb(self, rng):
        M = FUSED_M
        base = dict(fs_in=64_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=4)
        ref_chain = ChannelizerChain(ChannelizerConfig(**base))
        fus_chain = ChannelizerChain(ChannelizerConfig(**base, fuse_pfb=True))
        T = 4 * ref_chain.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st = jrun(ref_chain.init_state)
        _, ref_audio, ref_aux = jwrap(ref_chain.step)(st, wide, mode)
        st2 = jrun(fus_chain.init_state)
        _, got_audio, got_aux = jwrap(fus_chain.step)(st2, wide, mode)
        W = ref_chain.pfb.K
        np.testing.assert_allclose(np.asarray(got_audio)[:, W:],
                                   np.asarray(ref_audio)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(got_aux["waterfall"]),
                                   np.asarray(ref_aux["waterfall"]), atol=1e-2)

    def test_sharded_with_fused_pfb(self, rng):
        """Fused PFB kernel inside shard_map (interpret on the CPU mesh):
        sharded == unsharded, halo through the same tail contract."""
        M, D = 64, 4
        cfg = ChannelizerConfig(fs_in=64_000.0 * M, num_channels=M,
                                emit_spectrum=False, fuse_pfb=True)
        chain = ChannelizerChain(cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        T = D * 2 * chain.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st = jrun(chain.init_state)
        _, ref_audio, _ = jwrap(chain.step)(st, wide, mode)
        st2 = jrun(chain.init_state)
        _, got_audio, _ = jwrap(sharded.step)(st2, wide, mode)
        W = chain.pfb.K
        np.testing.assert_allclose(np.asarray(got_audio)[:, W:],
                                   np.asarray(ref_audio)[:, W:], atol=2e-4)


class TestFusedDemodAgc:
    """kernels/demod_agc.py fully-kernelized back end == dense XLA path
    (interpret mode on CPU): audio, waterfall, channel power, all states."""

    def _cfgs(self, M):
        base = dict(fs_in=64_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=4,
                    fuse_pfb=True, enabled_modes=(0, 1, 2, 3))
        return (ChannelizerConfig(**base),
                ChannelizerConfig(**base, fuse_demod=True))

    def test_matches_dense_path(self, rng):
        M = FUSED_M
        dense_cfg, fused_cfg = self._cfgs(M)
        dense, fused = ChannelizerChain(dense_cfg), ChannelizerChain(fused_cfg)
        T = 4 * dense.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st = jrun(dense.init_state)
        st_d, a_d, x_d = jwrap(dense.step)(st, wide, mode)
        st2 = jrun(fused.init_state)
        st_f, a_f, x_f = jwrap(fused.step)(st2, wide, mode)
        W = dense.pfb.K
        np.testing.assert_allclose(np.asarray(a_f)[:, W:], np.asarray(a_d)[:, W:],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(x_f["waterfall"]),
                                   np.asarray(x_d["waterfall"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(x_f["channel_power"]),
                                   np.asarray(x_d["channel_power"]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st_f["agc"]["env"]),
                                   np.asarray(st_d["agc"]["env"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(st_f["demod"]["am_dc"]),
                                   np.asarray(st_d["demod"]["am_dc"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(st_f["demod"]["nfm_last"]),
                                   np.asarray(st_d["demod"]["nfm_last"]), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(st_f["demod"]["cw_phase"]),
                                      np.asarray(st_d["demod"]["cw_phase"]))

    def test_streaming_matches_dense(self, rng):
        M = FUSED_M_SMALL
        dense_cfg, fused_cfg = self._cfgs(M)
        dense, fused = ChannelizerChain(dense_cfg), ChannelizerChain(fused_cfg)
        T = 4 * dense.min_block
        wide = _wideband(rng, 2 * T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        outs = []
        for chain in (dense, fused):
            st = jrun(chain.init_state)
            step = jwrap(chain.step)
            audios = []
            for b in np.split(wide, 2):
                st, a, _ = step(st, b, mode)
                audios.append(np.asarray(a))
            outs.append(np.concatenate(audios, axis=-1))
        W = dense.pfb.K
        np.testing.assert_allclose(outs[1][:, W:], outs[0][:, W:], atol=2e-4)


class TestFusedConfigValidation:
    """ADVICE r3: the fused back end's constraints fail loudly at build/step
    time with named limits, not as opaque asserts deep in the kernel."""

    _base = dict(fs_in=15_000.0 * FUSED_M, num_channels=FUSED_M,
                 emit_spectrum=True, waterfall_from_pfb=True, fuse_pfb=True,
                 fuse_demod=True, enabled_modes=(0, 1, 2, 3))

    def test_non_pow2_frame_avg_rejected(self):
        with pytest.raises(ValueError, match="power of two"):
            ChannelizerChain(ChannelizerConfig(**self._base,
                                               waterfall_frame_avg=3))

    def test_frame_avg_over_tile_cap_rejected(self):
        cfg = dict(self._base, num_channels=4096,
                   fs_in=15_000.0 * 4096, waterfall_frame_avg=128)
        with pytest.raises(ValueError, match="frame-tile cap"):
            ChannelizerChain(ChannelizerConfig(**cfg))

    def test_fast_release_rejected(self):
        from radioframe.core.config import AgcConfig

        # release_s = 0.1 ms at fs_channel = 15 kHz -> decay ~0.51/sample:
        # 0.51**-(max_tf-1) overflows the in-kernel rescale
        with pytest.raises(ValueError, match="release"):
            ChannelizerChain(ChannelizerConfig(
                **self._base, waterfall_frame_avg=4,
                agc=AgcConfig(release_s=1e-4)))

    def test_single_pass_requires_fuse_demod(self):
        cfg = dict(self._base)
        cfg.pop("fuse_demod")
        with pytest.raises(AssertionError, match="fuse_demod"):
            ChannelizerChain(ChannelizerConfig(
                **cfg, fuse_demod=False, fuse_single_pass=True,
                waterfall_frame_avg=4))

    def test_sharded_fast_release_rejected(self):
        """The per-shard kernel's larger frame tile needs its own release
        guard (r4 code review): a decay that passes the unsharded bound can
        violate the sharded one."""
        from radioframe.core.config import AgcConfig

        M, D = 4096, 8
        # decay ~0.956 at fs_channel=15 kHz: 0.956**-63 ~ 17 (unsharded
        # max_tf=64 passes) but 0.956**-127 ~ 297 (per-shard max_tf=128
        # fails)
        chain = ChannelizerChain(ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
            waterfall_from_pfb=True, waterfall_frame_avg=4, fuse_pfb=True,
            fuse_demod=True, enabled_modes=(0, 1, 2, 3),
            agc=AgcConfig(release_s=1.48e-3)))
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        with pytest.raises(ValueError, match="per-shard"):
            ShardedChannelizer(chain, mesh)

    def test_block_length_assert_names_min_block(self, rng):
        chain = ChannelizerChain(ChannelizerConfig(
            **self._base, waterfall_frame_avg=4))
        mode = jnp.zeros((FUSED_M,), jnp.int32)
        # NUMPY operand: the length assert fires at step entry BEFORE any
        # device dispatch — an eager complex transfer here fails ASYNC on
        # the axon transport and poisons the rest of the file (r5)
        bad = _wideband(rng, chain.min_block + 64)
        with pytest.raises(AssertionError, match="min_block|multiple of"):
            chain.step(jrun(chain.init_state), bad, mode)


class TestShardedFusedBackend:
    """VERDICT r3 ask #2: the fused demod+AGC back end survives sharding —
    the PFB kernel's frame-major planes are all_to_all'd (split channels,
    concat frames) and each shard runs its M/D-channel kernel instance.
    Sharded fused == unsharded fused (interpret on the single-axis CPU
    mesh), streaming across blocks."""

    def _chain(self, M):
        return ChannelizerChain(ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
            waterfall_from_pfb=True, waterfall_frame_avg=4,
            fuse_pfb=True, fuse_demod=True, enabled_modes=(0, 1, 2, 3)))

    @pytest.mark.parametrize("D", [4, 8])
    def test_sharded_fused_matches_unsharded_fused(self, rng, D):
        M = 64
        chain = self._chain(M)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        assert sharded.demod_kernel is not None
        assert sharded.demod_kernel.M == M // D
        T = D * 2 * chain.min_block
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        wide = _wideband(rng, 2 * T)
        st_u, st_s = jrun(chain.init_state), jrun(chain.init_state)
        step_u, step_s = jwrap(chain.step), jwrap(sharded.step)
        W = chain.pfb.K
        for i, b in enumerate(np.split(wide, 2)):
            st_u, a_u, x_u = step_u(st_u, b, mode)
            st_s, a_s, x_s = step_s(st_s, b, mode)
            skip = W if i == 0 else 0
            np.testing.assert_allclose(np.asarray(a_s)[:, skip:],
                                       np.asarray(a_u)[:, skip:], atol=2e-4)
            np.testing.assert_allclose(np.asarray(x_s["waterfall"]),
                                       np.asarray(x_u["waterfall"]), atol=1e-2)
            np.testing.assert_allclose(np.asarray(x_s["channel_power"]),
                                       np.asarray(x_u["channel_power"]),
                                       rtol=1e-4)
        # per-channel streaming state identical across the formulations
        np.testing.assert_allclose(np.asarray(st_s["agc"]["env"]),
                                   np.asarray(st_u["agc"]["env"]), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(st_s["demod"]["cw_phase"]),
                                      np.asarray(st_u["demod"]["cw_phase"]))

    def test_sam_mode_falls_back_to_dense(self, rng):
        """A config with SAM enabled keeps the dense bank on the sharded
        path (chain refuses fuse_demod; sharded kernel stays None)."""
        M, D = 32, 4
        chain = ChannelizerChain(ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=False,
            fuse_pfb=True))
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        assert sharded.demod_kernel is None  # dense fallback intact


class TestFusedAttackAgc:
    """VERDICT r3 ask #5: the fused back end supports full attack/release
    AGC (per-distinct-alpha triangular MXU prefixes) — parity against the
    dense bank with NONZERO per-mode attack constants, streaming."""

    def _cfgs(self, M):
        from radioframe.core.config import AgcConfig

        agc_modes = (
            AgcConfig(release_s=0.5, attack_s=0.002),   # SSB
            AgcConfig(release_s=0.25, attack_s=0.001),  # CW
            AgcConfig(release_s=0.8, attack_s=0.005),   # AM
            AgcConfig(),                                # NFM (bypassed)
            AgcConfig(release_s=0.5, attack_s=0.002),   # LSB
            AgcConfig(release_s=0.8, attack_s=0.005),   # SAM
        )
        base = dict(fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=4,
                    fuse_pfb=True, enabled_modes=(0, 1, 2, 3),
                    agc_modes=agc_modes)
        return (ChannelizerConfig(**base),
                ChannelizerConfig(**base, fuse_demod=True))

    def test_attack_parity_streaming(self, rng):
        M = FUSED_M
        dense_cfg, fused_cfg = self._cfgs(M)
        dense, fused = ChannelizerChain(dense_cfg), ChannelizerChain(fused_cfg)
        assert fused.demod_kernel.attack_alphas  # nonzero alphas compiled
        assert fused.agc_bank.alpha.any()
        T = 4 * dense.min_block
        wide = _wideband(rng, 2 * T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        outs, states = [], []
        for chain in (dense, fused):
            st = jrun(chain.init_state)
            step = jwrap(chain.step)
            audios = []
            for b in np.split(wide, 2):
                st, a, _ = step(st, b, mode)
                audios.append(np.asarray(a))
            outs.append(np.concatenate(audios, axis=-1))
            states.append(st)
        W = dense.pfb.K
        np.testing.assert_allclose(outs[1][:, W:], outs[0][:, W:], atol=2e-4)
        # both envelope states (release env + attack lpf) carried identically
        np.testing.assert_allclose(np.asarray(states[1]["agc"]["env"]),
                                   np.asarray(states[0]["agc"]["env"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(states[1]["agc"]["lpf"]),
                                   np.asarray(states[0]["agc"]["lpf"]), atol=2e-4)

    def test_attack_parity_sharded(self, rng):
        """Sharded fused with nonzero attack == unsharded fused."""
        M, D = 64, 4
        _, fused_cfg = self._cfgs(M)
        chain = ChannelizerChain(fused_cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        assert sharded.demod_kernel.attack_alphas
        T = D * 2 * chain.min_block
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        wide = _wideband(rng, T)
        st_u, st_s = jrun(chain.init_state), jrun(chain.init_state)
        st_u, a_u, _ = jwrap(chain.step)(st_u, wide, mode)
        st_s, a_s, _ = jwrap(sharded.step)(st_s, wide, mode)
        W = chain.pfb.K
        np.testing.assert_allclose(np.asarray(a_s)[:, W:],
                                   np.asarray(a_u)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(st_s["agc"]["lpf"]),
                                   np.asarray(st_u["agc"]["lpf"]), atol=2e-4)


class TestFusedHangAgc:
    """VERDICT r4 ask #5: hang AGC on the fused paths. Exact one-pass
    in-kernel hang would need the full (Wmax-1, M) mag history in VMEM (a
    two-level van-Herk ring of per-tile maxima quantizes the window — the
    window-start tile's SUFFIX ARRAY is required for exactness), so with
    hang_s > 0 the kernel runs demod-only and the hang-capable dense
    AgcBank applies in XLA (chain.agc_in_xla). Fused == dense, streaming
    (hist carry handoff), for both the two-kernel and single-pass forms."""

    def _cfgs(self, M, single):
        from radioframe.core.config import AgcConfig

        agc_modes = (
            AgcConfig(release_s=0.5, attack_s=0.002, hang_s=0.01),   # SSB
            AgcConfig(release_s=0.25, hang_s=0.005),                 # CW
            AgcConfig(release_s=0.8, attack_s=0.005, hang_s=0.02),   # AM
            AgcConfig(),                                             # NFM
            AgcConfig(release_s=0.5, attack_s=0.002, hang_s=0.01),   # LSB
            AgcConfig(release_s=0.8, hang_s=0.02),                   # SAM
        )
        base = dict(fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
                    waterfall_from_pfb=True, waterfall_frame_avg=4,
                    fuse_pfb=True, enabled_modes=(0, 1, 2, 3),
                    agc_modes=agc_modes)
        return (ChannelizerConfig(**base),
                ChannelizerConfig(**base, fuse_demod=True,
                                  fuse_single_pass=single))

    @pytest.mark.parametrize("single", [False, True])
    def test_hang_parity_streaming(self, rng, single):
        M = FUSED_M
        dense_cfg, fused_cfg = self._cfgs(M, single)
        dense, fused = ChannelizerChain(dense_cfg), ChannelizerChain(fused_cfg)
        assert fused.agc_in_xla and fused.agc_bank.hist_len > 0
        assert not fused.demod_kernel.apply_agc
        if single:
            assert not fused.one_kernel.apply_agc
        T = 4 * dense.min_block
        wide = _wideband(rng, 2 * T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        outs, states = [], []
        for chain in (dense, fused):
            st = jrun(chain.init_state)
            step = jwrap(chain.step)
            audios = []
            for b in np.split(wide, 2):
                st, a, _ = step(st, b, mode)
                audios.append(np.asarray(a))
            outs.append(np.concatenate(audios, axis=-1))
            states.append(st)
        W = dense.pfb.K
        np.testing.assert_allclose(outs[1][:, W:], outs[0][:, W:], atol=2e-4)
        for leaf in ("env", "lpf", "hist"):
            np.testing.assert_allclose(np.asarray(states[1]["agc"][leaf]),
                                       np.asarray(states[0]["agc"][leaf]),
                                       atol=2e-4, err_msg=f"agc.{leaf}")

    def test_sharded_hang_falls_back_to_dense(self):
        """Two-kernel sharded path with hang: the per-shard fused kernel is
        skipped (dense hang-capable AGC runs); single-pass sharded raises
        with a named reason."""
        M, D = 64, 4
        dense_cfg, fused_cfg = self._cfgs(M, False)
        chain = ChannelizerChain(fused_cfg)
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh)
        assert sharded.demod_kernel is None  # dense AGC path active
        _, one_cfg = self._cfgs(M, True)
        with pytest.raises(ValueError, match="hang"):
            ShardedChannelizer(ChannelizerChain(one_cfg), mesh)
        # and the dense sharded path actually matches the unsharded dense
        # chain with hang in play (hist halo-free: channels sharded, time
        # whole per shard)
        rng = np.random.default_rng(5)
        T = D * 2 * chain.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        dense = ChannelizerChain(dense_cfg)
        _, a_u, _ = jrun(lambda w, m: dense.step(dense.init_state(), w, m),
                         wide, mode)
        st_s, a_s, _ = jwrap(sharded.step)(jrun(chain.init_state), wide, mode)
        W = chain.pfb.K
        np.testing.assert_allclose(np.asarray(a_s)[:, W:],
                                   np.asarray(a_u)[:, W:], atol=2e-4)


class TestSinglePassChannelizer:
    """kernels/channelizer_one.py: the whole channelizer in one VMEM pass
    == the two-kernel fused path == the dense path, streaming, including
    nonzero-attack AGC."""

    def _cfg(self, M, single, **kw):
        return ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
            waterfall_from_pfb=True, waterfall_frame_avg=4,
            fuse_pfb=True, fuse_demod=True, fuse_single_pass=single,
            enabled_modes=(0, 1, 2, 3), **kw)

    @pytest.mark.parametrize("M,agc_kw", [
        (FUSED_M, {}),                       # instant attack (bench default)
        (FUSED_M, {"agc_modes": (            # nonzero attack table
            __import__("radioframe.core.config", fromlist=["AgcConfig"])
            .AgcConfig(release_s=0.5, attack_s=0.002),) * 6}),
        (256, {}),                           # M2=128, M1=2 CT factorization
    ])
    def test_matches_two_kernel_fused(self, rng, M, agc_kw):
        two = ChannelizerChain(self._cfg(M, False, **agc_kw))
        one = ChannelizerChain(self._cfg(M, True, **agc_kw))
        assert one.one_kernel is not None
        T = 4 * two.min_block
        wide = _wideband(rng, 2 * T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        outs, auxs, states = [], [], []
        for chain in (two, one):
            st = jrun(chain.init_state)
            step = jwrap(chain.step)
            audios, wfs = [], []
            for b in np.split(wide, 2):
                st, a, x = step(st, b, mode)
                audios.append(np.asarray(a))
                wfs.append(np.asarray(x["waterfall"]))
            outs.append(np.concatenate(audios, axis=-1))
            auxs.append(np.concatenate(wfs, axis=0))
            states.append(st)
        np.testing.assert_allclose(outs[1], outs[0], atol=2e-4)
        np.testing.assert_allclose(auxs[1], auxs[0], atol=1e-2)
        for leaf in ("cw_phase", "am_dc", "nfm_last"):
            np.testing.assert_allclose(np.asarray(states[1]["demod"][leaf]),
                                       np.asarray(states[0]["demod"][leaf]),
                                       atol=2e-4)
        np.testing.assert_allclose(np.asarray(states[1]["agc"]["env"]),
                                   np.asarray(states[0]["agc"]["env"]),
                                   atol=2e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(states[1]["pfb"]),
                                   np.asarray(states[0]["pfb"]), atol=1e-6)

    def test_matches_dense(self, rng):
        M = FUSED_M_SMALL
        dense = ChannelizerChain(ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
            waterfall_from_pfb=True, waterfall_frame_avg=4,
            enabled_modes=(0, 1, 2, 3)))
        one = ChannelizerChain(self._cfg(M, True))
        T = 4 * dense.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st_d, a_d, x_d = jwrap(dense.step)(jrun(dense.init_state),
                                             wide, mode)
        st_o, a_o, x_o = jwrap(one.step)(jrun(one.init_state),
                                           wide, mode)
        W = dense.pfb.K
        np.testing.assert_allclose(np.asarray(a_o)[:, W:],
                                   np.asarray(a_d)[:, W:], atol=2e-4)
        np.testing.assert_allclose(np.asarray(x_o["waterfall"]),
                                   np.asarray(x_d["waterfall"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(x_o["channel_power"]),
                                   np.asarray(x_d["channel_power"]), rtol=1e-4)

    def test_am_channel_snr_acceptance(self):
        """Signal-level acceptance on the SHIPPED fast path (not just
        parity): an AM tone at a channel center demodulates at the same
        SNR through the single-pass kernel as through the dense chain
        (mirrors TestChannelizerChain.test_am_channel_demod)."""
        M = FUSED_M
        chain = ChannelizerChain(self._cfg(M, True))
        fs_ch = chain.cfg.fs_channel
        F = 4096
        T = F * M
        tt = np.arange(F) / fs_ch
        tone = 0.7 * np.sin(2 * np.pi * 1000.0 * tt)
        base = (1.0 + 0.8 * tone).astype(np.complex128)
        n = np.arange(T) / chain.cfg.fs_in
        up = np.repeat(base, M)
        wide = (up * np.exp(2j * np.pi * (37 * fs_ch) * n)).astype(np.complex64)
        mode = jnp.full((M,), demod_op.AM, jnp.int32)
        st = jrun(chain.init_state)
        st, audio, aux = jwrap(chain.step)(st, wide, mode)
        snr = audio_snr_db(tone[512:], np.asarray(audio)[37][512:], trim=128)
        assert snr > 15.0, f"single-pass channelized AM SNR {snr:.1f} dB"
        assert np.argmax(np.asarray(aux["channel_power"])) == 37

    def test_step_planes_matches_step(self, rng):
        M = FUSED_M
        chain = ChannelizerChain(self._cfg(M, True))
        T = 2 * chain.min_block
        wide = _wideband(rng, T)
        mode = jnp.asarray(np.arange(M) % 4, jnp.int32)
        st1, a1, x1 = jwrap(chain.step)(jrun(chain.init_state),
                                          wide, mode)
        st2, a2, x2 = jwrap(chain.step_planes)(
            jrun(chain.init_state), np.ascontiguousarray(wide.real),
            np.ascontiguousarray(wide.imag), mode)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(x1["waterfall"]),
                                      np.asarray(x2["waterfall"]))
        np.testing.assert_array_equal(np.asarray(st1["pfb"]),
                                      np.asarray(st2["pfb"]))


class TestShardedSinglePass:
    """VERDICT r4 ask #1: the sharded channelizer honors fuse_single_pass —
    a time-sharded whole-M FusedChannelizerOne per shard with NO
    all_to_all. AM/NFM lookbacks seed exactly from the K*M halo, the AM
    DC-block carry completes via an affine chain (rank-1 decay-column
    fixup), and AGC release/attack/gain complete in XLA across shards.
    Sharded == unsharded single-pass, streaming, from sample 0 (every
    cross-shard carry is exact, so no warmup skip is needed)."""

    def _cfg(self, M, **kw):
        kw.setdefault("enabled_modes", (0, 1, 2, 3))
        return ChannelizerConfig(
            fs_in=15_000.0 * M, num_channels=M, emit_spectrum=True,
            waterfall_from_pfb=True, waterfall_frame_avg=4,
            fuse_pfb=True, fuse_demod=True, fuse_single_pass=True, **kw)

    def _run_pair(self, rng, chain, D, n_blocks=2, force_general=False,
                  expect_mode=None):
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh,
                                     force_general=force_general)
        assert sharded.one_kernel is not None  # honors fuse_single_pass
        if expect_mode is not None:
            assert sharded.one_mode == expect_mode, sharded.one_mode
        if sharded.one_mode == "defer":
            assert sharded.one_kernel.apply_agc  # the unsharded kernel
        else:
            assert not sharded.one_kernel.apply_agc
        T = D * 2 * chain.min_block
        mode = jnp.asarray(np.arange(chain.cfg.num_channels) % 4, jnp.int32)
        wide = _wideband(rng, n_blocks * T)
        st_u, st_s = jrun(chain.init_state), jrun(chain.init_state)
        step_u, step_s = jwrap(chain.step), jwrap(sharded.step)
        for b in np.split(wide, n_blocks):
            st_u, a_u, x_u = step_u(st_u, b, mode)
            st_s, a_s, x_s = step_s(st_s, b, mode)
            np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_u),
                                       atol=2e-4)
            np.testing.assert_allclose(np.asarray(x_s["waterfall"]),
                                       np.asarray(x_u["waterfall"]), atol=1e-2)
            np.testing.assert_allclose(np.asarray(x_s["channel_power"]),
                                       np.asarray(x_u["channel_power"]),
                                       rtol=1e-4)
        return st_u, st_s

    @pytest.mark.parametrize("D", [1, 4, 8])
    def test_matches_unsharded_single_pass(self, rng, D):
        chain = ChannelizerChain(self._cfg(64))
        st_u, st_s = self._run_pair(
            rng, chain, D, expect_mode="defer" if D == 1 else "xla")
        np.testing.assert_array_equal(np.asarray(st_s["demod"]["cw_phase"]),
                                      np.asarray(st_u["demod"]["cw_phase"]))
        for leaf in ("am_dc", "nfm_last"):
            np.testing.assert_allclose(np.asarray(st_s["demod"][leaf]),
                                       np.asarray(st_u["demod"][leaf]),
                                       atol=2e-4)
        for leaf in ("env", "lpf"):
            np.testing.assert_allclose(np.asarray(st_s["agc"][leaf]),
                                       np.asarray(st_u["agc"][leaf]),
                                       atol=2e-4)
        np.testing.assert_allclose(np.asarray(st_s["pfb"]),
                                   np.asarray(st_u["pfb"]), atol=1e-6)

    def test_attack_parity_sharded_single_pass(self, rng):
        """Nonzero per-mode attack constants: the XLA cross-shard attack
        completion (sharded_affine_scan, mixed instant/smoothed channels)
        == the in-kernel triangular-matmul attack of the unsharded kernel."""
        from radioframe.core.config import AgcConfig

        agc_modes = (
            AgcConfig(release_s=0.5, attack_s=0.002),   # SSB
            AgcConfig(release_s=0.25, attack_s=0.001),  # CW
            AgcConfig(release_s=0.8, attack_s=0.005),   # AM
            AgcConfig(),                                # NFM (bypassed)
            AgcConfig(release_s=0.5, attack_s=0.002),   # LSB
            AgcConfig(release_s=0.8, attack_s=0.005),   # SAM
        )
        chain = ChannelizerChain(self._cfg(64, agc_modes=agc_modes))
        assert chain.agc_bank.alpha.any()
        st_u, st_s = self._run_pair(rng, chain, 4, expect_mode="xla")
        np.testing.assert_allclose(np.asarray(st_s["agc"]["lpf"]),
                                   np.asarray(st_u["agc"]["lpf"]), atol=2e-4)

    def _run_pair_no_am(self, rng, chain, D, **kw):
        """AM-free population (modes drawn from the static subset)."""
        mesh = jax.make_mesh((D,), ("dev",), devices=jax.devices()[:D])
        sharded = ShardedChannelizer(chain, mesh, **kw)
        M = chain.cfg.num_channels
        mode = jnp.asarray(np.array([0, 1, 3])[np.arange(M) % 3], jnp.int32)
        T = D * 2 * chain.min_block
        wide = _wideband(rng, 2 * T)
        st_u, st_s = jrun(chain.init_state), jrun(chain.init_state)
        step_u, step_s = jwrap(chain.step), jwrap(sharded.step)
        for b in np.split(wide, 2):
            st_u, a_u, x_u = step_u(st_u, b, mode)
            st_s, a_s, x_s = step_s(st_s, b, mode)
            np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_u),
                                       atol=2e-4)
        for leaf in ("env", "lpf"):
            np.testing.assert_allclose(np.asarray(st_s["agc"][leaf]),
                                       np.asarray(st_u["agc"][leaf]),
                                       atol=2e-4)
        np.testing.assert_array_equal(np.asarray(st_s["demod"]["am_dc"]),
                                      np.asarray(st_u["demod"]["am_dc"]))
        return sharded

    @pytest.mark.parametrize("D", [4, 8])
    def test_emit_env_matches_unsharded(self, rng, D):
        """AM statically disabled -> the emit_env variant: the kernel's
        zero-entering release env + ONE elementwise cross-shard max
        (r5 ROADMAP open-work #4) == the unsharded in-kernel AGC."""
        chain = ChannelizerChain(self._cfg(64, enabled_modes=(0, 1, 3)))
        sharded = self._run_pair_no_am(rng, chain, D)
        assert sharded.one_mode == "emit_env"
        assert sharded.one_kernel.emit_env

    def test_emit_env_attack_parity(self, rng):
        """emit_env + nonzero attack alphas: the elementwise env completion
        feeds the XLA cross-shard attack scan — matches in-kernel attack."""
        from radioframe.core.config import AgcConfig

        agc_modes = (AgcConfig(attack_s=0.002), AgcConfig(attack_s=0.001),
                     AgcConfig(), AgcConfig(), AgcConfig(attack_s=0.002),
                     AgcConfig())
        chain = ChannelizerChain(self._cfg(64, enabled_modes=(0, 1, 3),
                                           agc_modes=agc_modes))
        assert chain.agc_bank.alpha.any()
        sharded = self._run_pair_no_am(rng, chain, 4)
        assert sharded.one_mode == "emit_env"

    def test_force_general_d1(self, rng):
        """force_general=True keeps the cross-shard formulation at D=1
        (the bench/verify hook): both the xla (AM on) and emit_env (AM
        off) variants still match the unsharded chain."""
        chain_am = ChannelizerChain(self._cfg(64))
        self._run_pair(rng, chain_am, 1, force_general=True,
                       expect_mode="xla")
        chain_no = ChannelizerChain(self._cfg(64, enabled_modes=(0, 1, 3)))
        sharded = self._run_pair_no_am(rng, chain_no, 1, force_general=True)
        assert sharded.one_mode == "emit_env"

    def test_d1_defers_to_unsharded(self, rng):
        """At D=1 the sharded wrapper runs the unsharded fused chain
        (full in-kernel AGC; the completion machinery priced 8.6 vs 11.7
        Gsps on chip) — and hang AGC therefore WORKS at D=1."""
        from radioframe.core.config import AgcConfig

        chain = ChannelizerChain(self._cfg(64, agc=AgcConfig(hang_s=0.01)))
        assert chain.agc_in_xla  # hang routes AGC to the dense bank
        mesh = jax.make_mesh((1,), ("dev",), devices=jax.devices()[:1])
        sharded = ShardedChannelizer(chain, mesh)
        assert sharded.one_mode == "defer"
        # D>1 with hang still raises with the named reason
        mesh4 = jax.make_mesh((4,), ("dev",), devices=jax.devices()[:4])
        with pytest.raises(ValueError, match="hang"):
            ShardedChannelizer(chain, mesh4)

    def test_state_tree_matches_unsharded(self, rng):
        """The single-pass sharded state tree is structurally identical to
        the unsharded chain's (replicated leaves) — checkpoints and the
        unsharded path interoperate mid-stream."""
        chain = ChannelizerChain(self._cfg(64))
        mesh = jax.make_mesh((4,), ("dev",), devices=jax.devices()[:4])
        sharded = ShardedChannelizer(chain, mesh)
        mode = jnp.asarray(np.arange(64) % 4, jnp.int32)
        T = 4 * 2 * chain.min_block
        wide = jnp.asarray(_wideband(rng, T))
        st = jrun(chain.init_state)
        st_s, _, _ = jwrap(sharded.step)(st, wide, mode)
        # resume the SHARDED state through the UNSHARDED chain, via a host
        # round trip (exactly what a checkpoint restore does) to drop the
        # mesh placement the shard_map output carries
        st_host = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), st_s)
        st_u, a_u, _ = jwrap(chain.step)(st_host, wide, mode)
        st_s2, a_s, _ = jwrap(sharded.step)(st_s, wide, mode)
        np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_u), atol=2e-4)


class TestEmitEnvChunked:
    """The MAX_GRID sequential-chunking path with emit_env: env rows
    concatenate across chunks and the release carry (row 4) chains through
    st_in — no test/bench config reaches grid > MAX_GRID naturally, so
    this forces it (r5 review finding)."""

    def test_chunked_emit_env_matches_unchunked(self, rng):
        from radioframe.kernels.channelizer_one import FusedChannelizerOne

        M, K, F = 64, 8, 64
        mk = lambda: FusedChannelizerOne(M, K, 15e3, 2500.0, wf_avg=4,
                                         enabled=(0, 1, 3), interpret=True,
                                         apply_agc=False, emit_env=True)
        a, b = mk(), mk()
        a.max_tf = b.max_tf = 8   # TF=8 -> grid=8 at F=64
        a.MAX_GRID = 2            # a chunks (4 sequential calls); b doesn't
        T = F * M
        wr = jnp.asarray(rng.standard_normal(T).astype(np.float32))
        wi = jnp.asarray(rng.standard_normal(T).astype(np.float32))
        mode = jnp.asarray(np.array([0, 1, 3])[np.arange(M) % 3], jnp.int32)
        args = (mode, jnp.full((M,), 1234567, jnp.int32),
                jnp.zeros((M,), jnp.int32), jnp.full((M,), 0.99, jnp.float32),
                jnp.zeros((M,), jnp.float32), jnp.full((M,), 0.5, jnp.float32),
                jnp.full((M,), 1e4, jnp.float32), jnp.zeros((7, M), jnp.float32))
        # host-side zeros: an eager jnp complex init would dispatch op-by-op
        # (unimplemented on the axon transport) — conftest module note
        tail = np.zeros((1, (K - 1) * M), np.complex64)
        outs_a = jrun(a.call_planes, tail, wr, wi, *args)
        outs_b = jrun(b.call_planes, tail, wr, wi, *args)
        assert len(outs_a) == len(outs_b) == 5
        for name, xa, xb in zip(("audio", "power", "wf", "st", "env"),
                                outs_a, outs_b):
            np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                       atol=1e-6, err_msg=name)


class TestCompiledLaneGate:
    """Compiled (non-interpret) fused kernels require num_channels % 128
    == 0 — smaller M lowers to lane-merging relayouts Mosaic rejects,
    found by driving the CLI at M=64 on hardware (r4). The gate raises at
    BUILD time with a named limit; interpret mode (CPU tests) still
    accepts any pow2 M."""

    def test_pfb_dft_gate(self):
        from radioframe.kernels.pfb_dft import FusedPfbDft

        with pytest.raises(ValueError, match="128"):
            FusedPfbDft(64, 8, interpret=False)
        FusedPfbDft(64, 8, interpret=True)  # interpret path unaffected

    def test_single_pass_gate(self):
        from radioframe.kernels.channelizer_one import FusedChannelizerOne

        with pytest.raises(ValueError, match="128"):
            FusedChannelizerOne(64, 8, 15e3, 2500.0, interpret=False)

    def test_demod_agc_gate(self):
        from radioframe.kernels.demod_agc import FusedDemodAgc

        with pytest.raises(ValueError, match="128"):
            FusedDemodAgc(64, 15e3, 2500.0, interpret=False)
