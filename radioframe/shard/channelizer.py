"""Pod-sharded channelizer (BASELINE config 5; SURVEY.md §2.3 re-shard row).

Dataflow over a 1-D device mesh ("dev", D devices):

  wideband IQ, time-sharded P('dev')
    -> causal halo ((K-1)*M raw samples via ppermute)
    -> per-shard PFB (depthwise polyphase FIR + M-point DFT)   [time-sharded]
    -> lax.all_to_all transpose: channels split D-ways, frames gathered
       (the Ulysses-style reshard between time-parallel filtering and
       channel-parallel demod)
    -> per-channel demod bank + AGC on full-length channel streams
       [channel-sharded, no further collectives]

Audio out: (M, F) sharded P('dev') over channels. Wideband waterfall stays
time-sharded P('dev') over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from radioframe.ops import agc as agc_op
from radioframe.ops import demod as demod_op
from radioframe.pipelines.channelizer import ChannelizerChain
from radioframe.shard.halo import causal_halo, last_shard_value, sharded_affine_scan


class ShardedChannelizer:
    def __init__(self, chain: ChannelizerChain, mesh, axis: str = "dev"):
        self.chain = chain
        self.mesh = mesh
        self.axis = axis
        D = mesh.shape[axis]
        assert chain.cfg.num_channels % D == 0
        if chain.cfg.emit_spectrum and chain.cfg.spectrum_avg > 0.0:
            from radioframe.ops.spectrum import Spectrum

            self._raw_spec = Spectrum(chain.cfg.spectrum_nfft, 0.0)
        # fused demod+AGC back end under sharding (VERDICT r3 ask #2): each
        # device owns M/D channels after the all_to_all, so it runs its own
        # kernel instance sized M/D; per-channel constants/state arrive
        # pre-sliced through the shard_map specs. The dense bank remains the
        # SAM/EMA fallback (chain.demod_kernel is None then).
        self.demod_kernel = None
        if chain.demod_kernel is not None:
            import jax as _jax

            from radioframe.kernels.demod_agc import FusedDemodAgc

            cfg = chain.cfg
            en = (cfg.enabled_modes if cfg.enabled_modes is not None
                  else tuple(range(demod_op.SAM + 1)))
            self.demod_kernel = FusedDemodAgc(
                cfg.num_channels // D, cfg.fs_channel, cfg.nfm_deviation_hz,
                wf_avg=cfg.waterfall_frame_avg, enabled=en,
                attack_alphas=tuple(chain.agc_bank.alpha.tolist()),
                interpret=_jax.default_backend() == "cpu")
            if not self.demod_kernel.release_ok(chain.agc_bank.release):
                # the per-shard kernel has M/D channels, so its VMEM
                # frame-tile cap (and hence the release-rescale exponent)
                # is LARGER than the unsharded kernel's — the chain-level
                # guard does not cover it (r4 code review)
                raise ValueError(
                    "sharded fuse_demod: AGC release too fast for the "
                    f"per-shard kernel's {self.demod_kernel.max_tf}-frame "
                    "tiles; lengthen release_s or disable fuse_demod")

    def _local_step(self, state, wideband, mode):
        chain, cfg, ax = self.chain, self.chain.cfg, self.axis
        M = cfg.num_channels
        D = lax.axis_size(ax)
        H = (chain.pfb.K - 1) * M

        x = wideband[None, :]  # (1, T_loc)
        xp, pfb_carry = causal_halo(x, state["pfb"], H, ax)

        if self.demod_kernel is not None:
            return self._local_back_fused(state, pfb_carry, x, xp[:, :H], mode)

        chans, _ = chain.pfb(xp[:, :H], x)  # (1, M, F_loc)
        chans = chans[0]  # (M, F_loc)

        # reshard: channels -> P(dev), frames -> full length
        if D > 1:
            chans = lax.all_to_all(chans, ax, split_axis=0, concat_axis=1, tiled=True)
        # (M/D, F) — each device now owns M/D channels' full streams

        cw_word = jnp.full((chans.shape[0],), chain.cw_tone_word, jnp.int32)
        audio, demod_state = demod_op.bank_apply(
            state["demod"], chans, mode, cw_word, cfg.fs_channel,
            cfg.nfm_deviation_hz, enabled=cfg.enabled_modes)
        # channels are sharded, time is whole here — the per-mode AGC bank
        # runs locally per shard, no collectives needed
        agc_audio, agc_env, agc_gain = chain.agc_bank.apply(state["agc"], audio, mode)
        audio = jnp.where((mode == demod_op.NFM)[:, None], audio, agc_audio)

        aux = {"channel_power": jnp.mean(jnp.abs(chans) ** 2, axis=-1)}
        spec_prev = state["spec"]
        if cfg.emit_spectrum:
            if cfg.waterfall_from_pfb:
                # chans are channel-sharded with whole frame streams here, so
                # each shard emits full-length lines for its M/D channels
                # (out spec P(None, dev)); the global fftshift roll runs
                # OUTSIDE shard_map in step() so sharded == unsharded exactly
                A = cfg.waterfall_frame_avg
                Ml, Fl = chans.shape
                p = jnp.real(chans) ** 2 + jnp.imag(chans) ** 2
                pa = p.reshape(Ml, Fl // A, A).mean(axis=-1)
                db = 10.0 * jnp.log10(jnp.maximum(pa, 1e-24)).astype(jnp.float32)
                aux["waterfall"] = db.T  # (F/A, M/D) channel-sharded, UNROLLED
            elif cfg.spectrum_avg > 0.0:
                # EMA waterfall: raw dB lines locally, then the affine scan
                # completed across time shards (same as shard/rx.py)
                db, _ = self._raw_spec(state["spec"], x)  # (1, F_loc, nfft)
                _, Fl, nf = db.shape
                b = (1.0 - cfg.spectrum_avg) * jnp.moveaxis(db, 1, -1).reshape(nf, Fl)
                lines_flat, prev_flat = sharded_affine_scan(
                    cfg.spectrum_avg, b, state["spec"].reshape(nf), ax)
                lines = jnp.moveaxis(lines_flat.reshape(1, nf, Fl), -1, 1)
                spec_prev = prev_flat.reshape(1, nf)
                aux["waterfall"] = lines[0]  # (F_spec_loc, nfft), time-sharded
            else:
                lines, _ = chain.spectrum(state["spec"], x)
                spec_prev = last_shard_value(lines[:, -1, :], ax)
                aux["waterfall"] = lines[0]  # (F_spec_loc, nfft), time-sharded
        new_state = {"pfb": pfb_carry, "demod": demod_state, "agc": agc_env,
                     "spec": spec_prev}
        return new_state, audio, aux

    def _local_back_fused(self, state, pfb_carry, x, halo_tail, mode):
        """Fused back end under sharding (VERDICT r3 ask #2): the PFB
        kernel's f32 frame-major planes are resharded directly — split
        channels D ways, concat frames — so the (M, F) complex channel-major
        matrix is never materialized on this path either; each shard then
        runs the demod+AGC kernel on its M/D channel slice."""
        from radioframe.pipelines.channelizer import fused_backend_apply

        chain, cfg, ax = self.chain, self.chain.cfg, self.axis
        D = lax.axis_size(ax)
        (yr, yi), _ = chain.pfb.call_planes(halo_tail, x)  # (F_loc, M) planes
        planes = jnp.stack([yr, yi])  # (2, F_loc, M)
        if D > 1:
            planes = lax.all_to_all(planes, ax, split_axis=2, concat_axis=1,
                                    tiled=True)  # (2, F, M/D)
        audio_fm, power_sum, wfp, new_demod, new_agc = fused_backend_apply(
            self.demod_kernel, chain.agc_bank, chain.cw_tone_word,
            state["demod"], state["agc"], planes[0], planes[1], mode)
        F = planes.shape[1]
        aux = {"channel_power": power_sum / jnp.float32(F)}
        # (F/avg, M/D) dB lines, channel-sharded; the global fftshift roll
        # runs OUTSIDE shard_map in step() (same as the dense branch)
        db = 10.0 * jnp.log10(jnp.maximum(wfp, 1e-24)).astype(jnp.float32)
        aux["waterfall"] = db
        new_state = {"pfb": pfb_carry, "demod": new_demod, "agc": new_agc,
                     "spec": state["spec"]}
        return new_state, audio_fm.T, aux

    def state_specs(self):
        """Public PartitionSpec tree for mesh.place_state (donation hygiene)."""
        return self._state_specs()

    def _state_specs(self):
        ax = self.axis
        cfg = self.chain.cfg
        has_spec = cfg.emit_spectrum and not cfg.waterfall_from_pfb
        return {
            "pfb": P(None, None),  # replicated carry
            "demod": {"cw_phase": P(ax), "am_dc": P(None, ax), "nfm_last": P(ax),
                      "sam_dc": P(None, ax), "sam_carrier": P(None, ax)},
            "agc": {"hist": P(ax, None) if self.chain.agc_bank.hist_len else (),
                    "env": P(ax), "lpf": P(ax)},
            "spec": P(None, None) if has_spec else (),
        }

    def step(self, state, wideband, mode):
        ax = self.axis
        cfg = self.chain.cfg
        aux_spec = {"channel_power": P(ax)}
        if cfg.emit_spectrum:
            # PFB-derived waterfall: frames whole, channels sharded;
            # Spectrum waterfall: frames time-sharded, bins whole
            aux_spec["waterfall"] = (P(None, ax) if cfg.waterfall_from_pfb
                                     else P(ax, None))
        fn = jax.shard_map(
            self._local_step,
            mesh=self.mesh,
            in_specs=(self._state_specs(), P(ax), P(ax)),
            out_specs=(self._state_specs(), P(ax, None), aux_spec),
            check_vma=False,
        )
        state, audio, aux = fn(state, wideband, mode)
        if cfg.emit_spectrum and cfg.waterfall_from_pfb:
            # global fftshift (channel c at +c*fs/M -> low..high order),
            # outside shard_map so the roll crosses shards correctly
            aux["waterfall"] = jnp.roll(aux["waterfall"],
                                        cfg.num_channels // 2, axis=-1)
        return state, audio, aux

    def init_state(self):
        return self.chain.init_state()
