"""ShardedTxChain — DUC transmit program over a ('channel', 'time') mesh.

Same sequence-parallel machinery as shard/rx.py, adjoint direction:
audio blocks time-sharded, modulator state crossing shards via halos and
prefix scans (FM phase integrator = affine scan with a=1), interpolator
input tails as ppermute halos, comm-free DDS NCO at per-shard offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from radioframe.ops import agc as agc_op
from radioframe.ops import nco
from radioframe.pipelines.tx_chain import TWO_PI, TxChain
from radioframe.shard.halo import (
    causal_halo,
    sharded_affine_scan,
    sharded_biquad_cascade,
    sharded_maxdecay_scan,
)
from radioframe.shard.rx import _halo_tail


class ShardedTxChain:
    def __init__(self, chain: TxChain, mesh, channel_axis="channel", time_axis="time"):
        self.chain = chain
        self.mesh = mesh
        self.ca, self.ta = channel_axis, time_axis

    def _local_step(self, state, audio, words, mode):
        chain, cfg, ta = self.chain, self.chain.cfg, self.ta
        D = lax.axis_size(ta)
        d = lax.axis_index(ta)
        C, Ta_loc = audio.shape

        # speech processor: DC block (1-sample halo + affine scan) + compressor
        xprev_pre, new_dc_x = _halo_tail(audio, state["dc"][0][:, None], 1, ta)
        xprev = jnp.concatenate([xprev_pre, audio[:, :-1]], axis=-1)
        b = audio - xprev
        a_dc, new_dc_y = sharded_affine_scan(0.995, b, state["dc"][1], ta)
        new_dc = jnp.stack([new_dc_x[:, -1], new_dc_y])

        eq_state = ()
        if chain.mic_eq is not None:
            a_dc, eq_state = sharded_biquad_cascade(chain.mic_eq, state["eq"], a_dc, ta)

        env, new_comp = sharded_maxdecay_scan(chain.comp_decay, jnp.abs(a_dc), state["comp"], ta)
        gain = jnp.minimum(jnp.float32(cfg.compressor_max_gain),
                           jnp.float32(cfg.compressor_target) / jnp.maximum(env, 1e-9))
        a = a_dc * gain

        # modulator bank
        ac = a.astype(jnp.complex64)
        pre, ssb_carry = _halo_tail(ac, state["ssb"], chain.ssb_bpf.L - 1, ta)
        y_ssb, _ = chain.ssb_bpf(pre, ac)
        y_cw = jnp.clip(audio, 0.0, 1.0).astype(jnp.complex64)
        y_am = (1.0 + cfg.am_depth * a).astype(jnp.complex64)
        dphi = chain.fm_k * a
        phase, new_fm = sharded_affine_scan(1.0, dphi, state["fm_phase"], ta)
        y_nfm = jnp.exp(1j * phase.astype(jnp.float32)).astype(jnp.complex64)
        new_fm = jnp.mod(new_fm, jnp.float32(TWO_PI))
        stacked = jnp.stack([y_ssb, y_cw, y_am, y_nfm])
        x = jnp.take_along_axis(stacked, mode[None, :, None].astype(jnp.int32), axis=0)[0]

        # interpolation stages: halo = tin input samples from left neighbor
        interp_tails = []
        for ip, carry in zip(chain.interps, state["interp"]):
            pre, new_carry = _halo_tail(x, carry, ip.tin, ta)
            x, _ = ip(pre, x)
            interp_tails.append(new_carry)

        # TX NCO at per-shard sample offset (output rate)
        T_out_loc = x.shape[-1]
        iq = nco.mix_up_at(x, words, state["nco"], d * jnp.int32(T_out_loc))
        new_nco = state["nco"] + words * jnp.int32(D * T_out_loc)

        new_state = {
            "dc": new_dc,
            "eq": eq_state,
            "comp": new_comp,
            "ssb": ssb_carry,
            "fm_phase": new_fm,
            "interp": tuple(interp_tails),
            "nco": new_nco,
        }
        return new_state, iq

    def state_specs(self):
        """Public PartitionSpec tree for mesh.place_state (donation hygiene)."""
        return self._state_specs()

    def _state_specs(self):
        ca = self.ca
        return {
            "dc": P(None, ca),
            "eq": (tuple(P(ca, None) for _ in self.chain.mic_eq.sections)
                   if self.chain.mic_eq else ()),
            "comp": P(ca),
            "ssb": P(ca, None),
            "fm_phase": P(ca),
            "interp": tuple(P(ca, None) for _ in self.chain.interps),
            "nco": P(ca),
        }

    def step(self, state, audio, words, mode):
        ca, ta = self.ca, self.ta
        fn = jax.shard_map(
            self._local_step,
            mesh=self.mesh,
            in_specs=(self._state_specs(), P(ca, ta), P(ca), P(ca)),
            out_specs=(self._state_specs(), P(ca, ta)),
            check_vma=False,
        )
        return fn(state, audio, words, mode)

    def init_state(self, num_channels: int | None = None):
        return self.chain.init_state(num_channels)
