"""Polyphase filterbank channelizer (SURVEY.md §7 P6; BASELINE config 5).

The TPU-native answer to "thousands of channels": instead of N independent
NCO+decimator chains (N x input-rate work), an M-channel critically-sampled
PFB does one depthwise polyphase FIR over frames plus one batched M-point
DFT per frame — O(K + log M) work per input sample regardless of channel
count, all of it XLA-friendly (grouped conv + batched FFT).

Channel c (0..M-1) is centered at +c*fs/M, output rate fs/M. Matches golden
``pfb_channelize`` (DFT across type-1 polyphase components).

Streaming state: the last K-1 input frames (flattened, (B, (K-1)*M)).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from radioframe.ops.filter_design import pfb_prototype_taps


class PfbChannelizer:
    def __init__(self, num_channels: int, taps_per_channel: int = 8, window: str = "hamming"):
        self.M = int(num_channels)
        self.K = int(taps_per_channel)
        proto = pfb_prototype_taps(self.M, self.K, window)
        h = proto.reshape(self.K, self.M).astype(np.float32)
        # depthwise conv kernel over the frame axis, one group per phase:
        # u[m, p] = sum_t h[t, p] * xf[m - t, p]  ->  rhs (M, 1, K), taps
        # reversed for correlation form
        self._rhs = np.ascontiguousarray(h[::-1].T)[:, None, :]  # (M, 1, K)

    def init_state(self, batch: int = 1):
        return jnp.zeros((batch, (self.K - 1) * self.M), dtype=jnp.complex64)

    def __call__(self, tail, x):
        """(tail (B, (K-1)*M), x (B, T)) -> (y (B, M, F), new_tail).

        T must be a multiple of M; F = T // M output frames per channel.
        y[b, c, f] is channel c's stream at rate fs/M.
        """
        B, T = x.shape
        assert T % self.M == 0, f"block length {T} must be a multiple of M={self.M}"
        xp = jnp.concatenate([tail, x], axis=-1)  # (B, (K-1)*M + T)
        F = T // self.M
        frames = xp.reshape(B, F + self.K - 1, self.M)  # (B, frames, M)
        lhs = jnp.moveaxis(frames, -1, 1)  # (B, M, frames) — phases as features
        rhs = jnp.asarray(self._rhs)

        def depthwise(r):
            return lax.conv_general_dilated(
                r, rhs, window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=self.M, preferred_element_type=jnp.float32,
            )

        u = lax.complex(depthwise(jnp.real(lhs)), depthwise(jnp.imag(lhs)))  # (B, M, F)
        # DFT across phases (type-1 polyphase -> channel c at +c*fs/M)
        y = jnp.fft.fft(u, axis=1).astype(jnp.complex64)
        new_tail = xp[:, xp.shape[-1] - (self.K - 1) * self.M:]
        return y, new_tail
