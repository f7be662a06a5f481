"""Probe: can a larger OLS hop cut the flagship's mode-bank bytes?

The OLS bank's overhead factor is nfft/hop: every audio sample drags
nfft/hop bytes through each of the stage's ~6 near-bandwidth HBM passes.
With 513-tap mode filters, pow2 hop and pow2 FFT force hop = nfft/2
(overhead 2.0) — the only way down is a NON-pow2 hop (1536 with nfft
2048 -> 1.33), which costs two things this probe prices together:
  (a) the frame build falls off the integer-overlap reshape fast path
      onto a strided gather (ops/ols._overlapped_frames), a class of
      formulation that has lost on TPU before (r3: jnp.take un-permute
      3.13 vs 3.71 Gsps);
  (b) the block length must be a multiple of the hop at audio rate, so
      the input block grows 1.5x (393216/channel) to stay hop-aligned.

Run on the chip:  python tools/probe_ols_hop.py  [--iters 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from radioframe.core.config import CicStage, FirStage, ModeFilters, RxConfig
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain


def _sync(x):
    return float(jax.jit(lambda v: jnp.float32(v))(x))


def run_chain(hop: int, t_audio: int, iters: int):
    C = 128
    cfg = RxConfig(
        fs_in=1_536_000.0, channels=C,
        stages=(CicStage(R=8, N=4),
                FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=hop, fuse_frontend=True, fuse_frontend_depth=2,
        emit_spectrum=False)
    chain = RxChain(cfg)
    bank = chain.mode_bank
    print(f"  hop={hop}: nfft={bank.nfft} true_hop={bank.hop} "
          f"overhead={bank.nfft / bank.hop:.2f}", flush=True)
    T = t_audio * cfg.decim
    rng = np.random.default_rng(5)
    ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-600e3, 600e3, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run(state, ri, words, mode, n):
        iq = jax.lax.complex(ri[0], ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, aux = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))

    runj = jax.jit(run, static_argnames="n", donate_argnums=0)
    state = jax.jit(lambda: chain.init_state(C))()
    state, s = runj(state, ri, words, mode, n=iters)
    _sync(s)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, s = runj(state, ri, words, mode, n=iters)
        _sync(s)
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1]
    rate = C * T * iters / dt
    print(f"  hop={hop}: {rate / 1e9:.2f} Gsps  (block T={T}/ch, "
          f"runs {['%.4f' % t for t in sorted(ts)]})", flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()
    print(f"probe_ols_hop on {jax.devices()[0]}", flush=True)
    # hop-aligned audio block: lcm(4096, 1536*?) -> 12288 audio samples
    # for both variants (1.5x the bench block; same for both, fair)
    base = run_chain(512, 12288, args.iters)
    big = run_chain(1536, 12288, args.iters)
    print(f"verdict: hop1536/hop512 = {big / base:.3f}x", flush=True)


if __name__ == "__main__":
    main()
