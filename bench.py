"""Benchmark harness — prints ONE JSON line for the driver.

Metric: aggregate DDC+demod throughput in input IQ samples/s/chip through the
full RX block program (NCO -> CIC -> comp FIR -> OLS mode bank -> demod bank
-> AGC), the BASELINE.json north-star metric. vs_baseline is against the
10 Gsps / v5p-16 target prorated to one chip (625 Msps/chip).

Run on the real TPU (default platform); falls back to CPU if none.
Input blocks are pre-staged on device and state is donated — the benchmark
measures the compute path, not host I/O (SURVEY.md §7 hard-part #4).
"""

import json
import time

import jax

# remote (axon) compiles take minutes; persist them across bench runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from radioframe.core.config import CicStage, FirStage, RxConfig
from radioframe.ops import demod as demod_op
from radioframe.ops import nco
from radioframe.pipelines.rx_chain import RxChain

TARGET_PER_CHIP = 10e9 / 16  # BASELINE: >=10 Gsps aggregate on v5p-16


def main():
    C = 128          # channels (TPU lane width)
    blocks = 16      # timed iterations
    cfg = RxConfig(
        fs_in=1_536_000.0,
        channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512,
    )
    chain = RxChain(cfg)
    T = 8 * chain.min_block

    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.standard_normal((C, T)) + 1j * rng.standard_normal((C, T))).astype(np.complex64))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    step = jax.jit(chain.step, donate_argnums=0)

    # the axon remote backend neither blocks in block_until_ready nor supports
    # op-by-op complex64 dispatch/host transfers — force execution by fetching
    # a jit-computed float32 scalar that depends on the full output
    reduce = jax.jit(lambda a: jnp.sum(jnp.abs(a)))

    def sync(audio):
        return float(reduce(audio))

    state = chain.init_state(C)
    state, audio, aux = step(state, iq, words, mode)  # compile
    sync(audio)
    state, audio, aux = step(state, iq, words, mode)  # warm
    sync(audio)

    t0 = time.perf_counter()
    for _ in range(blocks):
        state, audio, aux = step(state, iq, words, mode)
    sync(audio)
    dt = time.perf_counter() - t0

    samples = C * T * blocks  # channel-input IQ samples consumed
    rate = samples / dt
    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "ddc_chain_input_samples_per_s_per_chip",
        "value": round(rate, 1),
        "unit": "IQ samples/s/chip",
        "vs_baseline": round(rate / TARGET_PER_CHIP, 4),
        "detail": {
            "device": str(dev), "channels": C, "block_T": T, "decim": cfg.decim,
            "iters": blocks, "seconds": round(dt, 4),
        },
    }))


if __name__ == "__main__":
    main()
