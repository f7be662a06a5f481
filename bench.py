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
    blocks = 64      # timed iterations (one dispatch; amortizes the axon
                     # tunnel's ~20-30 ms execute round trip)
    cfg = RxConfig(
        fs_in=1_536_000.0,
        channels=C,
        stages=(CicStage(R=8, N=4), FirStage(R=4, numtaps=97, passband_hz=15_000.0)),
        ols_hop=512,
        fuse_frontend=True,  # fused NCO+CIC Pallas kernel (stage timing showed
                             # the full-rate front end was 68% of chain compute)
    )
    chain = RxChain(cfg)
    T = 8 * chain.min_block

    # AXON BACKEND CONSTRAINTS (probed): complex64 host<->device transfers and
    # op-by-op complex dispatch are UNIMPLEMENTED; block_until_ready doesn't
    # block. Therefore: f32-only I/O (re/im planes), complex state created
    # INSIDE jit, and sync via a jitted f32 scalar + host fetch.
    rng = np.random.default_rng(0)
    iq_ri = jnp.asarray(rng.standard_normal((2, C, T)).astype(np.float32))
    words = jnp.asarray(nco.freq_word(np.linspace(-5e5, 5e5, C), cfg.fs_in))
    mode = jnp.asarray(np.arange(C) % 4, jnp.int32)

    def run_blocks(state, iq_ri, words, mode, n):
        # all iterations inside ONE executable: the axon tunnel pays a
        # multi-second round trip per dispatch, so host-looped steps would
        # measure network latency, not the DDC
        iq = jax.lax.complex(iq_ri[0], iq_ri[1])

        def body(_, carry):
            st, acc = carry
            st, audio, _ = chain.step(st, iq, words, mode)
            return st, acc + jnp.sum(jnp.abs(audio[:, -1]))

        state, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return state, acc

    run = jax.jit(run_blocks, static_argnames="n", donate_argnums=0)
    init = jax.jit(lambda: chain.init_state(C))

    state = init()
    state, s = run(state, iq_ri, words, mode, n=blocks)  # compile + warm
    float(s)

    t0 = time.perf_counter()
    state, s = run(state, iq_ri, words, mode, n=blocks)
    float(s)
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
