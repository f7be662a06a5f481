"""PFB formulation probe on TPU: grouped conv (current) vs shifted-add."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from radioframe.ops.pfb import PfbChannelizer
from radioframe.ops.filter_design import pfb_prototype_taps

M, K = 4096, 8
T = 128 * M * K  # same as bench block
op = PfbChannelizer(M, K)
rng = np.random.default_rng(0)
wb_ri = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
h = pfb_prototype_taps(M, K).reshape(K, M).astype(np.float32)
hj = jnp.asarray(h)

def run_conv(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])
    def body(_, carry):
        st, acc = carry
        y, st = op(st, x[None, :])
        return st, acc + jnp.sum(jnp.abs(y[0, :, -1]))
    return lax.fori_loop(0, n, body, (op.init_state(1), jnp.float32(0.0)))

def shifted_pfb(tail, x):
    # frames (F+K-1, M); u[f] = sum_t h[t] * frames[f + K-1 - t]
    B, T_ = x.shape
    xp = jnp.concatenate([tail, x], axis=-1)
    F = T_ // M
    fr = xp.reshape(B, F + K - 1, M)
    u = jnp.zeros((B, F, M), jnp.complex64)
    for t in range(K):
        u = u + hj[t][None, None, :] * fr[:, K - 1 - t : K - 1 - t + F, :]
    y = jnp.fft.fft(u, axis=-1).astype(jnp.complex64)
    return y, xp[:, xp.shape[-1] - (K - 1) * M :]

def run_shift(wb_ri, n):
    x = lax.complex(wb_ri[0], wb_ri[1])
    def body(_, carry):
        st, acc = carry
        y, st = shifted_pfb(st, x[None, :])
        return st, acc + jnp.sum(jnp.abs(y[0, :, -1]))
    return lax.fori_loop(0, n, body, (op.init_state(1), jnp.float32(0.0)))

import sys
for name, fn in (("shifted_add", run_shift), ("grouped_conv", run_conv)):
    f = jax.jit(fn, static_argnames="n")
    s = f(wb_ri, n=8); float(s[1])
    t0 = time.perf_counter(); s = f(wb_ri, n=8); float(s[1])
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3/8:.2f} ms/block ({T*8/dt/1e6:.0f} Msps)", flush=True)
# (parity is proven on CPU in tests; axon op-by-op complex dispatch is
# unimplemented, so no eager parity check here)
