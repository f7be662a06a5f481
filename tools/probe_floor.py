"""Is there a per-fori-iteration floor on the axon backend? Time a trivial
body and a medium body at several iteration counts."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax

x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)).astype(np.float32))
big = jnp.asarray(np.random.default_rng(1).standard_normal((4096, 1024)).astype(np.float32))


def run_tiny(x, n):
    def body(i, acc):
        return acc + jnp.sum(x * (1.0 + acc))  # iteration-dependent: no hoist

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


def run_mid(big, n):
    def body(i, acc):
        return acc + jnp.sum(jnp.abs(big * (1.0 + acc)))  # 16.8 MB pass

    return lax.fori_loop(0, n, body, jnp.float32(0.0))


for name, fn, arg in (("tiny_256x256", run_tiny, x), ("mid_4096x1024", run_mid, big)):
    for n in (32, 128, 512):
        f = jax.jit(fn, static_argnames="n")
        float(f(arg, n=n))
        t0 = time.perf_counter()
        float(f(arg, n=n))
        dt = time.perf_counter() - t0
        print(f"{name:16s} n={n:4d}  {dt*1e3/n:8.4f} ms/iter  total {dt*1e3:8.1f} ms")
