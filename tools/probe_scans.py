"""Scan formulation shootout at channelizer shape (M=4096, F=2048), state
threaded so nothing is LICM-hoisted. Candidates:

  affine (s = a s' + b, a scalar const):
    A1 current associative_scan
    A2 chunked: within-chunk prefix by triangular-ones MATMUL after a^{-j}
       rescale (MXU), cross-chunk carries by a tiny associative scan
  maxdecay (s = max(a s', v), a per-channel const ~1):
    B1 current associative_scan (2-operand semiring)
    B2 global rescale: env = d^n * cummax(v * d^{-n}) — 1-operand cummax
    B3 B2 + chunked cummax (per-chunk max reduce + tiny chunk prefix +
       within-chunk cummax)
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
from jax import lax

from radioframe.ops.scans import affine_scan, maxdecay_scan

M, F, ITERS = 4096, 2048, 128
G = 128
A = 0.995  # dc_block pole
rng = np.random.default_rng(0)
b_in = jnp.asarray(np.abs(rng.standard_normal((M, F))).astype(np.float32))
decay = jnp.asarray(np.exp(-1.0 / (np.full(M, 0.5) * 15000.0)).astype(np.float32))

# precomputed host constants
ones_lt = np.tril(np.ones((G, G), np.float32))  # lower-tri ones (cumsum matmul)
aj = (A ** np.arange(G)).astype(np.float32)      # a^j within chunk
aj_inv = (A ** -np.arange(G)).astype(np.float32)
aG = np.float32(A ** G)


def affine_chunked(b, s0):
    """s[n] = A*s[n-1] + b[n], A scalar const. Exact chunked form."""
    Mm, Ff = b.shape
    C = Ff // G
    bc = b.reshape(Mm, C, G)
    # within-chunk prefix: p[g] = a^g * cumsum_j<=g (b[j] a^-j)  (one matmul)
    scaled = bc * aj_inv[None, None, :]
    pref = jax.lax.dot_general(
        scaled, ones_lt, (((2,), (1,)), ((), ())),
        precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    p = pref * aj[None, None, :]
    # cross-chunk carries: carry[c] = a^G carry[c-1] + p[c, -1]
    carries = affine_scan(jnp.full((Mm, C), aG), p[:, :, -1], s0)  # (M, C)
    prev = jnp.concatenate([s0[:, None], carries[:, :-1]], axis=1)  # carry in
    s = p + prev[..., None] * (A * aj)[None, None, :]
    return s.reshape(Mm, Ff)


def maxdecay_rescaled(d, v, s0):
    """env[n] = max(d env[n-1], v[n]), d per-channel const ~1: global
    rescale -> 1-operand cummax. env = d^n * cummax(v d^-n), s0 seeded."""
    Mm, Ff = v.shape
    n = jnp.arange(Ff, dtype=jnp.float32)
    dn = d[:, None] ** n[None, :]
    dni = d[:, None] ** (-n[None, :])
    w = v * dni
    w = w.at[:, 0].set(jnp.maximum(w[:, 0], s0 * d))
    return lax.cummax(w, axis=1) * dn


def maxdecay_rescaled_chunked(d, v, s0):
    Mm, Ff = v.shape
    C = Ff // G
    g = jnp.arange(G, dtype=jnp.float32)
    dgi = d[:, None] ** (-g[None, :])
    dg = d[:, None] ** g[None, :]
    vc = v.reshape(Mm, C, G) * dgi[:, None, :]
    within = lax.cummax(vc, axis=2)
    m_end = lax.cummax(v.reshape(Mm, C, G)
                       * (d[:, None] ** (G - 1 - g))[:, None, :], axis=2)[:, :, -1]
    carries = maxdecay_scan(jnp.broadcast_to((d ** G)[:, None], (Mm, C)), m_end, s0)
    prev = jnp.concatenate([s0[:, None], carries[:, :-1]], axis=1)
    env = jnp.maximum(within * dg[:, None, :],
                      (prev * d[:, None])[..., None] * dg[:, None, :])
    return env.reshape(Mm, Ff)


# correctness
s0 = jnp.asarray(np.abs(rng.standard_normal(M)).astype(np.float32))


def _check():
    a_full = jnp.full((M, F), jnp.float32(A))
    ref_a = affine_scan(a_full, b_in, s0)
    got_a = affine_chunked(b_in, s0)
    ea = jnp.max(jnp.abs(ref_a - got_a) / (jnp.abs(ref_a) + 1e-3))
    ref_m = maxdecay_scan(jnp.broadcast_to(decay[:, None], (M, F)), b_in, s0)
    got_m = maxdecay_rescaled(decay, b_in, s0)
    em = jnp.max(jnp.abs(ref_m - got_m) / (jnp.abs(ref_m) + 1e-6))
    got_m2 = maxdecay_rescaled_chunked(decay, b_in, s0)
    em2 = jnp.max(jnp.abs(ref_m - got_m2) / (jnp.abs(ref_m) + 1e-6))
    return ea, em, em2


ea, em, em2 = jax.jit(_check)()
print(f"rel err: affine_chunked {float(ea):.2e}  maxdecay_rescaled {float(em):.2e}  chunked {float(em2):.2e}")


def timed(name, fn):
    f = jax.jit(fn, static_argnames="n")
    float(f(b_in, s0, n=ITERS))
    t0 = time.perf_counter()
    float(f(b_in, s0, n=ITERS))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:26s} {dt*1e3:8.3f} ms/block")


def run_affine_assoc(b, s0, n):
    def body(_, carry):
        s, acc = carry
        y = affine_scan(jnp.full((M, F), jnp.float32(A)), b + s[:, None] * 1e-9, s)
        return y[:, -1], acc + jnp.abs(y[-1, -1])
    return lax.fori_loop(0, n, body, (s0, jnp.float32(0.0)))[1]


def run_affine_chunked(b, s0, n):
    def body(_, carry):
        s, acc = carry
        y = affine_chunked(b + s[:, None] * 1e-9, s)
        return y[:, -1], acc + jnp.abs(y[-1, -1])
    return lax.fori_loop(0, n, body, (s0, jnp.float32(0.0)))[1]


def run_md_assoc(b, s0, n):
    def body(_, carry):
        s, acc = carry
        y = maxdecay_scan(jnp.broadcast_to(decay[:, None], (M, F)), b + s[:, None] * 1e-9, s)
        return y[:, -1], acc + jnp.abs(y[-1, -1])
    return lax.fori_loop(0, n, body, (s0, jnp.float32(0.0)))[1]


def run_md_rescaled(b, s0, n):
    def body(_, carry):
        s, acc = carry
        y = maxdecay_rescaled(decay, b + s[:, None] * 1e-9, s)
        return y[:, -1], acc + jnp.abs(y[-1, -1])
    return lax.fori_loop(0, n, body, (s0, jnp.float32(0.0)))[1]


def run_md_chunked(b, s0, n):
    def body(_, carry):
        s, acc = carry
        y = maxdecay_rescaled_chunked(decay, b + s[:, None] * 1e-9, s)
        return y[:, -1], acc + jnp.abs(y[-1, -1])
    return lax.fori_loop(0, n, body, (s0, jnp.float32(0.0)))[1]


timed("A1_affine_assoc", run_affine_assoc)
timed("A2_affine_chunked_matmul", run_affine_chunked)
timed("B1_maxdecay_assoc", run_md_assoc)
timed("B2_maxdecay_rescaled", run_md_rescaled)
timed("B3_maxdecay_chunked", run_md_chunked)
