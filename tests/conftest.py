"""Test config: fake an 8-device CPU mesh (SURVEY.md §4.2 #5).

Env vars must be set before jax imports. Set RADIOFRAME_TEST_TPU=1 to run the
suite on real TPU devices instead (kernel tests then compile for real).
"""

import os

if not os.environ.get("RADIOFRAME_TEST_TPU"):
    # The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon baked
    # in, so plain env vars are too late here — use jax.config directly.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Plane-transfer jit conventions (VERDICT r4 ask #3; SURVEY §4.2 #5).
#
# The axon TPU transport cannot move complex64 across the host boundary or
# dispatch complex ops op-by-op — the proven convention (bench.py,
# tools/verify_tpu.py, the hardened APIs) is: f32 I/Q planes across the
# boundary, ONE jitted program, complex formed/split on device. These
# helpers apply that convention to test call sites so the same tests run
# unmodified on CPU and on the real chip:
#
#   step = jwrap(chain.step)        # jit whose complex args/results cross
#   st, audio, aux = step(st, iq, words, mode)   # ... as f32 planes
#   out = jrun(fn, *args)           # one-shot form
#
# Complex pytree leaves are split host-side into {"__c_re", "__c_im"}
# marker dicts, reassembled with lax.complex inside the jitted program,
# split again on the way out, and joined to numpy complex on the host.
# f32/int leaves pass through untouched, so CPU behavior is identical.
# ---------------------------------------------------------------------------

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _is_marker(x):
    return isinstance(x, dict) and "__c_re" in x


_REIM_JIT = None


def _split_host(x):
    if hasattr(x, "dtype") and np.iscomplexobj(x):
        if isinstance(x, jax.Array):
            # device-resident complex: split ON DEVICE and fetch f32
            # planes (np.asarray on complex would be the failing transfer)
            global _REIM_JIT
            if _REIM_JIT is None:
                _REIM_JIT = jax.jit(lambda a: (jnp.real(a), jnp.imag(a)))
            re, im = _REIM_JIT(x)
            return {"__c_re": np.asarray(re), "__c_im": np.asarray(im)}
        xn = np.asarray(x)
        return {"__c_re": np.ascontiguousarray(xn.real, np.float32),
                "__c_im": np.ascontiguousarray(xn.imag, np.float32)}
    return x


def to_host(tree):
    """Fetch a pytree to numpy with plane-safe complex crossings."""
    return jax.tree.map(lambda x: _join_host(_split_host(x)), tree)


# Fused-kernel channel counts: compiled Mosaic needs full 128-lane tiles
# (pfb_dft.fused_channels_ok); interpret mode (CPU mesh) accepts any pow2,
# and the small sizes keep interpret runtimes inside the CI budget.
_ON_CPU = jax.default_backend() == "cpu"
FUSED_M = 64 if _ON_CPU else 128
FUSED_M_SMALL = 32 if _ON_CPU else 128


def _join_host(x):
    if _is_marker(x):
        return np.asarray(x["__c_re"]) + 1j * np.asarray(x["__c_im"])
    return x


def jwrap(fn):
    """jit with plane-crossing I/O for complex leaves (module note above).

    The inner jit caches across calls (stable arg structure -> no
    retrace), so this is a drop-in for ``jax.jit(fn)`` at test call sites
    — including streaming loops that thread returned state back in."""

    def inner(marked_args, marked_kwargs):
        join = lambda m: (jax.lax.complex(jnp.asarray(m["__c_re"]),
                                          jnp.asarray(m["__c_im"]))
                          if _is_marker(m) else m)
        args = jax.tree.map(join, marked_args, is_leaf=_is_marker)
        kwargs = jax.tree.map(join, marked_kwargs, is_leaf=_is_marker)
        out = fn(*args, **kwargs)
        return jax.tree.map(
            lambda o: {"__c_re": jnp.real(o), "__c_im": jnp.imag(o)}
            if jnp.iscomplexobj(o) else o, out)

    jitted = jax.jit(inner)

    def call(*args, **kwargs):
        marked = jax.tree.map(_split_host, tuple(args))
        marked_kw = jax.tree.map(_split_host, kwargs)
        out = jitted(marked, marked_kw)
        return jax.tree.map(_join_host, out, is_leaf=_is_marker)

    return call


def jrun(fn, *args, **kwargs):
    """One-shot ``jwrap(fn)(*args)`` for single comparisons."""
    return jwrap(fn)(*args, **kwargs)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-coverage mode)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (interpret-mode Pallas sharding, 4096-channel "
        "scale, digital modes); excluded by default so the default suite fits "
        "a CI budget — enable with --runslow or RADIOFRAME_RUNSLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RADIOFRAME_TEST_TPU"):
        # the real-TPU environment has ONE chip; multi-device mesh tests
        # (sharding equality, RDMA halos, DCN analogs) need the 8-device
        # CPU mesh and are skipped here with an explicit reason so the
        # on-TPU run enumerates them instead of erroring (VERDICT r4 #3)
        import re

        import jax as _jax

        if len(_jax.devices()) < 8:
            needs_mesh = re.compile(r"shard|rdma|mesh|dcn|pipelined|subset_matches_full",
                                    re.IGNORECASE)
            skip_mesh = pytest.mark.skip(
                reason="needs a multi-device mesh (1 TPU chip here; covered "
                       "by the 8-device CPU-mesh suite)")
            for item in items:
                if needs_mesh.search(item.nodeid):
                    item.add_marker(skip_mesh)
    if config.getoption("--runslow") or os.environ.get("RADIOFRAME_RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow: pass --runslow (or RADIOFRAME_RUNSLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
