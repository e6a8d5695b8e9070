"""AOT executable cache (io/aot_cache.py): the bench deadline-hardening layer.

On the tunnel platform remote compiles have measured slow periods (trivial
compiles taking 120-290 s) that timed out the round-4 driver bench; bench.py
compiles through cached_compile so the driver's run reuses executables
serialized during the round. These tests exercise the cache mechanics on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devit_tpu.io import aot_cache


def _cpu_supports_roundtrip():
    """Serialize AND deserialize AND execute: XLA:CPU in this image
    serializes fine but the AOT loader rejects execution with a
    machine-feature mismatch (compile features carry preference flags like
    +prefer-no-gather that host introspection lacks). bench handles that
    case by recompiling on first-execute failure; the cache-HIT tests here
    need the roundtrip to actually work."""
    try:
        from jax.experimental import serialize_executable as se

        x = jnp.zeros((2,))
        c = jax.jit(lambda x: x + 1).lower(x).compile()
        c2 = se.deserialize_and_load(*se.serialize(c))
        np.testing.assert_allclose(jax.device_get(c2(x)), np.ones((2,)))
        return True
    except Exception:
        return False


_roundtrip_ok = pytest.mark.skipif(
    not _cpu_supports_roundtrip(),
    reason="XLA:CPU AOT deserialize-execute unsupported on this host "
           "(bench recompiles on execute failure; hit path untestable here)")


@_roundtrip_ok
def test_roundtrip_and_hit(tmp_path):
    calls = []

    def f(x):
        calls.append(1)
        return (x @ x).sum()

    x = jnp.ones((8, 8), jnp.float32)
    c1 = aot_cache.cached_compile(f, "t_roundtrip", x,
                                  cache_dir=str(tmp_path), verbose=False)
    assert len(calls) == 1  # traced (compiled fresh)
    r1 = jax.device_get(c1(x))
    # second build must come from disk: tracing (and thus f) must NOT re-run
    c2 = aot_cache.cached_compile(f, "t_roundtrip", x,
                                  cache_dir=str(tmp_path), verbose=False)
    assert len(calls) == 1
    r2 = jax.device_get(c2(x))
    np.testing.assert_allclose(r1, r2)
    assert len(list(tmp_path.iterdir())) == 1


def test_distinct_shapes_and_names_get_distinct_entries(tmp_path):
    f = lambda x: x * 2
    a = jnp.ones((4,)); b = jnp.ones((8,))
    aot_cache.cached_compile(f, "t_k", a, cache_dir=str(tmp_path), verbose=False)
    aot_cache.cached_compile(f, "t_k", b, cache_dir=str(tmp_path), verbose=False)
    aot_cache.cached_compile(f, "t_k2", a, cache_dir=str(tmp_path), verbose=False)
    assert len(list(tmp_path.iterdir())) == 3
    # and the path is deterministic
    assert aot_cache.cache_path("t_k", (a,), str(tmp_path)) == \
        aot_cache.cache_path("t_k", (a,), str(tmp_path))


def test_corrupt_entry_falls_back_to_compile(tmp_path):
    f = lambda x: x - 1
    x = jnp.ones((3,))
    p = aot_cache.cache_path("t_corrupt", (x,), str(tmp_path))
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    with open(p, "wb") as fh:
        fh.write(b"not a pickle")
    c = aot_cache.cached_compile(f, "t_corrupt", x,
                                 cache_dir=str(tmp_path), verbose=False)
    np.testing.assert_allclose(jax.device_get(c(x)), np.zeros((3,)))


@_roundtrip_ok
def test_pytree_args_and_outputs(tmp_path):
    def f(tree, y):
        return {"s": tree["a"].sum() + tree["b"].sum(), "y2": y * y}

    tree = {"a": jnp.ones((4, 4)), "b": jnp.full((2,), 3.0)}
    y = jnp.arange(4.0)
    c1 = aot_cache.cached_compile(f, "t_tree", tree, y,
                                  cache_dir=str(tmp_path), verbose=False)
    out1 = jax.device_get(c1(tree, y))
    c2 = aot_cache.cached_compile(f, "t_tree", tree, y,
                                  cache_dir=str(tmp_path), verbose=False)
    out2 = jax.device_get(c2(tree, y))
    np.testing.assert_allclose(out1["s"], out2["s"])
    np.testing.assert_allclose(out1["y2"], out2["y2"])
