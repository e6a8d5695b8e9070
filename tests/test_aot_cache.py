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


def test_salt_separates_programs_with_identical_avals(tmp_path):
    """Two programs that differ only in closed-over statics (use_pallas,
    fast_math, CompactViT layer geometry ints, ...) have identical arg avals
    — the salt is what keeps them from colliding on ONE cache entry (and
    serving the wrong program on a hit)."""
    x = jnp.ones((4,))
    p_a = aot_cache.cache_path("t_salt", (x,), str(tmp_path), salt="flag=A")
    p_b = aot_cache.cache_path("t_salt", (x,), str(tmp_path), salt="flag=B")
    p_a2 = aot_cache.cache_path("t_salt", (x,), str(tmp_path), salt="flag=A")
    assert p_a != p_b
    assert p_a == p_a2  # deterministic across calls (a fresh process must hit)


def test_static_salt_deterministic_and_distinguishing():
    from devit_tpu.io.aot_cache import static_salt

    t1 = {"w": jnp.ones((2,)), "heads": 6, "fast": True}
    t2 = {"w": jnp.ones((2,)), "heads": 6, "fast": True}
    t3 = {"w": jnp.ones((2,)), "heads": 5, "fast": True}
    assert static_salt(t1) == static_salt(t2)
    assert static_salt(t1) != static_salt(t3)
    # array VALUES must not enter the salt (weights ride as arguments; only
    # statics shape the program)
    t4 = {"w": jnp.zeros((2,)), "heads": 6, "fast": True}
    assert static_salt(t1) == static_salt(t4)


def test_code_fingerprint_in_key(tmp_path, monkeypatch):
    """A code edit must invalidate cache entries: same name + same avals would
    otherwise silently serve the OLD executable (it deserializes and executes
    fine, so the validated fallback never fires)."""
    x = jnp.ones((4,))
    p1 = aot_cache.cache_path("t_code", (x,), str(tmp_path))
    monkeypatch.setattr(aot_cache, "_CODE_FP", "deadbeefdeadbeef")
    p2 = aot_cache.cache_path("t_code", (x,), str(tmp_path))
    assert p1 != p2


@_roundtrip_ok
def test_validated_recompiles_on_stale_incompatible_entry(tmp_path):
    """cached_compile_validated: an entry that DESERIALIZES but fails at
    execute (here: a different program's executable copied onto the path —
    the stale-topology/foreign-host class) triggers exactly one fresh compile
    and still returns the right output."""
    import shutil

    x = jnp.ones((4,))
    y = jnp.ones((6, 6))
    # a valid entry for an UNRELATED program (different arity/avals)
    aot_cache.cached_compile(lambda a, b: a @ b, "t_other", y, y,
                             cache_dir=str(tmp_path), verbose=False)
    other = aot_cache.cache_path("t_other", (y, y), str(tmp_path))
    victim = aot_cache.cache_path("t_victim", (x,), str(tmp_path))
    shutil.copy(other, victim)
    c, out = aot_cache.cached_compile_validated(
        lambda a: a + 41, "t_victim", x, cache_dir=str(tmp_path),
        verbose=False)
    np.testing.assert_allclose(jax.device_get(out), np.full((4,), 42.0))
    np.testing.assert_allclose(jax.device_get(c(x)), np.full((4,), 42.0))


def test_validated_does_not_retry_fresh_compile_failures(monkeypatch):
    """An execute failure on a FRESHLY-compiled executable is genuine (HBM
    OOM, ...) — retrying would pay the full 30-600 s compile a second time
    before failing identically. The retry is reserved for disk-loaded
    entries."""
    compiles = []

    def fake_cached_compile(fn, name, *args, **kw):
        compiles.append(name)
        def boom(*a):
            raise RuntimeError("resource exhausted")
        return boom

    monkeypatch.setattr(aot_cache, "_cached_compile",
                        lambda *a, **k: (fake_cached_compile(*a, **k), False))
    monkeypatch.setattr(aot_cache, "cached_compile",
                        fake_cached_compile)
    with pytest.raises(RuntimeError, match="resource exhausted"):
        aot_cache.cached_compile_validated(lambda x: x, "t_fresh",
                                           jnp.ones((2,)), verbose=False)
    assert compiles == ["t_fresh"]  # exactly one attempt, no retry


def test_split_arrays_does_not_pin_original_arrays():
    """rebuild must close over ONLY the statics: pinning the original array
    leaves keeps a full host copy of the division weights (~120 MB at
    canonical geometry) alive next to the device-committed copy for the
    daemon's lifetime."""
    import gc
    import weakref

    a = np.ones((64, 64), np.float32)
    tree = {"w": a, "heads": 6}
    arrs, rebuild = aot_cache.split_arrays(tree)
    ref = weakref.ref(a)
    del a, tree, arrs
    gc.collect()
    assert ref() is None, "rebuild closure pins the original array leaves"
    out = rebuild([np.zeros((64, 64), np.float32)])
    assert out["heads"] == 6 and out["w"].sum() == 0.0


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
