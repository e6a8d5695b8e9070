"""On-disk AOT executable cache for jitted programs.

Why this exists: on the tunnel platform a remote compile costs 30-90 s per
program on a good day and has measured slow periods where a TRIVIAL 512^2
matmul compile took 120-290 s (observed rounds 3-5) — which is how the
round-4 driver bench run timed out (BENCH_r04.json rc=124) before printing
its JSON line. JAX's persistent compilation cache does not help here: cache
entries are WRITTEN but never read back on this backend (measured: second
process recompiles at full cost with valid entries on disk). Explicit AOT
serialization does work: `jax.experimental.serialize_executable` round-trips
the compiled program, and `deserialize_and_load` costs ~0.2 s + one remote
load (~10-20 s) instead of the full compile.

So bench.py (and anything else with a wall deadline) compiles through
`cached_compile`, which memoizes the serialized executable on disk keyed by
(program name, jax version, device fingerprint, arg avals). Cache entries are
machine/session-portable across processes on the same host+backend — exactly
the driver's end-of-round `python bench.py` scenario, which reuses programs
compiled (and cached) during the round.

Failure policy: the cache is an optimization. Any error on load falls back
to a fresh compile; any error on save is swallowed. A deserialized executable
that fails at EXECUTION time (stale device topology etc.) is the caller's
concern — `cached_compile` callers that need hard robustness should wrap the
first (warmup) call and rebuild with `refresh=True` on failure, as bench.py
does.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import time

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".aot_cache")


def _device_fingerprint() -> str:
    d = jax.devices()[0]
    return "%s:%s:%d" % (d.platform, getattr(d, "device_kind", "?"),
                         jax.device_count())


def _args_fingerprint(args) -> str:
    parts = []
    for leaf in jax.tree_util.tree_leaves(args):
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        parts.append(f"{shape}:{dtype}" if shape is not None else repr(leaf))
    return "|".join(parts)


_CODE_FP: str | None = None


def _code_fingerprint() -> str:
    """Hash of the repo's Python sources (devit_tpu/**/*.py + repo-root
    *.py), folded into every cache key. Without it, editing model math that
    doesn't change arg avals (fast_gelu coefficients, normalize constants,
    feature stacking, ...) would leave the OLD executable valid in the cache:
    it deserializes AND executes fine, so the validated fallback never fires,
    and a warm-cache bench/daemon silently runs stale code. Conservative by
    design — any .py edit invalidates — because a wrong-program cache hit is
    silent and a spurious miss just costs one recompile."""
    global _CODE_FP
    if _CODE_FP is None:
        root = os.path.dirname(DEFAULT_DIR)
        h = hashlib.sha256()
        files = []
        for base, _, names in os.walk(os.path.join(root, "devit_tpu")):
            files += [os.path.join(base, n) for n in names
                      if n.endswith(".py")]
        try:
            files += [os.path.join(root, n) for n in os.listdir(root)
                      if n.endswith(".py")]
        except OSError:
            pass
        for p in sorted(files):
            h.update(os.path.relpath(p, root).encode())
            try:
                with open(p, "rb") as fh:
                    h.update(fh.read())
            except OSError:
                pass
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def cache_path(name: str, args, cache_dir: str | None = None,
               salt: str = "") -> str:
    cache_dir = cache_dir or os.environ.get("DEVIT_AOT_CACHE", DEFAULT_DIR)
    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(_code_fingerprint().encode())
    h.update(_device_fingerprint().encode())
    h.update(_args_fingerprint(args).encode())
    h.update(salt.encode())
    return os.path.join(cache_dir, f"{name}-{h.hexdigest()[:16]}.aot")


def cached_compile(fn, name: str, *args, cache_dir: str | None = None,
                   refresh: bool = False, verbose: bool = True,
                   salt: str = ""):
    """Compile `jax.jit(fn)` at `args`' shapes, going through the on-disk AOT
    cache. Returns the loaded compiled executable (call it positionally with
    arrays matching `args`' structure). `refresh=True` skips the cache read
    (use after an execution failure on a cached program). `salt` must encode
    any program-changing state that is NOT visible in the args' avals —
    closed-over flags (use_pallas/fast_math), static pytree leaves, etc. —
    or two different programs would collide on one cache entry."""
    compiled, _ = _cached_compile(fn, name, *args, cache_dir=cache_dir,
                                  refresh=refresh, verbose=verbose, salt=salt)
    return compiled


def _cached_compile(fn, name: str, *args, cache_dir: str | None = None,
                    refresh: bool = False, verbose: bool = True,
                    salt: str = ""):
    """cached_compile + provenance: returns (compiled, from_cache) so callers
    can distinguish a disk-loaded executable (worth one recompile retry on
    execute failure) from a freshly compiled one (an execute failure is
    genuine — HBM OOM etc. — and a retry would just pay the 30-600 s compile
    again before failing identically)."""
    path = cache_path(name, args, cache_dir, salt)
    if not refresh and os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se

            t0 = time.monotonic()
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            if verbose:
                print(f"aot_cache: loaded {name} in "
                      f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
            return compiled, True
        except Exception as e:  # corrupted/stale entry -> recompile
            if verbose:
                print(f"aot_cache: load of {name} failed ({e!r}); compiling",
                      file=sys.stderr)
    t0 = time.monotonic()
    compiled = jax.jit(fn).lower(*args).compile()
    if verbose:
        print(f"aot_cache: compiled {name} in {time.monotonic() - t0:.1f}s",
              file=sys.stderr)
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)  # atomic: concurrent writers never tear
    except Exception as e:
        if verbose:
            print(f"aot_cache: save of {name} failed ({e!r})", file=sys.stderr)
    return compiled, False


def cached_compile_validated(fn, name: str, *args, cache_dir: str | None = None,
                             verbose: bool = True, salt: str = ""):
    """`cached_compile` + execute-once validation: a cached entry that
    deserializes but fails at RUN time (stale device topology, XLA:CPU AOT
    host-feature rejection, ...) triggers one fresh compile instead of
    propagating. A FRESHLY compiled executable that fails at execute raises
    straight through — the failure is genuine (HBM OOM, ...) and retrying
    would pay the full compile a second time before failing identically.
    The validation run doubles as the warmup every program needs.
    Returns (compiled, first_output)."""
    compiled, from_cache = _cached_compile(fn, name, *args,
                                           cache_dir=cache_dir,
                                           verbose=verbose, salt=salt)
    try:
        out = compiled(*args)
    except Exception as e:
        if not from_cache:
            raise
        if verbose:
            print(f"aot_cache: cached {name} failed at execute ({e!r}); "
                  f"recompiling", file=sys.stderr)
        compiled = cached_compile(fn, name, *args, cache_dir=cache_dir,
                                  refresh=True, verbose=verbose, salt=salt)
        out = compiled(*args)
    return compiled, out


def split_arrays(tree):
    """Split a pytree into (array_leaves, rebuild) where rebuild(new_leaves)
    reconstitutes the tree with the non-array leaves (e.g. CompactViT's
    static ints/bools) closed over as Python constants. This is what lets a
    program take big frozen param pytrees as jit ARGUMENTS rather than
    closure constants: a closure-captured compact ensemble serializes to
    713 MB (measured — the weights get baked into the executable), while the
    argument version's AOT payload is just compiled code — and the cache
    entry is then REUSABLE across deployments with identical geometry.
    ShapeDtypeStruct leaves count as arrays (so eval_shape trees split the
    same way as real ones)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    is_arr = [hasattr(l, "shape") and hasattr(l, "dtype") for l in flat]
    arrs = [l for l, m in zip(flat, is_arr) if m]
    # close over ONLY the statics: nulling the array slots keeps rebuild from
    # pinning the original weight arrays (~120 MB host copy at canonical
    # geometry, GBs at ImageNet scale) for the life of the program
    template = [None if m else l for l, m in zip(flat, is_arr)]

    def rebuild(new_arrs):
        it = iter(new_arrs)
        merged = [next(it) if m else l for l, m in zip(template, is_arr)]
        return jax.tree_util.tree_unflatten(treedef, merged)

    return arrs, rebuild


def static_salt(tree) -> str:
    """Deterministic string of a pytree's NON-array leaves (the statics that
    `split_arrays` closes over) — pass as `salt` so programs that differ only
    in closed-over statics get distinct cache entries."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    statics = [repr(l) for l in flat
               if not (hasattr(l, "shape") and hasattr(l, "dtype"))]
    return f"{treedef}|{'|'.join(statics)}"
