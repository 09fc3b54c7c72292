"""AOT executable cache: scene-bucket binaries persisted across processes.

The XLA persistent compilation cache does not work for this host's TPU
backend (remote compiles bypass it), so every one-shot CLI process pays the
scene-executable compile — minutes per bucket. This module serializes the
COMPILED executable (``jax.experimental.serialize_executable``) into the
ADR-0012 cache under an ``executables`` namespace, keyed by everything that
determines the binary:

- platform + device kind + jax/jaxlib versions,
- the model artifact's content digest,
- the executor geometry/config string (bucket, capacity, chunk, stride,
  overlap, transfer dtype, precision policy, ...).

``load_or_compile`` degrades gracefully: any serialize/deserialize error
falls back to the fresh compile and (for loads) evicts the bad entry —
worst case is the status quo. Serialized executables are only valid for the
exact same runtime, which the key's version/platform fields enforce.
"""

from __future__ import annotations

import hashlib
import logging
import pickle
from pathlib import Path

import jax

log = logging.getLogger(__name__)

NAMESPACE = "executables"


def _cpu_features_digest() -> str:
    """Hash of the host CPU feature flags (x86 ISA extensions).

    XLA:CPU AOT executables bind the compile host's machine features; a
    binary from a wider-ISA machine dies at call time on a narrower one
    ("Buffer Definition Event ... not found" / SIGILL). device_kind for the
    CPU backend is generic, so the features must key the cache themselves.
    """
    import platform

    try:
        flags = ""
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
        return hashlib.sha256(
            (platform.machine() + "|" + flags).encode()
        ).hexdigest()[:16]
    except OSError:  # non-Linux: machine arch only
        return platform.machine()


def _runtime_fingerprint() -> str:
    import jaxlib

    dev = jax.devices()[0]
    parts = [
        jax.default_backend(),
        getattr(dev, "device_kind", "unknown"),
        jax.__version__,
        getattr(jaxlib, "__version__", "unknown"),
    ]
    if jax.default_backend() == "cpu":
        parts.append(_cpu_features_digest())
    return "|".join(parts)


def cache_key(artifact_digest: str, config_repr: str) -> str:
    payload = "\n".join([_runtime_fingerprint(), artifact_digest, config_repr])
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def _entry_path(key: str, cache_dir: str | Path | None = None) -> Path:
    from floodsr_tpu.cache_paths import get_cache_dir

    return Path(get_cache_dir(cache_dir)) / NAMESPACE / f"{key}.jaxexec"


def load(key: str, cache_dir: str | Path | None = None):
    """Deserialize a cached executable, or ``None`` (bad entries evicted)."""
    from jax.experimental import serialize_executable

    path = _entry_path(key, cache_dir)
    if not path.exists():
        return None
    try:
        payload, in_tree, out_tree = pickle.loads(path.read_bytes())
        compiled = serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree
        )
        log.debug(f"AOT executable cache hit: {path.name}")
        return compiled
    except Exception as err:  # noqa: BLE001 - any failure → recompile
        log.warning(f"evicting unloadable AOT cache entry {path.name}: {err}")
        path.unlink(missing_ok=True)
        return None


def store(key: str, compiled, cache_dir: str | Path | None = None) -> bool:
    """Serialize a compiled executable into the cache (False on failure)."""
    from jax.experimental import serialize_executable

    path = _entry_path(key, cache_dir)
    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(".part")
        tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree)))
        tmp.replace(path)
        log.debug(
            f"AOT executable cached: {path.name} ({path.stat().st_size / 1e6:.1f} MB)"
        )
        return True
    except Exception as err:  # noqa: BLE001 - serialization support varies
        log.info(f"AOT executable serialization unavailable: {err}")
        return False


def load_or_compile(
    fn,
    example_args: tuple,
    *,
    artifact_digest: str,
    config_repr: str,
    cache_dir: str | Path | None = None,
    enabled: bool = True,
):
    """Cached-compile ``fn`` for ``example_args`` shapes.

    Returns a callable. On cache hit the compile is skipped entirely; on
    miss the jitted fn is lowered + compiled explicitly and the binary is
    stored for the next process.
    """
    if not enabled:
        return fn
    key = cache_key(artifact_digest, config_repr)
    cached = load(key, cache_dir)
    if cached is not None:
        # A deserialized executable can still fail at CALL time (runtime
        # buffer-table mismatches surface only on execution); guard the
        # first calls so a bad cache entry costs one recompile, never a
        # crashed run.
        state = {"impl": cached, "validated": False}

        def guarded(*args):
            if state["validated"]:
                return state["impl"](*args)
            try:
                out = state["impl"](*args)
                # Execution is async: a bad binary (e.g. cross-host machine
                # features) often surfaces only at materialization, which
                # would happen OUTSIDE this try. Block once at validation so
                # the failure is catchable; later calls skip the sync.
                jax.block_until_ready(out)
                state["validated"] = True
                return out
            except Exception as err:  # noqa: BLE001 - fall back to fresh jit
                log.warning(
                    f"cached executable failed at call time; evicting and "
                    f"recompiling: {err}"
                )
                _entry_path(key, cache_dir).unlink(missing_ok=True)
                state["impl"] = fn
                state["validated"] = True
                return fn(*args)

        return guarded
    shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        if hasattr(a, "shape")
        else a,
        example_args,
    )
    compiled = fn.lower(*shapes).compile()
    store(key, compiled, cache_dir)
    return compiled
