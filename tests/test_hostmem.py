"""Host allocator tuning (floodsr_tpu/hostmem.py)."""

from __future__ import annotations

import numpy as np
import pytest

from floodsr_tpu import hostmem


@pytest.fixture
def fresh_state(monkeypatch):
    """Reset the module's once-per-process latch around each test."""
    monkeypatch.setattr(hostmem, "_applied", None)
    yield
    monkeypatch.setattr(hostmem, "_applied", None)


def test_opt_out_env(fresh_state, monkeypatch):
    monkeypatch.setenv("FLOODSR_HOST_MALLOC_TUNE", "0")
    assert hostmem.tune_malloc() is False
    # Latched: flipping the env after the first call does not re-apply.
    monkeypatch.setenv("FLOODSR_HOST_MALLOC_TUNE", "1")
    assert hostmem.tune_malloc() is False


def test_applies_and_is_idempotent(fresh_state, monkeypatch):
    monkeypatch.delenv("FLOODSR_HOST_MALLOC_TUNE", raising=False)
    first = hostmem.tune_malloc()
    assert isinstance(first, bool)
    assert hostmem.tune_malloc() is first
    # Allocator still functions for large raster-sized buffers.
    arr = np.empty((1024, 1024), dtype=np.float32)
    arr.fill(1.0)
    assert float(arr.sum()) == float(arr.size)


def test_non_linux_returns_false(fresh_state, monkeypatch):
    monkeypatch.delenv("FLOODSR_HOST_MALLOC_TUNE", raising=False)
    monkeypatch.setattr(hostmem.sys, "platform", "darwin")
    assert hostmem.tune_malloc() is False
