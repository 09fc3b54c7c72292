"""Checksum helpers for model artifacts (reference parity: ``floodsr/checksums.py``)."""

from __future__ import annotations

import hashlib
import logging
from pathlib import Path

log = logging.getLogger(__name__)

_CHUNK = 1024 * 1024


def compute_sha256(file_path: str | Path, chunk_size: int = _CHUNK) -> str:
    """Streamed SHA256 digest of a file."""
    path = Path(file_path)
    assert path.exists(), f"file does not exist: {path}"
    assert path.is_file(), f"path is not a file: {path}"
    hasher = hashlib.sha256()
    with path.open("rb") as stream:
        while chunk := stream.read(chunk_size):
            hasher.update(chunk)
    return hasher.hexdigest()


def verify_sha256(file_path: str | Path, expected_sha256: str) -> bool:
    """True when the file digest matches the expected SHA256 (case-insensitive)."""
    assert expected_sha256, "expected_sha256 cannot be empty"
    return compute_sha256(file_path).lower() == expected_sha256.strip().lower()


def assert_sha256(file_path: str | Path, expected_sha256: str) -> None:
    """Raise ValueError when the file digest mismatches the expected SHA256."""
    assert expected_sha256, "expected_sha256 cannot be empty"
    actual = compute_sha256(file_path)
    if actual.lower() != expected_sha256.strip().lower():
        raise ValueError(
            f"checksum mismatch for {file_path}: expected {expected_sha256}, got {actual}"
        )
