"""Registry: manifest, retrieval backends, fetch/cache, worker discovery."""

import json
import hashlib
from pathlib import Path

import pytest

from floodsr_tpu.checksums import assert_sha256, compute_sha256, verify_sha256
from floodsr_tpu.cache_paths import get_cache_dir, get_model_cache_path
from floodsr_tpu.model_registry import (
    FileRetrievalBackend,
    HttpRetrievalBackend,
    fetch_model,
    get_retrieval_backend,
    list_models,
    list_runnable_model_versions,
    load_models_manifest,
    model_worker_exists,
    resolve_model,
    resolve_model_worker_class,
)

pytestmark = pytest.mark.unit


class TestChecksums:
    def test_compute_and_verify(self, tmp_path):
        fp = tmp_path / "blob.bin"
        fp.write_bytes(b"hello floodsr")
        digest = compute_sha256(fp)
        assert digest == hashlib.sha256(b"hello floodsr").hexdigest()
        assert verify_sha256(fp, digest)
        assert verify_sha256(fp, digest.upper())
        assert not verify_sha256(fp, "0" * 64)
        assert_sha256(fp, digest)
        with pytest.raises(ValueError):
            assert_sha256(fp, "0" * 64)

    def test_missing_file(self, tmp_path):
        with pytest.raises(AssertionError):
            compute_sha256(tmp_path / "missing")


class TestCachePaths:
    def test_explicit_cache_dir(self, tmp_path):
        d = get_cache_dir(tmp_path / "c")
        assert d.exists()
        fp = get_model_cache_path("v1", "m.fsrz", cache_dir=tmp_path / "c")
        assert fp == d / "v1" / "m.fsrz"
        assert fp.parent.exists()

    def test_empty_args_rejected(self, tmp_path):
        with pytest.raises(AssertionError):
            get_model_cache_path("", "m.fsrz", cache_dir=tmp_path)
        with pytest.raises(AssertionError):
            get_model_cache_path("v1", "", cache_dir=tmp_path)


class TestManifest:
    def test_load_and_list(self, models_manifest_fp):
        models = load_models_manifest(models_manifest_fp)
        assert "v-cli" in models
        records = list_models(models_manifest_fp)
        assert records[0].version == "v-cli"
        assert records[0].description == "Local CLI test model."

    def test_packaged_manifest_loads(self):
        models = load_models_manifest()
        assert "ResUNet_16x_DEM" in models

    def test_resolve_unknown_raises(self, models_manifest_fp):
        with pytest.raises(KeyError):
            resolve_model("ghost", manifest_fp=models_manifest_fp)

    def test_missing_manifest_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_models_manifest(tmp_path / "none.json")

    def test_bad_models_field_raises(self, tmp_path):
        fp = tmp_path / "bad.json"
        fp.write_text(json.dumps({"models": [1, 2]}))
        with pytest.raises(ValueError):
            load_models_manifest(fp)


class TestBackendSelection:
    def test_scheme_dispatch(self):
        assert isinstance(get_retrieval_backend("https://x/y"), HttpRetrievalBackend)
        assert isinstance(get_retrieval_backend("http://x/y"), HttpRetrievalBackend)
        assert isinstance(get_retrieval_backend("file:///x/y"), FileRetrievalBackend)
        assert isinstance(get_retrieval_backend("/plain/path"), FileRetrievalBackend)

    def test_explicit_name(self):
        assert isinstance(get_retrieval_backend("whatever", "http"), HttpRetrievalBackend)
        assert isinstance(get_retrieval_backend("whatever", "file"), FileRetrievalBackend)
        with pytest.raises(ValueError):
            get_retrieval_backend("x", "ftp")

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError):
            get_retrieval_backend("s3://bucket/key")

    def test_file_backend_missing_source(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            FileRetrievalBackend().retrieve(str(tmp_path / "none"), tmp_path / "out")

    def test_http_backend_rejects_file_scheme(self, tmp_path):
        with pytest.raises(ValueError):
            HttpRetrievalBackend().retrieve("file:///x", tmp_path / "out")


class TestFetchModel:
    def test_fetch_and_cache(self, models_manifest_fp, tmp_path):
        cache = tmp_path / "cache"
        fp = fetch_model("v-cli", cache_dir=cache, manifest_fp=models_manifest_fp)
        assert fp.exists()
        first_stat = fp.stat().st_mtime_ns
        fp2 = fetch_model("v-cli", cache_dir=cache, manifest_fp=models_manifest_fp)
        assert fp2 == fp
        assert fp2.stat().st_mtime_ns == first_stat
        fp3 = fetch_model(
            "v-cli", cache_dir=cache, manifest_fp=models_manifest_fp, force=True
        )
        assert fp3.read_bytes() == fp.read_bytes()

    def test_checksum_mismatch_raises_and_cleans_up(self, tmp_path):
        blob = tmp_path / "m.fsrz"
        blob.write_bytes(b"payload")
        manifest = {
            "models": {
                "v-x": {"file_name": "m.fsrz", "url": blob.as_uri(), "sha256": "0" * 64}
            }
        }
        manifest_fp = tmp_path / "m.json"
        manifest_fp.write_text(json.dumps(manifest))
        cache = tmp_path / "cache"
        with pytest.raises(ValueError):
            fetch_model("v-x", cache_dir=cache, manifest_fp=manifest_fp)
        assert not list(cache.rglob("*.part"))
        assert not (cache / "v-x" / "m.fsrz").exists()

    def test_corrupted_cache_refetches(self, models_manifest_fp, tmp_path):
        cache = tmp_path / "cache"
        fp = fetch_model("v-cli", cache_dir=cache, manifest_fp=models_manifest_fp)
        fp.write_bytes(b"corrupted!")
        fp2 = fetch_model("v-cli", cache_dir=cache, manifest_fp=models_manifest_fp)
        assert fp2.read_bytes() == b"cli-test-model"


class TestWorkerDiscovery:
    def test_known_worker_exists(self):
        assert model_worker_exists("ResUNet_16x_DEM")
        assert not model_worker_exists("NoSuchModel_99x")

    def test_version_normalization(self):
        # Dots/hyphens in manifest versions map onto underscore module stems.
        from floodsr_tpu.model_registry import _model_version_to_worker_stem

        assert _model_version_to_worker_stem("ResUNet-16x.DEM") == "ResUNet_16x_DEM"

    def test_resolve_worker_class(self):
        cls = resolve_model_worker_class("ResUNet_16x_DEM")
        assert cls.model_version == "ResUNet_16x_DEM"
        from floodsr_tpu.models.base import Model

        assert issubclass(cls, Model)

    def test_resolve_missing_worker_raises(self):
        with pytest.raises(FileNotFoundError):
            resolve_model_worker_class("NoSuchModel_99x")

    def test_runnable_versions_from_packaged_manifest(self):
        assert "ResUNet_16x_DEM" in list_runnable_model_versions()
