"""Command line interface (reference parity: ``floodsr/cli.py``).

Same argparse tree and flag surface as the reference — ``tohr`` (with the
machine-interface JSON), ``models {list,fetch}``, ``doctor`` — plus
``cache {info,purge}`` (the lifecycle surface the reference ADR-0012 spec'd
but never built). ``doctor`` reports the JAX/TPU runtime in the same
machine-parseable ``key=value`` style.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

from floodsr_tpu.cache_paths import get_model_cache_path
from floodsr_tpu.cache_policy import cache_info, cache_purge
from floodsr_tpu.checksums import verify_sha256
from floodsr_tpu.model_registry import (
    fetch_model,
    list_models,
    list_runnable_model_versions,
    load_models_manifest,
    model_worker_exists,
)
from floodsr_tpu.tohr import tohr

log = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# logging
# ---------------------------------------------------------------------------


def _resolve_log_level(args: argparse.Namespace) -> int:
    """Explicit --log-level wins; otherwise INFO adjusted by -v/-q, clamped."""
    if args.log_level is not None:
        return getattr(logging, args.log_level)
    level = logging.INFO - (10 * int(args.verbose)) + (10 * int(args.quiet))
    return max(logging.DEBUG, min(logging.ERROR, level))


def _configure_logging(args: argparse.Namespace) -> None:
    effective_level = _resolve_log_level(args)
    root_logger = logging.getLogger()
    root_logger.setLevel(effective_level)
    if not root_logger.handlers:
        logging.basicConfig(level=effective_level)


# ---------------------------------------------------------------------------
# tohr model-spec resolution
# ---------------------------------------------------------------------------


def _resolve_tohr_model_spec(args: argparse.Namespace) -> tuple[str, Path]:
    """Precedence: --model-path > --model-version (fetch) > first cached runnable."""
    if args.model_path is not None:
        model_fp = Path(args.model_path).expanduser().resolve()
        assert model_fp.exists(), f"model path does not exist: {model_fp}"
        if args.model_version is not None:
            if not model_worker_exists(args.model_version):
                raise ValueError(
                    f"no model worker found for --model-version={args.model_version}"
                )
            return args.model_version, model_fp
        runnable_versions = list_runnable_model_versions(manifest_fp=args.manifest)
        assert runnable_versions, "manifest has no runnable model entries"
        return runnable_versions[0], model_fp

    models = load_models_manifest(manifest_fp=args.manifest)
    assert models, "manifest has no model entries"
    runnable_versions = [v for v in models if model_worker_exists(v)]
    assert runnable_versions, "manifest has no runnable model entries (worker module missing)"

    if args.model_version is None:
        for version in runnable_versions:
            payload = models[version]
            cached_fp = get_model_cache_path(
                version, payload["file_name"], cache_dir=args.cache_dir
            )
            if cached_fp.exists() and verify_sha256(cached_fp, payload["sha256"]):
                return version, cached_fp
        raise FileNotFoundError(
            "no cached runnable model found and --model-version was not provided. "
            "run `floodsr models fetch <model_version>` or pass --model-path."
        )

    if not model_worker_exists(args.model_version):
        raise ValueError(f"no model worker found for --model-version={args.model_version}")
    return args.model_version, fetch_model(
        args.model_version,
        cache_dir=args.cache_dir,
        manifest_fp=args.manifest,
        backend_name=args.backend,
        force=args.force,
    )


# ---------------------------------------------------------------------------
# machine-interface JSON
# ---------------------------------------------------------------------------


def _find_flag_value(argv: list[str], flag: str) -> str | None:
    for idx, token in enumerate(argv):
        if token == flag:
            return argv[idx + 1] if idx + 1 < len(argv) else None
        if token.startswith(f"{flag}="):
            return token.split("=", 1)[1]
    return None


def _flag_present(argv: list[str], flag: str) -> bool:
    return any(token == flag or token.startswith(f"{flag}=") for token in argv)


def _read_tohr_machine_json(machine_json_fp: Path) -> dict[str, object]:
    machine_json_path = machine_json_fp.expanduser().resolve()
    assert machine_json_path.exists(), f"machine json does not exist: {machine_json_path}"
    payload = json.loads(machine_json_path.read_text(encoding="utf-8"))
    assert isinstance(payload, dict), f"machine json must be an object: {machine_json_path}"
    if "tohr" in payload:
        nested = payload["tohr"]
        assert isinstance(nested, dict), (
            f"machine json 'tohr' payload must be an object: {machine_json_path}"
        )
        return nested
    return payload


def _normalize_machine_key(raw_key: str) -> str:
    return raw_key.strip().lstrip("-").replace("-", "_")


_MACHINE_KEY_TO_FLAG = {
    "in": "--in",
    "in_fp": "--in",
    "dem": "--dem",
    "fetch_hrdem": "--fetch-hrdem",
    "fetch_out": "--fetch-out",
    "out": "--out",
    "model_version": "--model-version",
    "model_path": "--model-path",
    "manifest": "--manifest",
    "cache_dir": "--cache-dir",
    "backend": "--backend",
    "force": "--force",
    "max_depth": "--max-depth",
    "dem_pct_clip": "--dem-pct-clip",
    "window_method": "--window-method",
    "tile_overlap": "--tile-overlap",
    "tile_size": "--tile-size",
}
_MACHINE_BOOL_FLAGS = {"fetch_hrdem", "force"}


def _build_tohr_machine_cli_tokens(payload: dict[str, object], argv: list[str]) -> list[str]:
    """Machine-json payload → CLI tokens; explicit CLI flags take precedence."""
    cli_tokens: list[str] = []
    for raw_key, value in payload.items():
        key = _normalize_machine_key(raw_key)
        if key not in _MACHINE_KEY_TO_FLAG:
            raise ValueError(f"unsupported tohr machine-json key: {raw_key}")
        cli_flag = _MACHINE_KEY_TO_FLAG[key]
        if _flag_present(argv, cli_flag):
            continue
        if key in _MACHINE_BOOL_FLAGS:
            if not isinstance(value, bool):
                raise ValueError(
                    f"machine-json key '{raw_key}' must be boolean, got {type(value)!r}"
                )
            if value:
                cli_tokens.append(cli_flag)
            continue
        if value is None:
            continue
        cli_tokens.extend([cli_flag, str(value)])
    return cli_tokens


def _inject_tohr_machine_json_args(argv: list[str] | None) -> list[str] | None:
    argv_tokens = list(sys.argv[1:]) if argv is None else list(argv)
    if not argv_tokens or argv_tokens[0] != "tohr":
        return argv_tokens
    machine_json_raw = _find_flag_value(argv_tokens, "--machine-json")
    if machine_json_raw is None:
        return argv_tokens
    machine_payload = _read_tohr_machine_json(Path(machine_json_raw))
    return argv_tokens + _build_tohr_machine_cli_tokens(machine_payload, argv_tokens)


def _resolve_default_output_path(in_fp: Path) -> Path:
    in_path = Path(in_fp).expanduser()
    suffix = in_path.suffix or ".tif"
    return (Path.cwd() / f"{in_path.stem}_sr{suffix}").resolve()


# ---------------------------------------------------------------------------
# command routing
# ---------------------------------------------------------------------------


def main_cli(args: argparse.Namespace) -> int:
    """Run the CLI command selected by parsed arguments."""
    if args.command == "models" and args.models_command == "list":
        for model in list_models(manifest_fp=args.manifest):
            print(f"{model.version}\t{model.file_name}\t{model.url}")
        return 0

    if args.command == "models" and args.models_command == "fetch":
        model_fp = fetch_model(
            args.version,
            cache_dir=args.cache_dir,
            manifest_fp=args.manifest,
            backend_name=args.backend,
            force=args.force,
        )
        print(model_fp)
        return 0

    if args.command == "tohr":
        if args.fetch_out is not None and not args.fetch_hrdem:
            raise ValueError("--fetch-out requires --fetch-hrdem")

        # Layered defaults (ADR-0011 pattern): CLI > env > user config file.
        from floodsr_tpu.config import load_config

        config = load_config()
        if args.cache_dir is None and config.cache_dir:
            args.cache_dir = Path(config.cache_dir)
        if args.manifest is None and config.manifest_fp:
            args.manifest = Path(config.manifest_fp)
        if args.model_version is None and args.model_path is None:
            args.model_version = config.default_model_version
        window_method = args.window_method or config.window_method

        model_version, model_fp = _resolve_tohr_model_spec(args)
        output_fp = (
            args.out if args.out is not None else _resolve_default_output_path(args.in_fp)
        )
        dem_fp = args.dem
        if args.fetch_hrdem:
            from floodsr_tpu.dem_sources import fetch_dem

            fetch_result = fetch_dem(
                source_id="hrdem",
                depth_lr_fp=args.in_fp,
                output_fp=args.fetch_out,
                logger=log,
            )
            dem_fp = fetch_result.dem_fp

        result = tohr(
            model_version=model_version,
            model_fp=model_fp,
            depth_lr_fp=args.in_fp,
            dem_hr_fp=dem_fp,
            output_fp=output_fp,
            max_depth=args.max_depth,
            dem_pct_clip=args.dem_pct_clip,
            window_method=window_method,
            tile_overlap=args.tile_overlap,
            tile_size=args.tile_size,
            logger=log,
            engine_options={
                "compute_dtype": config.compute_dtype,
                "max_batch": config.max_batch,
                "output_transfer": config.output_transfer,
            },
        )
        print(result["output_fp"])
        return 0

    if args.command == "doctor":
        from floodsr_tpu.engine import get_io_info, get_jax_info

        jax_info = get_jax_info()
        io_info = get_io_info()
        print(f"jax_installed={jax_info['installed']}")
        print(f"jax_version={jax_info['version']}")
        print(f"jax_backend={jax_info['backend']}")
        print(f"jax_devices={','.join(str(d) for d in jax_info['devices'])}")
        print(f"io_backend={io_info['backend']}")
        print(f"io_native_codec={io_info['native_codec']}")
        return 0

    if args.command == "cache" and args.cache_command == "info":
        info = cache_info(cache_dir=args.cache_dir)
        print(f"cache_dir={info['cache_dir']}")
        print(f"total_bytes={info['total_bytes']}")
        for name, stats in info["namespaces"].items():
            print(
                f"namespace.{name}=files:{stats['files']},bytes:{stats['bytes']},"
                f"age_days:{stats['age_days']}"
            )
        return 0

    if args.command == "cache" and args.cache_command == "purge":
        result = cache_purge(
            cache_dir=args.cache_dir,
            older_than_days=args.older_than_days,
            namespace=args.namespace,
        )
        print(f"removed={','.join(result['removed']) or '-'}")
        print(f"freed_bytes={result['freed_bytes']}")
        return 0

    raise ValueError(
        f"unsupported command path: {args.command}/{getattr(args, 'models_command', None)}"
    )


def main(argv: list[str] | None = None) -> int:
    """Run the floodsr CLI and return an exit code."""
    args = _parse_arguments(argv)
    _configure_logging(args)
    try:
        return main_cli(args)
    except Exception as err:
        log.error(f"{err}")
        log.debug("unhandled CLI exception", exc_info=True)
        return 1


def entry() -> None:  # pragma: no cover - console-script shim
    raise SystemExit(main())


# ---------------------------------------------------------------------------
# argument parsing
# ---------------------------------------------------------------------------


def _parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="floodsr", description="FloodSR-TPU command line interface."
    )
    parser.add_argument(
        "-v", "--verbose", action="count", default=0,
        help="Increase logging verbosity (repeatable).",
    )
    parser.add_argument(
        "-q", "--quiet", action="count", default=0,
        help="Decrease logging verbosity (repeatable).",
    )
    parser.add_argument(
        "--log-level", choices=("DEBUG", "INFO", "WARNING", "ERROR"), default=None,
        help="Explicit log level override.",
    )
    subparsers = parser.add_subparsers(dest="command", required=True)

    # models
    models_parser = subparsers.add_parser("models", help="Model registry commands.")
    models_subparsers = models_parser.add_subparsers(dest="models_command", required=True)

    models_list_parser = models_subparsers.add_parser("list", help="List available model versions.")
    models_list_parser.add_argument(
        "--manifest", type=Path, default=None,
        help="Optional path to an alternate models.json manifest.",
    )

    models_fetch_parser = models_subparsers.add_parser("fetch", help="Fetch model weights by version.")
    models_fetch_parser.add_argument("version", help="Model version key from the manifest.")
    models_fetch_parser.add_argument(
        "--manifest", type=Path, default=None,
        help="Optional path to an alternate models.json manifest.",
    )
    models_fetch_parser.add_argument(
        "--cache-dir", type=Path, default=None,
        help="Optional cache directory for downloaded weights.",
    )
    models_fetch_parser.add_argument(
        "--backend", choices=("http", "file"), default=None,
        help="Override retrieval backend selection.",
    )
    models_fetch_parser.add_argument(
        "--force", action="store_true",
        help="Force redownload even when a valid cache file exists.",
    )

    # tohr
    tohr_parser = subparsers.add_parser("tohr", help="Run one raster ToHR pass.")
    tohr_parser.add_argument(
        "--machine-json", type=Path, default=None,
        help="Optional machine-interface JSON with CLI-equivalent ToHR params.",
    )
    tohr_parser.add_argument(
        "--in", dest="in_fp", type=Path, required=True, help="Low-res depth raster path."
    )
    dem_group = tohr_parser.add_mutually_exclusive_group(required=True)
    dem_group.add_argument("--dem", type=Path, default=None, help="High-res DEM raster path.")
    dem_group.add_argument(
        "-f", "--fetch-hrdem", action="store_true",
        help="Fetch HRDEM from STAC using the low-res raster footprint.",
    )
    tohr_parser.add_argument(
        "--fetch-out", type=Path, default=None,
        help="Optional output path for fetched HRDEM tile. Defaults to temp directory.",
    )
    tohr_parser.add_argument(
        "--out", type=Path, default=None,
        help="Output high-res depth raster path. Defaults to ./<input_stem>_sr with input extension",
    )
    tohr_parser.add_argument(
        "--model-version", default=None,
        help="Model version key from manifest when --model-path is not provided.",
    )
    tohr_parser.add_argument(
        "--model-path", type=Path, default=None, help="Explicit local model artifact path."
    )
    tohr_parser.add_argument(
        "--manifest", type=Path, default=None,
        help="Optional path to an alternate models.json manifest.",
    )
    tohr_parser.add_argument(
        "--cache-dir", type=Path, default=None,
        help="Optional cache directory for downloaded weights.",
    )
    tohr_parser.add_argument(
        "--backend", choices=("http", "file"), default=None,
        help="Override retrieval backend selection for model fetch.",
    )
    tohr_parser.add_argument(
        "--force", action="store_true", help="Force redownload when fetching a versioned model."
    )
    tohr_parser.add_argument(
        "--max-depth", type=float, default=None,
        help="Optional max depth override for log-space scaling.",
    )
    tohr_parser.add_argument(
        "--dem-pct-clip", type=float, default=None,
        help="Optional DEM percentile clip override when train stats are incomplete.",
    )
    tohr_parser.add_argument(
        "--window-method", choices=("hard", "feather"), default=None,
        help="Tile mosaicing method for ToHR (default: feather, or the "
        "user-config value).",
    )
    tohr_parser.add_argument(
        "--tile-overlap", type=int, default=None,
        help="Feather overlap in low-res pixels. Ignored unless --window-method=feather.",
    )
    tohr_parser.add_argument(
        "--tile-size", type=int, default=None,
        help="LR tile size override (must match model LR input size).",
    )

    # doctor
    subparsers.add_parser("doctor", help="Report runtime dependency diagnostics.")

    # cache
    cache_parser = subparsers.add_parser("cache", help="Cache lifecycle commands.")
    cache_subparsers = cache_parser.add_subparsers(dest="cache_command", required=True)
    cache_info_parser = cache_subparsers.add_parser("info", help="Summarize cache contents.")
    cache_info_parser.add_argument("--cache-dir", type=Path, default=None)
    cache_purge_parser = cache_subparsers.add_parser("purge", help="Remove cached artifacts.")
    cache_purge_parser.add_argument("--cache-dir", type=Path, default=None)
    cache_purge_parser.add_argument(
        "--older-than-days", type=float, default=None,
        help="Only purge namespaces whose newest file is older than this.",
    )
    cache_purge_parser.add_argument(
        "--namespace", default=None, help="Limit purge to one cache namespace."
    )

    return parser.parse_args(_inject_tohr_machine_json_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
