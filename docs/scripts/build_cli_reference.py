"""Generate the CLI reference from live ``--help`` output.

Reference analog: ``docs/user/scripts/build_cli_reference.py`` — the CLI docs
are rendered from the argparse tree itself so they can never drift.

Usage: ``python docs/scripts/build_cli_reference.py > docs/cli_reference.md``
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from floodsr_tpu.cli import _parse_arguments  # noqa: E402

COMMANDS = [
    [],
    ["models"],
    ["models", "list"],
    ["models", "fetch"],
    ["tohr"],
    ["serve"],
    ["doctor"],
    ["cache"],
    ["cache", "info"],
    ["cache", "purge"],
]


def _help_for(tokens: list[str]) -> str:
    buffer = io.StringIO()
    try:
        with contextlib.redirect_stdout(buffer):
            _parse_arguments([*tokens, "--help"])
    except SystemExit:
        pass
    return buffer.getvalue()


def main() -> int:
    print("# floodsr CLI reference\n")
    print("_Generated from live `--help` output by docs/scripts/build_cli_reference.py._\n")
    for tokens in COMMANDS:
        title = " ".join(["floodsr", *tokens])
        print(f"## `{title}`\n")
        print("```text")
        print(_help_for(tokens).rstrip())
        print("```\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
