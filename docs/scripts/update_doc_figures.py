"""Regenerate the documentation figures from the committed golden cases.

Role parity: the reference ships a per-project figure-refresh script at
``docs/user/update_ui_screenshots.py`` (a PyQt tab-capture template; the
checked-in copy is a dead stub that raises on import). FloodSR-TPU has no
GUI, so its doc figures are rendered plots: this script re-runs the
tutorial pipeline (``examples/tutorial.py``) on the committed synthetic
flagship case and installs the fresh comparison figure into ``docs/img/``
(which the README and both tutorial translations embed).

Run from the repo root::

    python docs/scripts/update_doc_figures.py

Requires matplotlib (same optional dependency as the tutorial itself).
Exits non-zero if the figure was not produced.
"""

from __future__ import annotations

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
IMG_DIR = REPO / "docs" / "img"
FIGURES = ("tutorial_compare.png",)


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="floodsr_docfig_") as td:
        proc = subprocess.run(
            [sys.executable, str(REPO / "examples" / "tutorial.py"), td],
            cwd=REPO,
        )
        if proc.returncode != 0:
            print(f"tutorial run failed (rc={proc.returncode})", file=sys.stderr)
            return proc.returncode
        missing = []
        for name in FIGURES:
            src = Path(td) / name
            if not src.exists():
                missing.append(name)
                continue
            dst = IMG_DIR / name
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(src, dst)
            print(f"updated {dst.relative_to(REPO)} ({dst.stat().st_size} bytes)")
        if missing:
            print(f"figures not produced: {missing}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
