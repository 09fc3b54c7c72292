"""The tutorial notebook executes offline, end to end.

The reference ships a root ``examples.ipynb`` and plans the tutorial "as
notebooks" (reference ``PLAN.md`` Documentation section); this gate runs
every code cell of ``examples/tutorial.ipynb`` in order in one namespace —
no jupyter dependency needed — against the small committed golden case.
"""

import json
import sys
from pathlib import Path

import pytest

pytestmark = [pytest.mark.e2e, pytest.mark.slow]

REPO = Path(__file__).resolve().parent.parent
NB_FP = REPO / "examples" / "tutorial.ipynb"


def test_notebook_code_cells_run(tmp_path, monkeypatch):
    nb = json.loads(NB_FP.read_text(encoding="utf-8"))
    assert nb["nbformat"] == 4
    code_cells = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code_cells) >= 5

    # The small golden case keeps this under test-suite budgets; the
    # notebook defaults to the flagship case for humans. Outputs land in
    # tmp_path (pytest cleans it) instead of the notebook's mkdtemp.
    monkeypatch.setenv("FLOODSR_TUTORIAL_CASE", "synth_single_tile")
    monkeypatch.setenv("FLOODSR_TUTORIAL_OUT", str(tmp_path / "out"))
    monkeypatch.setenv("MPLBACKEND", "Agg")
    monkeypatch.chdir(REPO)

    # Notebook cells prepend REPO and REPO/examples to sys.path; keep that
    # from leaking into the rest of the pytest session.
    sys_path_snapshot = list(sys.path)
    ns: dict = {"__name__": "__tutorial__"}
    try:
        for i, cell in enumerate(code_cells):
            src = "".join(cell["source"])
            try:
                exec(compile(src, f"{NB_FP.name}:cell{i}", "exec"), ns)
            except Exception as err:  # pragma: no cover - failure reporting
                pytest.fail(
                    f"notebook cell {i} raised {type(err).__name__}: {err}\n{src}"
                )
    finally:
        sys.path[:] = sys_path_snapshot

    # The notebook's own assertions ran (SR beats bilinear); spot-check
    # the artifacts it claims to produce.
    out_dir = ns["OUT_DIR"]
    assert (out_dir / "depth_sr.tif").exists()
    assert (out_dir / "tutorial_compare.png").exists()
    assert (out_dir / "wse_grown.tif").exists()
    assert ns["res"]["preprocess"]["variant"] == "pcraster"
