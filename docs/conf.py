"""Sphinx configuration for the floodsr-tpu documentation site.

Reference role: ``docs/user/conf.py`` in the reference repo (Sphinx + myst
over an MVP docs tree, published through Read the Docs via
``.readthedocs.yaml``). This repo's docs are native markdown — kept honest
offline by ``tests/test_docs.py`` (CLI reference regenerated from live
``--help``, every relative link resolves) — so the Sphinx layer is a thin
myst_parser pass over the same files; it adds nothing the markdown does not
already say.

Build locally (requires ``docs/requirements.txt``)::

    sphinx-build -b html docs docs/_build/html

The ``sphinx``-marked test in ``tests/test_docs.py`` runs exactly that and
skips when Sphinx is not installed (CI runs ``-m "not sphinx"`` like the
reference's full-test workflow).
"""

from datetime import datetime, timezone

project = "floodsr-tpu"
author = "floodsr-tpu developers"
copyright = f"{datetime.now(timezone.utc).year}, {author}"
release = "0.1.0"
version = release

extensions = [
    "sphinx.ext.autosectionlabel",
    "myst_parser",
]

# Prefix section labels with the document path to avoid collisions.
autosectionlabel_prefix_document = True

master_doc = "index"
source_suffix = {
    ".rst": "restructuredtext",
    ".md": "markdown",
}

# README.md is the GitHub-facing index (it links out of the docs tree, e.g.
# ../ARCHITECTURE.md, which Sphinx cannot resolve); index.md is the site
# toctree. Perf JSON artifacts and images are data, not pages.
exclude_patterns = [
    "_build",
    "README.md",
    "Thumbs.db",
    ".DS_Store",
]

# Cross-tree links (../ARCHITECTURE.md and friends) are valid on GitHub but
# outside the Sphinx root; don't fail the build over them.
suppress_warnings = ["myst.xref_missing"]

myst_enable_extensions = ["colon_fence"]
myst_heading_anchors = 3

try:  # the RTD theme is in docs/requirements.txt; alabaster is the fallback
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"
html_title = "floodsr-tpu docs"
