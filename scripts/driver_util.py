"""Shared loader for the run/ reproduction drivers.

The drivers now parse ``sys.argv`` only under ``__main__`` (they are
importable with any caller argv), but this loader is still the single
place that imports ``run/<script>`` as a FRESH module — artifact
scripts and the e2e tests mutate driver module state (config dicts,
roots) and must not leak those mutations into each other through
``sys.modules``. The argv swap is kept as belt-and-braces for ad-hoc
drivers that predate the ``__main__`` convention.
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_driver(script: str):
    """Import ``run/<script>`` as a fresh module with a clean argv."""
    path = os.path.join(REPO, "run", script)
    spec = importlib.util.spec_from_file_location(script[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    argv, sys.argv = sys.argv, [path]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod
