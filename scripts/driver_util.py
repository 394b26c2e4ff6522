"""Shared loader for the run/ reproduction drivers.

The drivers select their task from ``sys.argv`` at module level
(reference run_smallscale.py:17 semantics), so importing one from a
script or test must shield it from the caller's arguments. This is the
single implementation of that dance (previously copied in every
artifact script and the e2e tests).
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
