"""Run-script wiring smoke tests: each reproduction driver must import
cleanly (hyperparameters construct, classes resolve) without executing
training."""

import importlib.util
import os
import sys

import pytest

RUN_DIR = os.path.join(os.path.dirname(__file__), "..", "run")
SCRIPTS = [
    "template.py",
    "run_smallscale.py",
    "run_sarcos.py",
    "run_robomove.py",
    "run_voliro.py",
    "run_spring.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_imports(script):
    path = os.path.abspath(os.path.join(RUN_DIR, script))
    spec = importlib.util.spec_from_file_location(f"runscript_{script[:-3]}", path)
    mod = importlib.util.module_from_spec(spec)
    argv = sys.argv
    sys.argv = [path]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    assert hasattr(mod, "main")


@pytest.mark.parametrize(
    "script", ["create_robomove.py", "create_spring_nonlinear.py"]
)
def test_generator_scripts_import(script):
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "create_datasets", script)
    )
    spec = importlib.util.spec_from_file_location(f"genscript_{script[:-3]}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")