"""Serving cold-start: framework AOT predictor vs exported artifact.

What the exported artifact (cbfssm_tpu/export.py) removes from a
serving process's startup is the Python model stack + trace + lower
step — the part the persistent XLA compile cache can never skip. This
script measures true process cold-start for both paths in fresh
subprocesses (imports included), each under a cold and a warm XLA
compile cache:

  framework path:  import model zoo -> build CBFSSM -> CompiledPredictor
                   (trace + lower + compile) -> 1 request
  artifact path:   ExportedPredictor(path) (deserialize + compile)
                   -> 1 request

Shape: a RoboMove-SIZED serving request (batch 1, T=300, M=100, S=50;
dim_u=3 where the real robomove task has 2) — representative of the
single-sequence requests the BucketedPredictor ladder serves, but not
byte-identical to the program the other serving benchmarks compile, so
compare cold-start numbers here only against each other.

Usage: python scripts/bench_export_coldstart.py [--out artifacts/...]
       (run on the backend you care about; CPU recipe:
        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ...)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHAPE = dict(batch=1, seq_len=300, dim_x=4, M=100, S=50, dim_u=3, dim_y=2)

_CONFIG = """
import numpy as np

class _DS:
    dim_u = {dim_u}
    dim_y = {dim_y}

CONFIG = {{
    "ds": _DS, "batch_size": 16, "shuffle": 100, "dim_x": {dim_x},
    "ind_pnt_num": {M}, "samples": {S}, "learning_rate": 0.01,
    "loss_factors": np.asarray([1.0, 0.0]), "k_factor": 1.0,
    "recog_len": 10, "zeta_pos": 2.0, "zeta_mean": 0.01,
    "zeta_var": 1e-4, "var_x": np.asarray([0.01] * {dim_x}),
    "var_y": np.asarray([1.0] * {dim_x}), "gp_var": 0.01, "gp_len": 1.0,
}}
""".format(**SHAPE)

FRAMEWORK_CHILD = _CONFIG + """
import sys, time
t0 = time.perf_counter()
import jax, numpy as np
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.serving import CompiledPredictor
model = CBFSSM(CONFIG)
params = model.init(jax.random.PRNGKey(0))
t_built = time.perf_counter()
pred = CompiledPredictor(model, params, batch={batch}, seq_len={seq_len})
t_compiled = time.perf_counter()
rng = np.random.default_rng(0)
out = pred(rng.normal(size=({batch}, {seq_len}, {dim_u})),
           rng.normal(size=({batch}, {seq_len}, {dim_y})))
host = float(np.asarray(out.mse))  # host readback = real sync
t_first = time.perf_counter()
import json
print(json.dumps({{"build_s": t_built - t0,
                   "compile_s": t_compiled - t_built,
                   "first_request_s": t_first - t_compiled,
                   "total_s": t_first - t0, "mse": host}}))
""".format(**SHAPE)

ARTIFACT_CHILD = """
import sys, time
t0 = time.perf_counter()
import numpy as np
from cbfssm_tpu.export import ExportedPredictor
pred = ExportedPredictor(sys.argv[1])
t_loaded = time.perf_counter()
rng = np.random.default_rng(0)
m = pred.meta
out = pred(rng.normal(size=(m["batch"], m["seq_len"], m["dim_u"])),
           rng.normal(size=(m["batch"], m["seq_len"], m["dim_y"])))
host = float(np.asarray(out["mse"]))
t_first = time.perf_counter()
import json
print(json.dumps({"load_s": t_loaded - t0,
                  "first_request_s": t_first - t_loaded,
                  "total_s": t_first - t0, "mse": host}))
"""

EXPORT_CHILD = _CONFIG + """
import sys, jax
from cbfssm_tpu.models import CBFSSM
from cbfssm_tpu.export import save_exported_predictor
model = CBFSSM(CONFIG)
params = model.init(jax.random.PRNGKey(0))
save_exported_predictor(sys.argv[1], model, params,
                        {batch}, {seq_len})
print("exported")
""".format(**SHAPE)


def _run_child(code, args=(), cache_dir=None, timeout=1800):
    env = dict(os.environ)
    if cache_dir is not None:
        # route the persistent XLA cache so cold/warm is controlled
        env["CBFSSM_XLA_CACHE"] = cache_dir
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    p = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r)\n" % ROOT + code,
         *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=ROOT,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    art_dir = tempfile.mkdtemp(prefix="export_bench_")
    # export once (its own subprocess; not part of the measurement)
    p = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r)\n" % ROOT + EXPORT_CHILD,
         art_dir],
        capture_output=True, text=True, timeout=1800,
        env=dict(os.environ), cwd=ROOT,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])

    result = {"shape": SHAPE}
    for mode in ("cold", "warm"):
        caches = {name: tempfile.mkdtemp(prefix=f"xla_{name}_{mode}_")
                  for name in ("framework", "artifact")}
        runs = {}
        for name, code, extra in (
            ("framework", FRAMEWORK_CHILD, ()),
            ("artifact", ARTIFACT_CHILD, (art_dir,)),
        ):
            if mode == "warm":  # populate, then measure the warm start
                _run_child(code, extra, cache_dir=caches[name])
            runs[name] = _run_child(code, extra, cache_dir=caches[name])
            print(f"{mode}/{name}: {runs[name]}", file=sys.stderr)
        result[mode] = runs
        result[mode]["speedup_total"] = round(
            runs["framework"]["total_s"] / runs["artifact"]["total_s"], 2
        )
        for d in caches.values():
            shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(art_dir, ignore_errors=True)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
