"""Command-line entry point: ``python -m cbfssm_tpu <command>``.

The reference's UX is "run a script from run/ with a task index"
(run_smallscale.py:17). This module keeps that workflow one step
shorter and discoverable:

    python -m cbfssm_tpu info                         # backend + registry
    python -m cbfssm_tpu info run_output/x           # describe a trained dir
    python -m cbfssm_tpu reproduce spring --vmap-seeds
    python -m cbfssm_tpu reproduce smallscale --task 0
    python -m cbfssm_tpu export run_output/x --out art --seq-len 300
    python -m cbfssm_tpu bench                        # headline steps/sec

``reproduce`` dispatches to the verbatim reproduction drivers in run/
(repo checkout required — the drivers ARE the reference-parity
artifact and stay as plain scripts).
"""

from __future__ import annotations

import argparse
import inspect
import os
import runpy
import sys

DRIVERS = {
    "spring": "run_spring.py",
    "smallscale": "run_smallscale.py",
    "sarcos": "run_sarcos.py",
    "robomove": "run_robomove.py",
    "voliro": "run_voliro.py",
}


def repo_root() -> str | None:
    """The repo checkout containing run/ (None when pip-installed bare)."""
    cand = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return cand if os.path.isdir(os.path.join(cand, "run")) else None


def cmd_info(args) -> int:
    if getattr(args, "model_dir", None):
        return _info_model_dir(args.model_dir)
    import jax

    import cbfssm_tpu

    print(f"cbfssm_tpu from {os.path.dirname(cbfssm_tpu.__file__)}")
    print(f"jax {jax.__version__}, backend: {jax.default_backend()}, "
          f"devices: {[str(d) for d in jax.devices()]}")
    from cbfssm_tpu import data, models

    print("models:", ", ".join(
        n for n in ("CBFSSM", "CBFSSMHALF", "PRSSM", "Voliro")
        if hasattr(models, n)))
    from cbfssm_tpu.data.base import BaseDS

    ds_names = [
        n for n in dir(data)
        if isinstance(getattr(data, n), type)
        and issubclass(getattr(data, n), BaseDS)
        and getattr(data, n) is not BaseDS
    ]
    print("datasets:", ", ".join(sorted(ds_names)))
    root = repo_root()
    print("reproduction drivers:",
          ", ".join(sorted(DRIVERS)) if root else "unavailable (no run/ dir)")
    return 0


def _info_model_dir(model_dir: str) -> int:
    """Describe a trained directory from its model_meta.json snapshot
    (written by every trainer) without building the model or touching a
    backend."""
    import json

    from cbfssm_tpu import model_store
    from cbfssm_tpu.training import checkpoint

    try:
        meta = model_store.load_model_meta(model_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"{model_dir}: {meta['model_class']} "
          f"(dim_u={meta['dim_u']}, dim_y={meta['dim_y']}, "
          f"seed={meta.get('seed', 0)}, ds={meta.get('ds_name')})")
    ckpts = [n for n in (checkpoint.BEST, checkpoint.LAST,
                         "best_seeds.ckpt", "model_seeds.ckpt")
             if checkpoint.exists(os.path.join(model_dir, n))]
    print("checkpoints:", ", ".join(ckpts) if ckpts else "none")
    updates = meta.get("config_updates")
    if updates:
        print(f"folded config updates ({updates.get('note')}): "
              f"{json.dumps(updates.get('values', {}))}")
    if meta.get("dropped_keys"):
        print("dropped (un-snapshottable) keys:",
              ", ".join(meta["dropped_keys"]))
    def show(value):
        value = model_store._decode(value)
        return (value.tolist() if hasattr(value, "tolist")
                else json.dumps(value))

    print("config:")
    for k in sorted(meta["config"]):
        print(f"  {k}: {show(meta['config'][k])}")
    for k in sorted(meta.get("extra", {})):
        print(f"  extra.{k}: {show(meta['extra'][k])}")
    return 0


def cmd_reproduce(args) -> int:
    if args.check_data:
        from cbfssm_tpu.data.check import check_experiment, report

        print(f"Checking raw data for '{args.experiment}' "
              f"(dir: {args.data_dir or 'packaged default'}):")
        ok = report(check_experiment(args.experiment, args.data_dir))
        print("all files OK — ready to train" if ok
              else "missing/invalid files — stage them and re-run", )
        return 0 if ok else 1
    root = repo_root()
    if root is None:
        print("error: reproduce needs a repo checkout (run/ directory not "
              "found next to the package)", file=sys.stderr)
        return 2
    sys.path.insert(0, root)
    from scripts.driver_util import load_driver

    mod = load_driver(DRIVERS[args.experiment])
    if args.task is not None:
        n_tasks = len(getattr(mod, "datasets", ()))
        if not 0 <= args.task < max(n_tasks, 1):
            # reject out-of-range indices BEFORE any JAX startup cost,
            # not as an IndexError deep inside the driver
            print(f"error: --task must be in [0, {n_tasks}) for "
                  f"{args.experiment}", file=sys.stderr)
            return 2
    # drivers share a keyword vocabulary but not a full signature; pass
    # only what each main() accepts
    supported = set(inspect.signature(mod.main).parameters)
    requested = {
        "root": args.root,
        "data_dir": args.data_dir,
        "vmap_seeds": args.vmap_seeds or None,
        "task_list": [args.task] if args.task is not None else None,
        "epochs": args.epochs,
        "iterations": args.iterations,
        "train_iterations": args.train_iterations,
        "seq_len": args.seq_len,
        "seq_stride": args.seq_stride,
    }
    kwargs = {k: v for k, v in requested.items() if v is not None}
    dropped = {k for k, v in kwargs.items() if k not in supported}
    if dropped:
        print(f"error: {args.experiment} does not accept "
              f"{sorted(dropped)} (it has {sorted(supported)})",
              file=sys.stderr)
        return 2
    mod.main(**kwargs)
    return 0


def cmd_export(args) -> int:
    loaded = _load_checkpointed_model(args.model_dir, args.checkpoint)
    if loaded is None:
        return 2
    _meta, model, params = loaded
    from cbfssm_tpu import export as export_mod

    try:
        if args.kind == "predictor":
            if args.seq_len is None:
                print("error: --seq-len is required for predictor exports",
                      file=sys.stderr)
                return 2
            out_meta = export_mod.save_exported_predictor(
                args.out, model, params, args.batch, args.seq_len,
                condition=args.condition, platforms=tuple(args.platforms),
            )
        elif args.kind == "pool":
            out_meta = export_mod.save_exported_pool(
                args.out, model, params, capacity=args.capacity,
                horizons=tuple(args.horizons),
                replay_buckets=tuple(args.replay_buckets),
                platforms=tuple(args.platforms),
            )
        else:
            out_meta = export_mod.save_exported_filter(
                args.out, model, params, batch=args.batch,
                horizons=tuple(args.horizons),
                replay_buckets=tuple(args.replay_buckets),
                platforms=tuple(args.platforms),
            )
    except (TypeError, ValueError) as e:
        # model without the required serving contract, or invalid
        # export options (e.g. --replay-buckets 0)
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(f"exported {out_meta['kind']} ({out_meta['model_class']}, "
          f"{args.checkpoint} checkpoint) -> {args.out}")
    print(f"  platforms: {', '.join(out_meta['platforms'])}; "
          f"dtype: {out_meta['dtype']}")
    return 0


def _load_checkpointed_model(model_dir: str, checkpoint: str, meta=None):
    """Shared trained-directory loading: read model_meta.json (unless
    the caller already holds it), flip x64 BEFORE any array exists when
    the snapshot requires it, and rebuild (model, params) from the
    named checkpoint. Returns ``(meta, model, params)``, or ``None``
    after printing the error (callers return 2)."""
    from cbfssm_tpu import model_store

    if meta is None:
        try:
            meta = model_store.load_model_meta(model_dir)
        except FileNotFoundError as e:
            print(f"error: {e}", file=sys.stderr)
            return None
    import jax

    if model_store.meta_requires_x64(meta):
        jax.config.update("jax_enable_x64", True)
    name = {"best": "best.ckpt", "last": "model.ckpt"}[checkpoint]
    try:
        model, params = model_store.load_trained_model(model_dir, name)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return None
    return meta, model, params


def _serve_until_interrupt(server, banner: str) -> int:
    """Foreground serve loop shared by both `serve` variants. SIGTERM
    (docker stop / kubectl delete / systemd) triggers the same ordered
    shutdown as Ctrl-C: stop accepting, drain in-flight futures, exit
    0 — raised as KeyboardInterrupt because calling server.close()
    from inside the signal handler would deadlock (shutdown() waits
    for the serve loop, which is paused under the handler). The banner
    is printed AFTER the handler is installed: supervisors treat the
    address line as "ready", and a TERM that races the banner must
    already exit cleanly."""
    import signal

    def _term(_sig, _frame):
        raise KeyboardInterrupt

    prev = signal.signal(signal.SIGTERM, _term)
    try:
        # inside the try: a TERM racing the banner lands as a handled
        # KeyboardInterrupt, not an unhandled one between statements
        print(banner, flush=True)
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")
    finally:
        signal.signal(signal.SIGTERM, prev)
        server.close()
    return 0


def _eval_outputs_class(model_class: str, ds_name: str):
    """The Outputs variant the producing driver would use: Voliro's
    dict-predict model has no generic prediction path (forces plot +
    var dump only); RoboMove datasets add the trajectory plots on top
    of the full generic set."""
    from cbfssm_tpu.outputs import Outputs, OutputsRoboMove, OutputsVoliro

    if model_class == "Voliro":
        return OutputsVoliro
    if ds_name in ("RoboMove", "RoboMoveSimple"):
        return OutputsRoboMove
    return Outputs


def cmd_eval(args) -> int:
    """Trainerless re-evaluation of a trained directory: rebuild
    (model, params) via model_store, rebuild the dataset from the
    ``dataset`` recipe the trainer stamped into model_meta.json (or
    the --dataset/--seq-len/--seq-stride overrides), and run the same
    Outputs artifact set the producing driver writes — mse.txt,
    calibration.txt, predict plots (+ trajectory plots for RoboMove;
    Voliro's dict-predict model gets its force plots + var dump) —
    without the producing script (reference counterpart: template.py's
    train=False path, which still needs the script)."""
    from cbfssm_tpu import model_store

    try:
        meta = model_store.load_model_meta(args.model_dir)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    recipe = meta.get("dataset") or {}
    ds_name = args.dataset or recipe.get("name") or meta.get("ds_name")
    seq_len = args.seq_len or recipe.get("seq_len")
    seq_stride = args.seq_stride or recipe.get("seq_stride")
    if not ds_name or not seq_len or not seq_stride:
        print("error: no dataset recipe in model_meta.json (directory "
              "predates the stamp?) — pass --dataset/--seq-len/"
              "--seq-stride explicitly", file=sys.stderr)
        return 2
    from cbfssm_tpu import data as data_mod
    from cbfssm_tpu.data.base import BaseDS

    ds_cls = getattr(data_mod, ds_name, None)
    if not (isinstance(ds_cls, type) and issubclass(ds_cls, BaseDS)):
        print(f"error: unknown dataset class {ds_name!r} (not in "
              "cbfssm_tpu.data) — pass --dataset", file=sys.stderr)
        return 2
    loaded = _load_checkpointed_model(args.model_dir, args.checkpoint,
                                      meta=meta)
    if loaded is None:
        return 2
    _meta, model, params = loaded
    try:
        ds = ds_cls(int(seq_len), int(seq_stride), data_dir=args.data_dir)
    except Exception as e:
        print(f"error: could not build {ds_name}({seq_len}, {seq_stride}): "
              f"{e}", file=sys.stderr)
        return 2
    out_dir = args.out or args.model_dir
    outputs_cls = _eval_outputs_class(meta["model_class"], ds_name)
    if outputs_cls.__name__ == "OutputsVoliro":
        print("note: Voliro is a dict-predict model — eval writes the "
              "force plots + var dump (no generic mse/calibration)")
    outputs = outputs_cls(out_dir)
    outputs.set_ds(ds)
    outputs.set_model(model, args.model_dir)
    outputs.create_all(params=params)
    rmse = outputs.get_last_rmse()
    if rmse is not None:
        print(f"RMSE: {rmse:f}")
    cal = outputs.last_calibration
    if cal is not None:
        print(f"NLL/point: {cal['nll']:f}  "
              f"95%-band coverage: {cal['coverage'][0.95]:f}")
    print(f"artifacts -> {out_dir}")
    return 0


def _resolve_auth_token(args):
    """--auth-token beats the CBFSSM_AUTH_TOKEN env var (the env form
    keeps the secret off `ps` output); empty string means open. Warns
    when a non-loopback bind goes up without a token — the documented
    failover story (docs/SERVING.md) ships fleet state over this
    surface."""
    token = args.auth_token
    if token is None:
        token = os.environ.get("CBFSSM_AUTH_TOKEN") or None
    if not token:
        token = None
    if token is None and args.host not in ("127.0.0.1", "localhost", "::1"):
        print("warning: non-loopback bind without --auth-token / "
              "CBFSSM_AUTH_TOKEN — any peer that can reach the port can "
              "mutate serving state (see docs/SERVING.md 'Deployment "
              "posture')", file=sys.stderr)
    return token


def cmd_serve(args) -> int:
    """Reference HTTP transport (serving_http.py): microbatched
    free-running prediction over stdlib HTTP, from either a trained
    directory (BucketedPredictor ladder over the best/last checkpoint)
    or an exported predictor artifact (framework-free program,
    fixed-batch chunking). Endpoints: /healthz, /v1/meta, /v1/stats,
    POST /v1/predict. With ``--filter``: online-estimation sessions
    (FilterServer over a FilterPool — /v1/sessions lifecycle) from a
    streaming model's trained dir or an exported pool artifact
    (`export --kind pool`, framework-free)."""
    import json as _json

    import jax

    exported_meta = os.path.join(args.model_dir, "meta.json")
    trained_meta = os.path.join(args.model_dir, "model_meta.json")
    if args.filter:
        from cbfssm_tpu.serving_http import FilterServer

        if os.path.isfile(exported_meta):
            with open(exported_meta) as f:
                ameta = _json.load(f)
            if ameta.get("kind") != "filter_pool":
                print("error: --filter serves a trained directory or an "
                      "exported POOL artifact (kind 'filter_pool'); "
                      f"{args.model_dir} is kind "
                      f"{ameta.get('kind', 'predictor')!r} — re-export "
                      "with `export --kind pool`"
                      + (" (for single-session filter artifacts use "
                         "ExportedFilter in your own loop)"
                         if ameta.get("kind") == "filter" else ""),
                      file=sys.stderr)
                return 2
            if ameta.get("requires_x64"):
                jax.config.update("jax_enable_x64", True)  # before arrays
            if args.capacity is not None and \
                    args.capacity != ameta.get("capacity"):
                print(f"note: capacity is baked into the artifact "
                      f"({ameta.get('capacity')}); ignoring --capacity",
                      file=sys.stderr)
            if args.replay_buckets and sorted(args.replay_buckets) != \
                    sorted(ameta.get("replay_buckets", [])):
                print("note: the replay ladder is baked into the "
                      f"artifact ({ameta.get('replay_buckets', [])}); "
                      "ignoring --replay-buckets", file=sys.stderr)
            from cbfssm_tpu.export import ExportedFilterPool

            try:
                pool = ExportedFilterPool(args.model_dir)
            except (ValueError, RuntimeError, FileNotFoundError) as e:
                print(f"error: {e}", file=sys.stderr)
                return 2
        elif os.path.isfile(trained_meta):
            loaded = _load_checkpointed_model(
                args.model_dir, args.checkpoint)
            if loaded is None:
                return 2
            _meta, model, params = loaded
            from cbfssm_tpu.serving import FilterPool

            try:
                pool = FilterPool(
                    model, params,
                    capacity=32 if args.capacity is None else args.capacity,
                    replay_buckets=args.replay_buckets or None,
                )
            except (TypeError, ValueError) as e:  # no streaming interface
                print(f"error: {e}", file=sys.stderr)
                return 2
        else:
            print("error: --filter serves a trained directory of a "
                  "streaming model (CBFSSMHALF/Voliro) or an exported "
                  f"pool artifact; {args.model_dir} has neither "
                  "model_meta.json nor meta.json", file=sys.stderr)
            return 2
        server = FilterServer(
            pool, args.host, args.port, max_wait_ms=args.max_wait_ms,
            auth_token=_resolve_auth_token(args))
        m = server.meta()
        banner = (f"serving {m['model']} filter sessions (capacity "
                  f"{m['capacity']}, recog_len {m['recog_len']}, dim_u "
                  f"{m['dim_u']}, dim_y {m['dim_y']}, {m['dtype']}, "
                  f"auth {'on' if server.auth_token else 'off'}) "
                  f"on http://{server.host}:{server.port}")
        return _serve_until_interrupt(server, banner)
    if os.path.isfile(exported_meta):
        with open(exported_meta) as f:
            if _json.load(f).get("requires_x64"):
                jax.config.update("jax_enable_x64", True)  # before arrays
        from cbfssm_tpu.serving_http import ExportedBatchPredictor

        try:
            pred = ExportedBatchPredictor(args.model_dir)
        except (TypeError, ValueError, RuntimeError) as e:
            # dict-predict artifact, platform/x64 mismatch, filter kind
            print(f"error: {e}", file=sys.stderr)
            return 2
    elif os.path.isfile(trained_meta):
        loaded = _load_checkpointed_model(args.model_dir, args.checkpoint)
        if loaded is None:
            return 2
        meta, model, params = loaded
        recipe = meta.get("dataset") or {}
        seq_len = args.seq_len or recipe.get("seq_len")
        if not seq_len:
            print("error: no dataset recipe in model_meta.json — pass "
                  "--seq-len", file=sys.stderr)
            return 2
        from cbfssm_tpu.serving import BucketedPredictor

        try:
            pred = BucketedPredictor(
                model, params, int(seq_len),
                buckets=tuple(args.buckets), condition=args.condition,
            )
        except (TypeError, ValueError) as e:
            # Voliro's dict predict, or invalid --buckets (e.g. empty)
            print(f"error: {e}", file=sys.stderr)
            return 2
    else:
        print(f"error: {args.model_dir} has neither model_meta.json "
              "(trained directory) nor meta.json (exported artifact)",
              file=sys.stderr)
        return 2
    from cbfssm_tpu.serving_http import PredictionServer

    server = PredictionServer(
        pred, args.host, args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        auth_token=_resolve_auth_token(args),
    )
    m = server.meta()
    banner = (f"serving {m['predictor']} (seq_len {m['seq_len']}, "
              f"dim_u {m['dim_u']}, dim_y {m['dim_y']}, {m['dtype']}, "
              f"auth {'on' if server.auth_token else 'off'}) "
              f"on http://{server.host}:{server.port}")
    return _serve_until_interrupt(server, banner)


def cmd_bench(_args) -> int:
    root = repo_root()
    if root is None or not os.path.isfile(os.path.join(root, "bench.py")):
        print("error: bench.py not found (repo checkout required)",
              file=sys.stderr)
        return 2
    # runpy does NOT add the script's directory to sys.path, and
    # bench.py imports the repo's scripts/ package — without this,
    # `python -m cbfssm_tpu bench` from outside the repo root dies with
    # ModuleNotFoundError AFTER the expensive headline measurement
    sys.path.insert(0, root)
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m cbfssm_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    i = sub.add_parser(
        "info",
        help="backend, devices, model/dataset registry; with a model "
             "dir, describe its trained snapshot")
    i.add_argument("model_dir", nargs="?", default=None,
                   help="optional trained directory (model_meta.json) "
                        "to describe instead")
    i.set_defaults(fn=cmd_info)

    r = sub.add_parser("reproduce", help="run a reproduction driver verbatim")
    r.add_argument("experiment", choices=sorted(DRIVERS))
    r.add_argument("--vmap-seeds", action="store_true",
                   help="train all iteration seeds as one vmapped program")
    r.add_argument("--task", type=int, default=None,
                   help="small-scale task index (see run_smallscale.py)")
    r.add_argument("--root", default=None, help="output directory")
    r.add_argument("--data-dir", default=None,
                   help="directory holding the raw benchmark files")
    r.add_argument("--check-data", action="store_true",
                   help="validate the experiment's raw files (presence/"
                        "keys/shapes) and exit instead of training")
    r.add_argument("--epochs", type=int, default=None)
    r.add_argument("--iterations", type=int, default=None,
                   help="number of seeds/repetitions")
    r.add_argument("--train-iterations", type=int, default=None,
                   help="total optimizer steps (smallscale/spring scheme)")
    r.add_argument("--seq-len", type=int, default=None,
                   help="training window length (default: reference value)")
    r.add_argument("--seq-stride", type=int, default=None,
                   help="training window stride (default: reference value)")
    r.set_defaults(fn=cmd_reproduce)

    e = sub.add_parser(
        "export",
        help="export a trained model directory as a framework-free "
             "serving artifact (StableHLO + params)")
    e.add_argument("model_dir",
                   help="directory written by Trainer (holds "
                        "model_meta.json + checkpoints)")
    e.add_argument("--out", required=True, help="artifact directory to write")
    e.add_argument("--kind", choices=["predictor", "filter", "pool"],
                   default="predictor")
    e.add_argument("--checkpoint", choices=["best", "last"], default="best")
    e.add_argument("--batch", type=int, default=1)
    e.add_argument("--seq-len", type=int, default=None,
                   help="predictor sequence length (predictor kind only)")
    e.add_argument("--condition", action="store_true",
                   help="export the conditioned predict path")
    e.add_argument("--horizons", type=int, nargs="*", default=[],
                   help="forecast horizons to lower (filter/pool kinds)")
    e.add_argument("--replay-buckets", type=int, nargs="*", default=[],
                   help="fused backlog-replay block lengths to lower "
                        "(filter/pool kinds)")
    e.add_argument("--capacity", type=int, default=32,
                   help="fleet size baked into a pool artifact "
                        "(pool kind only)")
    e.add_argument("--platforms", nargs="*", default=["cpu", "tpu"],
                   help="backends the artifact must run on")
    e.set_defaults(fn=cmd_export)

    v = sub.add_parser(
        "eval",
        help="re-evaluate a trained directory from disk alone (mse, "
             "calibration, prediction plots) — no producing script")
    v.add_argument("model_dir",
                   help="directory written by a trainer (model_meta.json "
                        "+ checkpoints)")
    v.add_argument("--out", default=None,
                   help="artifact directory (default: the model dir)")
    v.add_argument("--checkpoint", choices=["best", "last"], default="best")
    v.add_argument("--dataset", default=None,
                   help="dataset class name (default: the recipe stamped "
                        "by the trainer)")
    v.add_argument("--seq-len", type=int, default=None)
    v.add_argument("--seq-stride", type=int, default=None)
    v.add_argument("--data-dir", default=None,
                   help="directory holding the raw benchmark files")
    v.set_defaults(fn=cmd_eval)

    s = sub.add_parser(
        "serve",
        help="serve prediction over HTTP (reference stdlib transport, "
             "microbatched) from a trained dir or exported artifact")
    s.add_argument("model_dir",
                   help="trained directory (model_meta.json) or exported "
                        "predictor artifact (meta.json)")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8787,
                   help="listen port (0 = ephemeral)")
    s.add_argument("--checkpoint", choices=["best", "last"], default="best",
                   help="trained-dir only")
    s.add_argument("--seq-len", type=int, default=None,
                   help="prediction window (default: the trained dir's "
                        "stamped dataset recipe)")
    s.add_argument("--buckets", type=int, nargs="*", default=[1, 8, 32],
                   help="batch-bucket ladder (trained-dir only)")
    s.add_argument("--condition", action="store_true",
                   help="serve the conditioned predict path "
                        "(trained-dir only)")
    s.add_argument("--max-batch", type=int, default=32,
                   help="microbatcher coalescing bound")
    s.add_argument("--max-wait-ms", type=float, default=2.0,
                   help="microbatcher coalescing window")
    s.add_argument("--filter", action="store_true",
                   help="serve online-estimation sessions (FilterPool "
                        "over a streaming model's trained dir, or an "
                        "exported pool artifact) instead of "
                        "free-running prediction")
    s.add_argument("--capacity", type=int, default=None,
                   help="filter-session pool capacity (--filter only; "
                        "default 32; baked into exported pool artifacts)")
    s.add_argument("--replay-buckets", type=int, nargs="*", default=None,
                   help="AOT backlog-replay chunk ladder (--filter only)")
    s.add_argument("--auth-token", default=None,
                   help="shared-secret Bearer token required on every "
                        "POST/DELETE and GET /v1/state (default: "
                        "CBFSSM_AUTH_TOKEN env var; unset = open — fine "
                        "for the loopback default, set one for any "
                        "non-loopback bind)")
    s.set_defaults(fn=cmd_serve)

    sub.add_parser("bench", help="headline ELBO steps/sec benchmark"
                   ).set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
