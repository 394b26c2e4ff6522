"""Per-device FLOP scaling of the compiled sharded epoch program.

Real multi-chip wall-clock cannot be measured on this rig (one chip);
what CAN be measured honestly is how the compiled program's per-device
work scales with mesh size: XLA's cost_analysis of the n-device
partitioned program vs the single-device one. This is the quantitative
receipt for the round-5 batch-major-flatten fix (gp.predict_rows):
before it, the recognition pass's dots kept FULL rows on every device
(the census showed batch all-gathers + [N,·] dots), so per-device FLOPs
could not approach 1/n; after it they are [N/n,·].

Caveats (honest accounting): cost_analysis counts a lax.scan body ONCE
(not x trip count), so absolute numbers undercount — but both sides of
the ratio undercount identically, and every scan trip count here is
mesh-independent, so the per-device RATIO is meaningful. The residual
gap to ideal 1/n is the genuinely replicated work (GP precompute/
factorization, parameter-sized optimizer math) — Amdahl, not waste.

Writes artifacts/flops_scaling.json. Usage (virtual mesh, CPU):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/flops_scaling.py
"""

import json
import os
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def measure(shape_name, config, u, y, n_devices=(1, 2, 8)):
    import jax

    from cbfssm_tpu.models import CBFSSM
    from cbfssm_tpu.parallel import make_mesh
    from cbfssm_tpu.training import Trainer

    rows = {}
    for n in n_devices:
        model = CBFSSM(config)
        tr = Trainer(model, tempfile.mkdtemp(),
                     mesh=make_mesh(n) if n > 1 else None)
        tr.init_state()
        data_u, data_y = tr._stage("train", u, y)
        batch = tr.dp.round_up_batch(model.config.batch_size)
        idx, w = tr._epoch_indices(u.shape[0], batch, shuffle=False)
        compiled = tr._epoch_update.lower(
            tr.params, tr.opt_state, data_u, data_y, idx, w,
            jax.random.PRNGKey(0),
        ).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        rows[n] = {
            "flops_per_device": float(ca.get("flops", float("nan"))),
            "bytes_per_device": float(ca.get("bytes accessed", float("nan"))),
        }
        print(f"{shape_name} n={n}: {rows[n]}", flush=True)
    base = rows[min(n_devices)]["flops_per_device"]
    for n in n_devices:
        rows[n]["flops_scaling_x"] = round(base / rows[n]["flops_per_device"], 2)
    return rows


def main():
    rng = np.random.default_rng(0)

    class _DS:
        dim_u = 1
        dim_y = 1

    def cbfssm_cfg(dim_x, m, s, batch):
        return {
            "ds": _DS, "batch_size": batch, "shuffle": 1, "dim_x": dim_x,
            "ind_pnt_num": m, "samples": s, "learning_rate": 0.05,
            "loss_factors": np.asarray([0.5, 0.1]), "k_factor": 50.0,
            "recog_len": 8, "zeta_pos": 2.0, "zeta_mean": 0.0025,
            "zeta_var": 1e-4, "var_x": np.asarray([4e-6] * dim_x),
            "var_y": np.asarray([1.0] * dim_x), "gp_var": 0.25,
            "gp_len": 2.0, "dtype": "float32",
        }

    out = {}
    # representative mid shape: every row dimension well above the mesh
    u = rng.normal(size=(32, 50, 1)).astype(np.float32)
    y = rng.normal(size=(32, 50, 1)).astype(np.float32)
    out["cbfssm_B32_T50_M20_S8"] = measure(
        "cbfssm_B32_T50_M20_S8", cbfssm_cfg(4, 20, 8, 16), u, y)

    path = os.path.join(HERE, "artifacts", "flops_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
