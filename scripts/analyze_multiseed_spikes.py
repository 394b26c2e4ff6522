"""Mechanism analysis of the multiseed spring-loop divergence spikes
(r4 verdict weak #3 / next #3).

BENCH_r04's multiseed stage showed transient per-seed blow-ups in the
5-seed vmapped spring loop (epoch 27: seed-3 train -28.73 vs siblings
~-117, mean Test +235.74; epoch 29: Test +129.80), recovering within
one epoch. This script reruns the same configuration with per-batch,
per-seed ELBO-term decomposition and answers three questions:

1. WHICH term spikes (loglik / kl_x / entropy / inducing KLs) and what
   moves in the parameters (GP lengthscale/variance, var_x) when it
   does.
2. Whether the spikes are finite (the opt-in ``skip_nonfinite_updates``
   guard would NOT fire) — i.e. an lr=0.1 optimizer transient, not a
   numerical failure.
3. Whether reference-matching best-by-train checkpointing shields the
   delivered model: spike epochs must never be the per-seed best, and
   the best-checkpoint losses must sit in the healthy band.

The learning rate (0.1) is the reference's own small-scale protocol
(reference run/run_smallscale.py:44); the analysis decides whether to
document the spikes as expected reference-matching behavior or to
change a default. Writes artifacts/multiseed_spikes.json.

Usage: python scripts/analyze_multiseed_spikes.py [epochs] [out.json]
(ambient env = TPU; CPU works with the usual forced-cpu prefix).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(epochs=30, out_path=None):
    import jax
    import jax.numpy as jnp
    import optax

    from run.run_spring import model_config, seq_len, seq_stride

    from cbfssm_tpu.data import SpringNonlinear
    from cbfssm_tpu.models import CBFSSM
    from cbfssm_tpu.training.trainer import epoch_indices
    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()
    n_seeds = 5
    ds = SpringNonlinear(seq_len, seq_stride)
    model = CBFSSM(model_config)
    tx = optax.adam(model.config.learning_rate)
    dtype = model.dtype

    data_u = jnp.asarray(ds.train_in_batch, dtype=dtype)
    data_y = jnp.asarray(ds.train_out_batch, dtype=dtype)
    test_u = jnp.asarray(ds.test_in_batch, dtype=dtype)
    test_y = jnp.asarray(ds.test_out_batch, dtype=dtype)

    keys = jax.random.split(jax.random.PRNGKey(0), n_seeds)
    params_s = jax.vmap(model.init)(keys)
    opt_s = jax.vmap(tx.init)(params_s)

    AUX = ("loglik", "kl_x", "entropy", "kl_z_f", "kl_z_b")

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params_s, opt_s, idx, w, ekeys):
        """One epoch for all seeds; returns per-seed per-batch loss +
        aux terms and the post-epoch hyperparameters."""

        def one_seed(params, opt_state, key):
            def step(c, inp):
                params, opt_state = c
                idx_b, w_b, i = inp
                u = jnp.take(data_u, idx_b, axis=0)
                y = jnp.take(data_y, idx_b, axis=0)
                (loss, aux), grads = jax.value_and_grad(
                    model.loss, has_aux=True
                )(params, u, y, jax.random.fold_in(key, i), True, w_b)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                terms = jnp.stack([loss] + [aux[k] for k in AUX])
                return (params, opt_state), terms

            nb = idx.shape[0]
            (params, opt_state), terms = jax.lax.scan(
                step, (params, opt_state), (idx, w, jnp.arange(nb))
            )
            return params, opt_state, terms

        params_s, opt_s, terms = jax.vmap(one_seed)(params_s, opt_s, ekeys)
        return params_s, opt_s, terms

    @jax.jit
    def test_loss(params_s, tidx, tw, ekeys):
        def one_seed(params, key):
            def step(_, inp):
                idx_b, w_b, i = inp
                u = jnp.take(test_u, idx_b, axis=0)
                y = jnp.take(test_y, idx_b, axis=0)
                loss, _ = model.loss(
                    params, u, y, jax.random.fold_in(key, i), True, w_b
                )
                return None, loss
            _, losses = jax.lax.scan(
                step, None, (tidx, tw, jnp.arange(tidx.shape[0]))
            )
            return jnp.mean(losses)
        return jax.vmap(one_seed)(params_s, ekeys)

    def hyper_snapshot(params_s):
        import cbfssm_tpu.ops.transforms as tf_

        len_f = np.asarray(tf_.positive(params_s.gp_f.kern_len_unc))
        return {
            "gp_len_f_min": len_f.reshape(n_seeds, -1).min(axis=1),
            "gp_var_f": np.asarray(
                tf_.positive(params_s.gp_f.kern_var_unc)).reshape(n_seeds),
            "var_x_max": np.asarray(
                tf_.positive(params_s.var_x_unc)).max(axis=1),
        }

    rng = np.random.default_rng(1)
    batch = model.config.batch_size
    n_train = ds.train_in_batch.shape[0]
    base = jax.random.PRNGKey(1)
    tidx, tw = epoch_indices(
        np.random.default_rng(2), ds.test_in_batch.shape[0], batch, False,
        dtype)

    record = []
    t0 = time.time()
    for e in range(int(epochs)):
        idx, w = epoch_indices(rng, n_train, batch, True, dtype)
        ekey = jax.random.fold_in(base, e)
        ekeys = jax.vmap(lambda s: jax.random.fold_in(ekey, s))(
            jnp.arange(n_seeds))
        params_s, opt_s, terms = epoch(params_s, opt_s, idx, w, ekeys)
        tl = test_loss(params_s, tidx, tw, ekeys)
        terms = np.asarray(terms)  # [seeds, batches, 1 + len(AUX)]
        hyp = hyper_snapshot(params_s)
        record.append({
            "epoch": e,
            "train_per_seed": terms[:, :, 0].mean(axis=1).tolist(),
            "test_per_seed": np.asarray(tl).tolist(),
            "batch_loss_max": terms[:, :, 0].max(axis=1).tolist(),
            "terms_at_worst_batch": {
                name: terms[np.arange(n_seeds),
                            terms[:, :, 0].argmax(axis=1), 1 + i].tolist()
                for i, name in enumerate(AUX)
            },
            "finite": bool(np.isfinite(terms).all()),
            **{k: v.tolist() for k, v in hyp.items()},
        })
        print(f"[{e:03}] train {terms[:, :, 0].mean(axis=1).round(2)} "
              f"test {np.asarray(tl).round(2)} "
              f"worst-batch {terms[:, :, 0].max(axis=1).round(1)}",
              flush=True)

    # --- analysis ----------------------------------------------------
    train = np.array([r["train_per_seed"] for r in record])  # [E, S]
    test = np.array([r["test_per_seed"] for r in record])
    med = np.median(train, axis=1, keepdims=True)
    spikes = np.argwhere(train > med + 0.5 * np.abs(med))
    best_epoch = train.argmin(axis=0)
    all_finite = all(r["finite"] for r in record)

    spike_rows = []
    for e, s in spikes:
        r = record[e]
        spike_rows.append({
            "epoch": int(e), "seed": int(s),
            "train": float(train[e, s]),
            "siblings_median": float(med[e, 0]),
            "worst_batch_loss": r["batch_loss_max"][s],
            "worst_batch_terms": {
                k: v[s] for k, v in r["terms_at_worst_batch"].items()
            },
            "var_x_max": r["var_x_max"][s],
            "gp_len_f_min": r["gp_len_f_min"][s],
        })

    summary = {
        "config": "run_spring.model_config (reference small-scale "
                  "protocol, lr=0.1)",
        "epochs": int(epochs), "n_seeds": n_seeds,
        "wall_s": round(time.time() - t0, 1),
        "all_losses_finite": all_finite,
        "n_spike_seed_epochs": len(spike_rows),
        "spikes": spike_rows,
        "best_epoch_per_seed": best_epoch.tolist(),
        "best_train_per_seed": train.min(axis=0).tolist(),
        "spike_epochs_ever_best": bool(
            any(int(e) == best_epoch[s] for e, s in spikes)),
        "final_train_per_seed": train[-1].tolist(),
        "test_spike_max": float(test.max()),
        "record": record,
    }
    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "multiseed_spikes.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nspike seed-epochs: {len(spike_rows)}; finite: {all_finite}; "
          f"any spike was a best epoch: {summary['spike_epochs_ever_best']}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
