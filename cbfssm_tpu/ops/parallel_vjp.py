"""Log-depth reverse pass for latency-bound scans.

Reverse-mode autodiff of ``lax.scan`` runs a second sequential loop of
depth T. For scans whose per-step device work is tiny (the Voliro
recursions: [B*S, M=20] GP links, rigid-body physics), that reverse
loop is pure latency — each link is microseconds of compute behind
fixed per-iteration cost. But the cotangent recurrence itself is
LINEAR:

    v_t = J_t^T v_{t+1} + (direct per-step cotangents)

so once the per-step carry Jacobians ``J_t`` are materialized (batched
over all t at once — embarrassingly parallel), the whole reverse chain
collapses to a ``lax.associative_scan`` of depth ceil(log2 T) over
tiny [D, D] matrix products, and every remaining cotangent (loop
constants, per-step inputs) comes from ONE batched vjp.

Requirements on the wrapped step (checked where cheap, documented
otherwise):

* carry is a single array ``[..., D]`` whose step Jacobian is
  block-diagonal over every leading axis (each "row" of the carry
  evolves independently — true for per-particle SSM recursions);
* ``step(consts, carry, inp) -> (carry_next, (carry_next, *extras))``
  — the new carry must be emitted as the FIRST stacked output (the
  backward pass reconstructs all carries from the stacked outputs, so
  the primal stores nothing extra).

Cost model: D jvps + 2 vjps of the T-batched link (MXU-parallel)
replace T sequential reverse links. Wins when the scan is
latency-bound; loses when it is throughput-bound (see BENCHMARKS.md
"Hand-adjoint verdict" for the robomove counter-case — this utility is
deliberately NOT used there).

Gradients equal reverse-mode autodiff up to reassociation of the
Jacobian-product chain (tests pin 1e-8 in float64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _affine_combine(left, right):
    """Compose affine maps w -> A w + b: ``right`` applied AFTER
    ``left`` (elements ordered by application order along the scan
    axis). A: [..., D, D], b: [..., D]. HIGHEST precision: up to T
    Jacobian products compose per chain, and the default TPU matmul
    precision is bf16-grade (library convention, ops/kernels.py)."""
    a1, b1 = left
    a2, b2 = right
    highest = jax.lax.Precision.HIGHEST
    return (
        jnp.einsum("...ij,...jk->...ik", a2, a1, precision=highest),
        jnp.einsum("...ij,...j->...i", a2, b1, precision=highest) + b2,
    )


def scan_outputs_vjp(step, consts, carry0, inputs, unroll: int = 1):
    """``lax.scan`` over ``inputs`` returning the stacked outputs, with
    a custom VJP whose reverse pass has depth ~log2(T).

    step(consts, carry, inp) -> (carry_next, (carry_next, *extras))
    Returns the stacked outputs pytree ``(carries [T, ...], *extras)``.
    The final carry is not returned (SSM rollouts consume the stacked
    path; the last carry is its last row).
    """
    return _scan_outputs(step, unroll, consts, carry0, inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _scan_outputs(step, unroll, consts, carry0, inputs):
    _, outs = jax.lax.scan(
        lambda c, i: step(consts, c, i), carry0, inputs, unroll=unroll
    )
    return outs


def _scan_outputs_fwd(step, unroll, consts, carry0, inputs):
    outs = _scan_outputs(step, unroll, consts, carry0, inputs)
    return outs, (consts, carry0, inputs, outs[0])


def _scan_outputs_bwd(step, unroll, res, d_outs):
    consts, carry0, inputs, carries = res
    d_stack = d_outs[0]  # [T, ..., D] cotangent on the stacked carries
    d_extras = d_outs[1:]
    t_len = d_stack.shape[0]
    d = carry0.shape[-1]

    # carry INTO step t: carry0 for t=0, else the stacked output t-1
    c_in = jnp.concatenate((carry0[None], carries[:-1]), axis=0)

    def batched_step(c_all, inp_all):
        return jax.vmap(lambda c, i: step(consts, c, i))(c_all, inp_all)

    # ---- per-step carry Jacobians, batched over T (block-diagonal on
    # the last axis by assumption: one basis tangent per carry dim) ----
    def jvp_col(col):
        tangent = jnp.zeros_like(c_in).at[..., col].set(1.0)
        _, jc = jax.jvp(
            lambda c: batched_step(c, inputs)[0], (c_in,), (tangent,)
        )
        return jc  # [T, ..., D] = column `col` of every J_t

    jac_cols = [jvp_col(col) for col in range(d)]
    jac = jnp.stack(jac_cols, axis=-1)  # [T, ..., D, D]; J[..., i, j]=dc'_i/dc_j
    jac_t = jnp.swapaxes(jac, -1, -2)

    # ---- e_t = (d extras_t / d carry)^T d_extras_t, batched ----
    def pull(c, inp, ct):
        _, vjp_fn = jax.vjp(lambda cc, ii, co: step(co, cc, ii), c, inp, consts)
        return vjp_fn(ct)

    e_all = jax.vmap(pull)(
        c_in, inputs,
        (jnp.zeros_like(c_in), (jnp.zeros_like(d_stack), *d_extras)),
    )[0]  # [T, ..., D]

    # ---- the affine cotangent recurrence, depth log2(T) ----
    # w_t := (cot on carry_next of step t, total) with
    #   w_{T-1} = e'? no: w_{T-1} = d_stack_{T-1}
    #   w_{t-1} = J_t^T w_t + e_t + d_stack_{t-1}
    # Reindex k = T-1-t (application order) and compose with
    # lax.associative_scan.
    eye = jnp.broadcast_to(jnp.eye(d, dtype=jac_t.dtype), jac_t.shape[1:])
    mats = jnp.concatenate((eye[None], jnp.flip(jac_t, axis=0)[:-1]), axis=0)
    offs = jnp.concatenate(
        (
            d_stack[None, t_len - 1],
            jnp.flip(e_all, axis=0)[:-1] + jnp.flip(d_stack, axis=0)[1:],
        ),
        axis=0,
    )
    _, w_rev = jax.lax.associative_scan(_affine_combine, (mats, offs), axis=0)
    w = jnp.flip(w_rev, axis=0)  # [T, ..., D]; w[t] = cot on carry_next_t

    # ---- one batched vjp recovers everything else ----
    # step t's vjp cotangent: carry-part v_{t+1} = w_t - d_stack_t (the
    # pure chain part; the stacked-output part enters separately)
    v_next = w - d_stack
    d_c_all, d_inputs, d_consts_all = jax.vmap(pull)(
        c_in, inputs, (v_next, (d_stack, *d_extras))
    )
    d_consts = jax.tree_util.tree_map(
        lambda a: jnp.sum(a, axis=0), d_consts_all
    )
    d_carry0 = d_c_all[0]
    return d_consts, d_carry0, d_inputs


_scan_outputs.defvjp(_scan_outputs_fwd, _scan_outputs_bwd)
