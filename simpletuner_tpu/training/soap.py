"""SOAP: ShampoO with Adam in the Preconditioner's eigenbasis.

Reference behavior: helpers/training/optimizers/soap (the reference's ``soap``
optimizer choice, optimizer_param.py) — per the SOAP paper (Vyas et al. 2024):

  * maintain Kronecker-factored gradient covariance accumulators
    ``L = EMA(G Gᵀ)`` and ``R = EMA(Gᵀ G)`` per 2-D parameter,
  * periodically eigendecompose them to refresh the rotation matrices
    ``QL, QR``,
  * run Adam on the rotated gradient ``G' = QLᵀ G QR`` and rotate the update
    back ``QL U' QRᵀ``.

State layout: the first moment lives in the *original* space (projected into
the current basis each step), the second moment lives in the *rotated* space
and is re-projected through ``(Qnewᵀ Qold)²`` whenever the basis refreshes, so
a refresh never spikes the Adam denominator.

TPU-native details: the eigendecompositions run inside the jitted step under
``lax.cond`` every ``precondition_frequency`` steps (XLA eigh — no host
round-trip); axes longer than ``max_precond_dim`` keep an identity basis,
matching the reference's one-sided fallback for embedding-shaped matrices.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class SoapState(NamedTuple):
    count: jax.Array
    mu: optax.Updates          # first moment, original space
    nu: optax.Updates          # second moment, rotated space
    left: optax.Updates        # L accumulators (0-d placeholder when unused)
    right: optax.Updates       # R accumulators
    q_left: optax.Updates      # eigenbasis rotations
    q_right: optax.Updates


def soap(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.95,
    b2: float = 0.95,
    shampoo_beta: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    precondition_frequency: int = 10,
    max_precond_dim: int = 8192,
) -> optax.GradientTransformation:
    def precondition_axes(p) -> Tuple[bool, bool]:
        if p.ndim != 2:
            return (False, False)
        return (p.shape[0] <= max_precond_dim, p.shape[1] <= max_precond_dim)

    def init(params):
        def zeros(p):
            return jnp.zeros_like(p, jnp.float32)

        def init_acc(p, axis):
            if not precondition_axes(p)[axis]:
                return jnp.zeros((), jnp.float32)
            dim = p.shape[axis]
            return jnp.zeros((dim, dim), jnp.float32)

        def init_q(p, axis):
            if not precondition_axes(p)[axis]:
                return jnp.zeros((), jnp.float32)
            dim = p.shape[axis]
            return jnp.eye(dim, dtype=jnp.float32)

        tm = jax.tree_util.tree_map
        return SoapState(
            count=jnp.zeros((), jnp.int32),
            mu=tm(zeros, params),
            nu=tm(zeros, params),
            left=tm(lambda p: init_acc(p, 0), params),
            right=tm(lambda p: init_acc(p, 1), params),
            q_left=tm(lambda p: init_q(p, 0), params),
            q_right=tm(lambda p: init_q(p, 1), params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        refresh = (count % precondition_frequency) == 0
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat = {
            name: treedef.flatten_up_to(getattr(state, name))
            for name in ("mu", "nu", "left", "right", "q_left", "q_right")
        }
        flat_p = treedef.flatten_up_to(params) if params is not None else [None] * len(flat_g)

        new = {name: [] for name in flat}
        out_updates = []
        for i, g in enumerate(flat_g):
            gf = g.astype(jnp.float32)
            mu, nu = flat["mu"][i], flat["nu"][i]
            L, R = flat["left"][i], flat["right"][i]
            QL, QR = flat["q_left"][i], flat["q_right"][i]
            use_l, use_r = precondition_axes(gf)

            if use_l:
                L = L * shampoo_beta + (gf @ gf.T) * (1.0 - shampoo_beta)
            if use_r:
                R = R * shampoo_beta + (gf.T @ gf) * (1.0 - shampoo_beta)

            if use_l or use_r:
                def do_refresh(ops):
                    L_, R_, QLo, QRo, nu_ = ops

                    def eigvecs(acc):
                        _, vecs = jnp.linalg.eigh(
                            acc + 1e-30 * jnp.eye(acc.shape[0], dtype=acc.dtype)
                        )
                        return vecs

                    QLn = eigvecs(L_) if use_l else QLo
                    QRn = eigvecs(R_) if use_r else QRo
                    # nu is a diagonal (elementwise) stat in the old rotated
                    # basis; transform through the squared change-of-basis
                    nu_t = nu_
                    if use_l:
                        A = QLn.T @ QLo
                        nu_t = (A * A) @ nu_t
                    if use_r:
                        B = QRn.T @ QRo
                        nu_t = nu_t @ (B * B).T
                    return QLn, QRn, jnp.maximum(nu_t, 0.0)

                def no_refresh(ops):
                    _, _, QLo, QRo, nu_ = ops
                    return QLo, QRo, nu_

                QL, QR, nu = jax.lax.cond(refresh, do_refresh, no_refresh, (L, R, QL, QR, nu))

            # rotate grad into the eigenbasis
            g_rot = gf
            if use_l:
                g_rot = QL.T @ g_rot
            if use_r:
                g_rot = g_rot @ QR

            mu = mu * b1 + gf * (1.0 - b1)          # original space
            nu = nu * b2 + jnp.square(g_rot) * (1.0 - b2)  # rotated space

            mu_rot = mu
            if use_l:
                mu_rot = QL.T @ mu_rot
            if use_r:
                mu_rot = mu_rot @ QR
            upd_rot = (mu_rot / b1c) / (jnp.sqrt(nu / b2c) + eps)

            upd = upd_rot
            if use_l:
                upd = QL @ upd
            if use_r:
                upd = upd @ QR.T

            if flat_p[i] is not None and weight_decay:
                upd = upd + weight_decay * flat_p[i].astype(jnp.float32)
            out_updates.append(upd.astype(g.dtype))
            for name, val in (
                ("mu", mu), ("nu", nu), ("left", L), ("right", R),
                ("q_left", QL), ("q_right", QR),
            ):
                new[name].append(val)

        new_state = SoapState(
            count,
            *(treedef.unflatten(new[name]) for name in ("mu", "nu", "left", "right", "q_left", "q_right")),
        )
        return treedef.unflatten(out_updates), new_state

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.scale_by_learning_rate(learning_rate),
    )
