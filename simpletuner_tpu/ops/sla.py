"""Sparse-Linear Attention (SLA) — TPU-native re-derivation.

Reference surface: --attention_mechanism=sla routes diffusers SDPA calls into
the external CUDA ``sparse_linear_attention`` package with settings
{topk, feature_map, blkq, blkk, tie_feature_map_qk}
(reference: helpers/training/attention_backend.py:1561-1640 _enable_sla,
defaults topk=0.2, feature_map="softmax", blkq=blkk=64).

The scheme: rank KV blocks per query block by block-mean attention scores;
the top ``topk`` fraction get EXACT softmax attention, the remainder are
approximated by feature-map linear attention, and both branches share one
normalizer:

    O = (Σ_sel exp(s)·V  +  φ(Q)·Σ_unsel φ(K)ᵀV)
        / (Σ_sel exp(s)  +  φ(Q)·Σ_unsel φ(K)ᵀ1)

This is fully differentiable (the reference package is "fine-tunable" the same
way: gradients flow through both branches).  Pure XLA: block gathers via
take_along_axis, everything static-shaped; the per-block linear summaries are
(Nk, D, D) outer products the MXU handles natively.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _feature_map(x: jax.Array, kind: str) -> jax.Array:
    if kind == "softmax":
        # feature-dim softmax (the package default): positive, sums to 1
        return jax.nn.softmax(x, axis=-1)
    if kind in ("elu", "elu1"):
        return jax.nn.elu(x) + 1.0
    if kind == "relu":
        return jax.nn.relu(x)
    raise ValueError(f"unknown SLA feature_map {kind!r}; use softmax|elu|relu")


def sla_attention(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    *,
    topk: float = 0.2,
    feature_map: str = "softmax",
    blkq: int = 64,
    blkk: int = 64,
    tie_feature_map_qk: bool = True,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    batch, heads, seq, dim = q.shape
    sk = k.shape[2]
    scale = dim ** -0.5 if sm_scale is None else sm_scale

    # pad to block multiples; padded kv rows get -inf scores via key padding
    def pad_to(x, block, axis=2):
        rem = (-x.shape[axis]) % block
        if rem == 0:
            return x, 0
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, rem)
        return jnp.pad(x, pads), rem

    q, _ = pad_to(q, blkq)
    k, k_pad = pad_to(k, blkk)
    v, _ = pad_to(v, blkk)
    sq, skp = q.shape[2], k.shape[2]
    nq, nk = sq // blkq, skp // blkk

    qb = q.reshape(batch, heads, nq, blkq, dim)
    kb = k.reshape(batch, heads, nk, blkk, dim)
    vb = v.reshape(batch, heads, nk, blkk, dim)

    # kv-padding mask (True = real token)
    kv_valid = (jnp.arange(skp) < sk).reshape(nk, blkk)

    # --- block ranking by mean-pooled scores -------------------------------------------
    qm = qb.mean(axis=3)
    km = kb.sum(axis=3) / jnp.maximum(kv_valid.sum(axis=1), 1)[None, None, :, None]
    block_scores = jnp.einsum("bhqd,bhkd->bhqk", qm, km) * scale
    kc = max(1, min(nk, int(round(topk * nk)) or 1))
    _, sel = jax.lax.top_k(block_scores, kc)  # (B, H, Nq, kc)

    # one-hot selection mask over kv blocks, used to split exact vs linear
    sel_onehot = jnp.sum(jax.nn.one_hot(sel, nk, dtype=q.dtype), axis=3)  # (B,H,Nq,Nk)
    sel_onehot = jnp.minimum(sel_onehot, 1.0)

    # --- exact branch over selected blocks ---------------------------------------------
    def gather_blocks(x):  # (B,H,Nk,blk,D) -> (B,H,Nq,kc,blk,D)
        idx = sel[..., None, None]
        idx = jnp.broadcast_to(idx, sel.shape + x.shape[3:])
        return jnp.take_along_axis(x[:, :, None], idx, axis=3)

    k_sel = gather_blocks(kb).reshape(batch, heads, nq, kc * blkk, dim)
    v_sel = gather_blocks(vb).reshape(batch, heads, nq, kc * blkk, dim)
    valid_sel = jnp.take_along_axis(
        jnp.broadcast_to(kv_valid[None, None, None], (batch, heads, nq, nk, blkk)),
        sel[..., None].astype(jnp.int32), axis=3,
    ).reshape(batch, heads, nq, kc * blkk)

    s = jnp.einsum("bhqtd,bhqsd->bhqts", qb, k_sel) * scale  # t=blkq rows, s=kc*blkk
    s = jnp.where(valid_sel[:, :, :, None, :], s.astype(jnp.float32), -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    exp_s = jnp.exp(s - m)
    num_sparse = jnp.einsum("bhqts,bhqsd->bhqtd", exp_s.astype(q.dtype), v_sel)
    den_sparse = jnp.sum(exp_s, axis=-1)  # (B,H,Nq,blkq)

    # --- linear branch over the complement ---------------------------------------------
    # Normalized linear attention over the UNSELECTED blocks, mixed back by an
    # estimated probability mass: per query row, each unselected block's
    # softmax denominator contribution is approximated from its block-mean
    # score (exact in the diffuse limit, negligible when attention is
    # concentrated in the selected blocks — the two regimes SLA splits).
    phi_q = _feature_map(qb.astype(jnp.float32) * scale, feature_map)
    k_kind = feature_map if tie_feature_map_qk else "elu"
    phi_k = _feature_map(kb.astype(jnp.float32), k_kind)
    phi_k = phi_k * kv_valid[None, None, :, :, None]

    kv_outer = jnp.einsum("bhnsd,bhnse->bhnde", phi_k, vb.astype(jnp.float32))  # (B,H,Nk,D,D)
    k_sum = jnp.sum(phi_k, axis=3)  # (B,H,Nk,D)
    unsel = (1.0 - sel_onehot).astype(jnp.float32)  # (B,H,Nq,Nk)
    kv_unsel = jnp.einsum("bhqn,bhnde->bhqde", unsel, kv_outer)
    z_unsel = jnp.einsum("bhqn,bhnd->bhqd", unsel, k_sum)
    num_lin = jnp.einsum("bhqtd,bhqde->bhqte", phi_q, kv_unsel)
    den_lin = jnp.einsum("bhqtd,bhqd->bhqt", phi_q, z_unsel)
    o_linear = num_lin / jnp.maximum(den_lin, 1e-9)[..., None]  # (B,H,Nq,blkq,D)

    # per-row estimated denominator mass of each unselected block:
    # exp(q·k̄_b − m) × (#valid keys in b)
    row_block = jnp.einsum("bhqtd,bhkd->bhqtk", qb.astype(jnp.float32), km.astype(jnp.float32)) * scale
    n_valid = kv_valid.sum(axis=1).astype(jnp.float32)  # (Nk,)
    mass = jnp.exp(row_block - m) * n_valid[None, None, None, None, :]
    den_unsel = jnp.einsum("bhqtk,bhqk->bhqt", mass, unsel)

    out = (
        num_sparse.astype(jnp.float32) + den_unsel[..., None] * o_linear
    ) / (den_sparse + den_unsel + 1e-9)[..., None]
    out = out.reshape(batch, heads, sq, dim).astype(q.dtype)
    return out[:, :, :seq]


def sla_settings_from_config(config) -> dict:
    """Reference _enable_sla settings resolution: the sla_config dict wins,
    then flat sla_* attrs, then the package defaults
    (attention_backend.py:1576-1617)."""
    raw = getattr(config, "sla_config", None)
    if isinstance(raw, str):
        import ast

        try:
            raw = ast.literal_eval(raw)
        except (ValueError, SyntaxError) as exc:
            raise ValueError(f"could not parse sla_config: {raw!r}") from exc
    user = raw if isinstance(raw, dict) else {}

    def get(key, attr, default, caster):
        value = user.get(key, getattr(config, attr, None))
        if value in (None, "", "None"):
            value = default
        return caster(value)

    def to_bool(value):
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)

    return {
        "topk": get("topk", "sla_topk", 0.2, float),
        "feature_map": get("feature_map", "sla_feature_map", "softmax", str),
        "blkq": get("blkq", "sla_blkq", 64, int),
        "blkk": get("blkk", "sla_blkk", 64, int),
        "tie_feature_map_qk": get(
            "tie_feature_map_qk", "sla_tie_feature_map_qk", True, to_bool
        ),
    }
