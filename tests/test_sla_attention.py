"""Sparse-Linear Attention (reference attention_backend.py:1561 _enable_sla:
--attention_mechanism=sla + sla_config settings dict)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.ops.flash_attention import mha_reference
from simpletuner_tpu.ops.sla import sla_attention, sla_settings_from_config


def _qkv(seed=0, shape=(1, 2, 256, 32)):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [jax.random.normal(k, shape, jnp.float32) for k in keys]


def test_topk_one_equals_exact_attention():
    q, k, v = _qkv()
    ref = mha_reference(q, k, v)
    out = sla_attention(q, k, v, topk=1.0, blkq=64, blkk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_concentrated_attention_is_well_approximated():
    """When attention mass concentrates in a few blocks (the regime SLA is
    designed for — block-level structure the mean-pooled ranking can see),
    a small topk recovers the exact output closely."""
    q, k, v = _qkv()
    # block-level concentration: all queries lean toward u, kv-block 1 holds u
    u = jax.random.normal(jax.random.PRNGKey(9), (32,), jnp.float32)
    q = u[None, None, None, :] + 0.2 * q
    k = k.at[:, :, 64:128].set(u[None, None, None, :] * 2.0 + 0.1 * k[:, :, 64:128])
    ref = mha_reference(q, k, v)
    out = sla_attention(q, k, v, topk=0.25, blkq=64, blkk=64)
    err = float(jnp.abs(out - ref).mean())
    assert err < 0.05, err


def test_diffuse_attention_linear_tail_helps():
    """For diffuse attention the mass-weighted linear tail must beat the
    sparse-only truncation."""
    q, k, v = _qkv(7)
    ref = mha_reference(q, k, v)
    hybrid = sla_attention(q, k, v, topk=0.5, blkq=64, blkk=64)
    err = float(jnp.abs(hybrid - ref).mean())
    assert err < 0.1, err


def test_differentiable_and_finite():
    q, k, v = _qkv(3)
    grads = jax.grad(
        lambda q, k, v: jnp.sum(sla_attention(q, k, v, topk=0.25) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    assert all(bool(jnp.isfinite(g).all()) for g in grads)


def test_ragged_seq_pads_and_unpads():
    q, k, v = _qkv(4, (1, 2, 200, 32))  # not a multiple of 64
    out = sla_attention(q, k, v, topk=0.5, blkq=64, blkk=64)
    assert out.shape == q.shape
    assert bool(jnp.isfinite(out).all())


def test_settings_resolution_matches_reference():
    class Cfg:
        sla_config = "{'topk': 0.3, 'blkq': 128}"
        sla_feature_map = "elu"

    s = sla_settings_from_config(Cfg())
    assert s["topk"] == 0.3
    assert s["blkq"] == 128
    assert s["blkk"] == 64  # default
    assert s["feature_map"] == "elu"  # flat attr fallback
    assert s["tie_feature_map_qk"] is True

    class Bad:
        sla_config = "{notparsable"

    with pytest.raises(ValueError):
        sla_settings_from_config(Bad())


def test_dispatcher_routes_sla():
    from simpletuner_tpu.ops.attention import (
        dot_product_attention,
        set_attention_backend,
        set_sla_settings,
    )

    q, k, v = _qkv(5)
    qs = jnp.swapaxes(q, 1, 2)  # dispatcher takes (B, S, H, D)
    ks = jnp.swapaxes(k, 1, 2)
    vs = jnp.swapaxes(v, 1, 2)
    try:
        set_attention_backend("sla")
        set_sla_settings({"topk": 1.0})
        out = dot_product_attention(qs, ks, vs)
        ref = mha_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(ref), atol=1e-5
        )
    finally:
        set_attention_backend("auto")
        set_sla_settings(None)
