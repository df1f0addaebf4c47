import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.ops import dot_product_attention, mha_reference
from simpletuner_tpu.ops.flash_attention import SEGMENT_PAD_ID, flash_attention

pytestmark = pytest.mark.slow

def _rand_qkv(key, batch=2, heads=4, sq=256, sk=256, dim=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, heads, sq, dim), dtype)
    k = jax.random.normal(kk, (batch, heads, sk, dim), dtype)
    v = jax.random.normal(kv, (batch, heads, sk, dim), dtype)
    return q, k, v

@pytest.mark.parametrize("sq,sk", [(256, 256), (384, 256), (200, 200)])
def test_flash_matches_reference(sq, sk):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), sq=sq, sk=sk)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

def test_flash_segment_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), batch=1, heads=2, sq=256, sk=256)
    # two packed segments
    seg = jnp.concatenate([jnp.zeros((1, 128), jnp.int32), jnp.ones((1, 128), jnp.int32)], axis=1)
    out = flash_attention(q, k, v, seg, seg, interpret=True, block_q=128, block_kv=128)
    ref = mha_reference(q, k, v, seg, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    # each segment must match standalone attention over just its tokens
    solo = mha_reference(q[:, :, :128], k[:, :, :128], v[:, :, :128])
    np.testing.assert_allclose(np.asarray(out[:, :, :128]), np.asarray(solo), atol=2e-5, rtol=2e-5)

def test_flash_padding_ignored():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), batch=1, heads=1, sq=100, sk=100)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

def test_flash_gradients_match_reference():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), batch=1, heads=2, sq=128, sk=128, dim=64)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, interpret=True, block_q=128, block_kv=128)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)

def test_flash_gradients_with_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), batch=1, heads=1, sq=256, sk=256, dim=64)
    seg = jnp.concatenate([jnp.zeros((1, 192), jnp.int32), jnp.full((1, 64), SEGMENT_PAD_ID, jnp.int32)], axis=1)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, seg, interpret=True, block_q=128, block_kv=128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, seg, seg) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4, rtol=1e-4)

def test_dispatcher_layout():
    # dispatcher takes (B, S, H, D)
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(key, (2, 64, 4, 32))
    out = dot_product_attention(q, q, q, backend="xla")
    assert out.shape == q.shape
    ref = mha_reference(jnp.swapaxes(q, 1, 2), jnp.swapaxes(q, 1, 2), jnp.swapaxes(q, 1, 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.swapaxes(ref, 1, 2)), atol=1e-6)

def test_rope_rotation_preserves_norm():
    from simpletuner_tpu.ops import apply_rope, axial_rope

    ids = jnp.stack(
        jnp.meshgrid(jnp.arange(4), jnp.arange(8), indexing="ij"), axis=-1
    ).reshape(1, 32, 2)
    cos, sin = axial_rope([32, 32], ids)
    assert cos.shape == (1, 32, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 4, 64))
    out = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, 0]), atol=1e-5)