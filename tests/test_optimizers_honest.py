"""Honest-optimizer tests (VERDICT round-1 Weak #2 / Next #6).

Every reference optimizer name must resolve to the *algorithm it claims*:
8-bit names carry int8 states, 4-bit int4, fp8 float8; soap is a real
eigenbasis-rotated Shampoo-Adam; names we cannot implement raise instead of
silently substituting (reference: helpers/training/optimizer_param.py:76-660).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.training.optimizers import get_optimizer, optimizer_names
from simpletuner_tpu.training.optim_quant import (
    dequantize_blockwise,
    quantize_blockwise,
)

pytestmark = pytest.mark.slow

class Cfg(dict):
    def get(self, key, default=None):
        return super().get(key, default)

def _run(name, steps=60, lr=0.05, n=512):
    """Minimize ||Wx - y||² for a fixed quadratic; returns final loss."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (n // 8, n)) * 0.3
    target = jax.random.normal(jax.random.fold_in(key, 1), (n // 8, n)) * 0.3
    params = {"w": w, "b": jnp.zeros((n,))}

    tx = get_optimizer(Cfg(optimizer=name, learning_rate=lr), lr)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.mean((p["w"] - target) ** 2) + jnp.mean(p["b"] ** 2)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax_apply(p, updates), s, loss

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    first = None
    for _ in range(steps):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    return first, float(loss_fn(params)), state

def test_quantize_roundtrip():
    x = np.random.RandomState(0).randn(1000).astype(np.float32)
    q, s = quantize_blockwise(jnp.asarray(x), jnp.int8)
    back = np.asarray(dequantize_blockwise(q, s, (1000,)))
    assert q.dtype == jnp.int8
    rel = np.abs(back - x) / np.maximum(np.abs(x), 1e-5)
    assert rel.max() < 0.05, rel.max()  # log code: ~4.4% constant relative error

def test_quantize_roundtrip_int4_packed():
    from simpletuner_tpu.training.optim_quant import INT4_PACKED

    x = np.random.RandomState(1).randn(1024).astype(np.float32)
    q, s = quantize_blockwise(jnp.asarray(x), INT4_PACKED)
    assert q.dtype == jnp.uint8 and q.size == 512  # truly 4-bit storage
    back = np.asarray(dequantize_blockwise(q, s, (1024,)))
    rel = np.abs(back - x) / np.maximum(np.abs(x), 1e-5)
    # 4-bit log grid: ~46% worst-case above the 1/2^8 dynamic-range floor;
    # values below the floor decode to 0 (rel err 1), which is inherent to 4 bits
    big = np.abs(x) > np.abs(x).max() / 200.0
    assert rel[big].max() < 0.6, rel[big].max()

@pytest.mark.parametrize(
    "name,dtype,bytes_per_elem",
    [
        ("ao-adamw8bit", jnp.int8, 1.0),
        ("ao-adamw4bit", jnp.uint8, 0.5),  # two 4-bit codes packed per byte
        ("ao-adamfp8", jnp.float8_e4m3fn, 1.0),
    ],
)
def test_quantized_adamw_state_dtype_and_convergence(name, dtype, bytes_per_elem):
    first, final, state = _run(name)
    assert final < first * 0.5, (first, final)
    # find a quantized moment leaf, check dtype and memory footprint
    leaves = [l for l in jax.tree_util.tree_leaves(state) if hasattr(l, "dtype")]
    q_leaves = [l for l in leaves if l.dtype == dtype]
    assert q_leaves, f"no {dtype} leaf in {name} state"
    n_w = 512 * 64  # the quantized 'w' moment (b stays fp32: below min size)
    big = max(q_leaves, key=lambda l: l.nbytes)
    assert big.nbytes <= n_w * bytes_per_elem * 1.01, (big.nbytes, n_w * bytes_per_elem)

def test_quantized_tracks_full_precision():
    _, final_q, _ = _run("ao-adamw8bit", steps=80)
    _, final_f, _ = _run("adamw", steps=80)
    assert final_q < final_f * 3 + 1e-3, (final_q, final_f)

def test_lion8bit():
    first, final, state = _run("bnb-lion8bit", lr=0.01)
    assert final < first, (first, final)
    leaves = jax.tree_util.tree_leaves(state)
    assert any(l.dtype == jnp.int8 for l in leaves if hasattr(l, "dtype"))

def test_soap_converges_and_rotates():
    first, final, state = _run("soap", steps=40, lr=0.05)
    assert final < first * 0.5, (first, final)
    # after >=10 steps the eigenbasis must have left identity
    flat = jax.tree_util.tree_leaves(state)
    mats = [np.asarray(l) for l in flat if hasattr(l, "ndim") and l.ndim == 2 and l.shape[0] == l.shape[1]]
    assert mats, "no rotation matrices in SOAP state"
    moved = any(not np.allclose(m, np.eye(m.shape[0]), atol=1e-3) for m in mats)
    assert moved, "SOAP eigenbasis never refreshed"

@pytest.mark.parametrize("name", ["stableadamw", "adan", "ranger", "asgd"])
def test_other_optimizers_converge(name):
    first, final, _ = _run(name, steps=80)
    assert final < first, (name, first, final)

def test_sparseadam_raises():
    with pytest.raises(NotImplementedError):
        get_optimizer(Cfg(optimizer="sparseadam"), 1e-3)

def test_unknown_name_raises():
    with pytest.raises(ValueError):
        get_optimizer(Cfg(optimizer="definitely-not-real"), 1e-3)

def test_no_silent_aliasing_of_quantized_names():
    """8-bit names must NOT build the same transform as plain adamw."""
    q = get_optimizer(Cfg(optimizer="ao-adamw8bit"), 1e-3)
    f = get_optimizer(Cfg(optimizer="adamw"), 1e-3)
    params = {"w": jnp.zeros((64, 128))}
    sq = q.init(params)
    sf = f.init(params)
    dq = [l.dtype for l in jax.tree_util.tree_leaves(sq) if hasattr(l, "dtype")]
    df = [l.dtype for l in jax.tree_util.tree_leaves(sf) if hasattr(l, "dtype")]
    assert any(d == jnp.int8 for d in dq) and not any(d == jnp.int8 for d in df)

def test_prodigy_steps_freezes_d_estimate():
    """--prodigy_steps: the d-adaptation estimate stops growing after N steps
    (reference prodigy config knob)."""
    import jax.numpy as jnp
    import optax

    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.training.optimizers import get_optimizer

    def run(steps):
        cfg = TrainingConfig({
            "model_family": "flux", "optimizer": "prodigy", "learning_rate": 1.0,
            "max_train_steps": 8, "max_grad_norm": 0.0, "prodigy_steps": steps,
        })
        tx = get_optimizer(cfg, 1.0)
        params = {"w": jnp.ones((8,))}
        state = tx.init(params)
        ds = []
        for _ in range(8):
            grads = {"w": jnp.full((8,), 1.0, jnp.float32)}  # aligned -> d grows
            updates, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, updates)
            inner = state[-1] if isinstance(state, tuple) else state
            ds.append(float(inner.estim_lr))
        return ds

    free = run(0)
    capped = run(3)
    assert free[-1] > free[0], "prodigy d never grew in the control run"
    assert all(abs(d - capped[2]) < 1e-15 for d in capped[3:]), (
        f"d kept moving after prodigy_steps: {capped}")
