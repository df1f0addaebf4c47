"""Optimizer factory.

The reference exposes ~40 named optimizer choices through a single table
(reference: helpers/training/optimizer_param.py:76-660).  On TPU they collapse
onto optax transforms; CUDA-specific variants (bnb-* 8-bit, torchao ao-*) map to
their closest TPU equivalent.  ``adamw_bf16`` — the reference's pure-bf16 Kahan
optimizer (helpers/training/optimizers/adamw_bfloat16) — is implemented here as a
Kahan-compensated adamw that keeps params + compensation in bf16.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class KahanAdamWState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    compensation: optax.Updates


def kahan_adamw(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """AdamW with Kahan summation so bf16 params train stably without fp32 masters.

    Matches the semantics of the reference's ``adamw_bf16`` (bf16 state, Kahan
    compensation buffers).  Works with any param dtype; state mirrors param dtype.
    """

    def init(params):
        zeros_like = lambda p: jnp.zeros_like(p)
        return KahanAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros_like, params),
            nu=jax.tree_util.tree_map(zeros_like, params),
            compensation=jax.tree_util.tree_map(zeros_like, params),
        )

    def update(updates, state, params):
        if params is None:
            raise ValueError("kahan_adamw requires params")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, m, n, p, comp):
            gf = g.astype(jnp.float32)
            mf = m.astype(jnp.float32) * b1 + gf * (1.0 - b1)
            nf = n.astype(jnp.float32) * b2 + jnp.square(gf) * (1.0 - b2)
            step = lr * (mf / b1c) / (jnp.sqrt(nf / b2c) + eps)
            step = step + lr * weight_decay * p.astype(jnp.float32)
            # Kahan-compensated subtraction in param precision
            delta = (-step).astype(p.dtype) + comp
            new_p = p + delta
            new_comp = delta - (new_p - p)  # lost low-order bits
            return new_p - p, mf.astype(m.dtype), nf.astype(n.dtype), new_comp

        flat_updates, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        flat_comp = treedef.flatten_up_to(state.compensation)
        out = [upd(g, m, n, p, c) for g, m, n, p, c in zip(flat_updates, flat_mu, flat_nu, flat_p, flat_comp)]
        deltas = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        comp = treedef.unflatten([o[3] for o in out])
        return deltas, KahanAdamWState(count, mu, nu, comp)

    return optax.GradientTransformation(init, update)


def _adam_kwargs(config: Any) -> Dict[str, float]:
    return dict(
        b1=config.get("optimizer_beta1") or config.get("adam_beta1", 0.9) or 0.9,
        b2=config.get("optimizer_beta2") or config.get("adam_beta2", 0.999) or 0.999,
        eps=config.get("adam_epsilon", 1e-8) or 1e-8,
    )


def _weight_decay(config: Any, default: float = 1e-2) -> float:
    wd = config.get("adam_weight_decay", default)
    return default if wd is None else wd


def parse_optimizer_config(raw: Optional[str]) -> Dict[str, float]:
    """Parse the reference's ``--optimizer_config`` 'k=v,k=v' override string."""
    if not raw:
        return {}
    out: Dict[str, Any] = {}
    for pair in str(raw).split(","):
        if "=" not in pair:
            continue
        key, value = pair.split("=", 1)
        key = key.strip()
        value = value.strip()
        try:
            out[key] = float(value) if "." in value or "e" in value.lower() else int(value)
        except ValueError:
            out[key] = value
    return out


# name -> factory(learning_rate, config, overrides) -> GradientTransformation
_OPTIMIZERS: Dict[str, Callable] = {}


def _register(*names):
    def wrap(fn):
        for name in names:
            _OPTIMIZERS[name] = fn
        return fn

    return wrap


@_register("adamw", "torch-adamw", "optimi-adamw", "ao-adamw8bit", "ao-adamw4bit", "ao-adamfp8", "ao-adamwfp8", "bnb-adamw", "bnb-adamw8bit", "bnb-adamw-paged", "bnb-adamw8bit-paged")
def _adamw(lr, config, overrides):
    kw = {**_adam_kwargs(config), **{k: v for k, v in overrides.items() if k in ("b1", "b2", "eps")}}
    return optax.adamw(lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)), **kw)


@_register("adamw_bf16")
def _adamw_bf16(lr, config, overrides):
    kw = _adam_kwargs(config)
    return kahan_adamw(lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)), **kw)


@_register("adam", "torch-adam", "optimi-adam", "bnb-adam", "bnb-adam8bit")
def _adam(lr, config, overrides):
    return optax.adam(lr, **_adam_kwargs(config))


@_register("lion", "optimi-lion", "bnb-lion", "bnb-lion8bit", "bnb-lion-paged", "bnb-lion8bit-paged")
def _lion(lr, config, overrides):
    return optax.lion(
        lr,
        b1=overrides.get("b1", 0.9),
        b2=overrides.get("b2", 0.99),
        weight_decay=overrides.get("weight_decay", _weight_decay(config)),
    )


@_register("adafactor", "torch-adafactor")
def _adafactor(lr, config, overrides):
    return optax.adafactor(lr)


@_register("stableadamw", "optimi-stableadamw")
def _stableadamw(lr, config, overrides):
    # StableAdamW ≈ adamw + per-param update clipping by RMS
    kw = _adam_kwargs(config)
    return optax.chain(
        optax.scale_by_adam(b1=kw["b1"], b2=kw["b2"], eps=kw["eps"]),
        optax.contrib.normalize() if overrides.get("normalize") else optax.identity(),
        optax.add_decayed_weights(_weight_decay(config)),
        optax.scale_by_learning_rate(lr),
    )


@_register("sgd", "torch-sgd", "optimi-sgd")
def _sgd(lr, config, overrides):
    return optax.sgd(lr, momentum=overrides.get("momentum", 0.9), nesterov=bool(overrides.get("nesterov", False)))


@_register("radam", "torch-radam", "optimi-radam")
def _radam(lr, config, overrides):
    return optax.radam(lr, **_adam_kwargs(config))


@_register("nadam", "torch-nadam")
def _nadam(lr, config, overrides):
    return optax.nadam(lr, **_adam_kwargs(config))


@_register("rmsprop", "torch-rmsprop")
def _rmsprop(lr, config, overrides):
    return optax.rmsprop(lr)


@_register("adagrad", "torch-adagrad", "bnb-adagrad", "bnb-adagrad8bit")
def _adagrad(lr, config, overrides):
    return optax.adagrad(lr)


@_register("adadelta", "torch-adadelta")
def _adadelta(lr, config, overrides):
    return optax.adadelta(lr)


@_register("adamax", "torch-adamax")
def _adamax(lr, config, overrides):
    return optax.adamaxw(lr, weight_decay=_weight_decay(config))


@_register("prodigy", "prodigy-sf")
def _prodigy(lr, config, overrides):
    return optax.contrib.prodigy(
        learning_rate=1.0 if lr is None else lr,
        weight_decay=overrides.get("weight_decay", _weight_decay(config, 0.0)),
    )


@_register("schedulefree-adamw", "adamw-schedulefree", "optimi-adamw-schedulefree", "schedule_free_adamw")
def _schedule_free(lr, config, overrides):
    kw = _adam_kwargs(config)
    return optax.contrib.schedule_free_adamw(
        learning_rate=lr if not callable(lr) else 1e-4,
        b1=kw["b1"],
        b2=kw["b2"],
        weight_decay=overrides.get("weight_decay", _weight_decay(config)),
    )


@_register("muon")
def _muon(lr, config, overrides):
    return optax.contrib.muon(
        learning_rate=lr,
        adam_b1=_adam_kwargs(config)["b1"],
        adam_b2=_adam_kwargs(config)["b2"],
        weight_decay=overrides.get("weight_decay", _weight_decay(config)),
    )


@_register("soap")
def _soap(lr, config, overrides):
    # SOAP ≈ Shampoo-preconditioned adam; optax has no soap — sophia is the
    # closest second-order-ish contrib transform available on TPU today.
    return optax.contrib.sophia(lr, weight_decay=_weight_decay(config))


def optimizer_names() -> Tuple[str, ...]:
    return tuple(sorted(_OPTIMIZERS))


def get_optimizer(
    config: Any,
    learning_rate: optax.ScalarOrSchedule,
) -> optax.GradientTransformation:
    """Build the optax chain: clip → named optimizer (+ grad accumulation)."""
    name = (config.get("optimizer") or "adamw").lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; known: {optimizer_names()}")
    overrides = parse_optimizer_config(config.get("optimizer_config"))
    tx = _OPTIMIZERS[name](learning_rate, config, overrides)

    chain = []
    max_grad_norm = config.get("max_grad_norm", 1.0)
    method = config.get("grad_clip_method", "norm") or "norm"
    if max_grad_norm and max_grad_norm > 0:
        if method == "value":
            chain.append(optax.clip(max_grad_norm))
        else:
            chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(tx)
    # NOTE: gradient accumulation happens in the train step (scan over a
    # leading micro-batch axis, train_state.build_train_step) — wrapping the
    # optimizer in optax.MultiSteps here would accumulate twice.
    return optax.chain(*chain)
