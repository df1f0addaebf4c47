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


@_register("adamw", "torch-adamw", "optimi-adamw", "bnb-adamw", "bnb-adamw-paged")
def _adamw(lr, config, overrides):
    # "-paged" refers to CUDA unified-memory paging of fp32 states — a host-RAM
    # concern with no TPU analogue; states are identical fp32 Adam moments.
    kw = {**_adam_kwargs(config), **{k: v for k, v in overrides.items() if k in ("b1", "b2", "eps")}}
    return optax.adamw(lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)), **kw)


@_register("ao-adamw8bit", "bnb-adamw8bit", "bnb-adamw8bit-paged")
def _adamw_8bit(lr, config, overrides):
    from .optim_quant import adamw_quantized

    kw = _adam_kwargs(config)
    return adamw_quantized(
        lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)),
        state_dtype=jnp.int8, **kw,
    )


@_register("ao-adamw4bit")
def _adamw_4bit(lr, config, overrides):
    from .optim_quant import INT4_PACKED, adamw_quantized

    kw = _adam_kwargs(config)
    return adamw_quantized(
        lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)),
        state_dtype=INT4_PACKED, **kw,
    )


@_register("ao-adamfp8", "ao-adamwfp8")
def _adamw_fp8(lr, config, overrides):
    from .optim_quant import adamw_quantized

    kw = _adam_kwargs(config)
    return adamw_quantized(
        lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)),
        state_dtype=jnp.float8_e4m3fn, **kw,
    )


@_register("bnb-adam8bit")
def _adam_8bit(lr, config, overrides):
    from .optim_quant import adamw_quantized

    kw = _adam_kwargs(config)
    return adamw_quantized(lr, weight_decay=0.0, state_dtype=jnp.int8, **kw)


@_register("bnb-lion8bit", "bnb-lion8bit-paged")
def _lion_8bit(lr, config, overrides):
    from .optim_quant import lion_quantized

    return lion_quantized(
        lr,
        b1=overrides.get("b1", 0.9),
        b2=overrides.get("b2", 0.99),
        weight_decay=overrides.get("weight_decay", _weight_decay(config)),
    )


@_register("adamw_bf16")
def _adamw_bf16(lr, config, overrides):
    kw = _adam_kwargs(config)
    return kahan_adamw(lr, weight_decay=overrides.get("weight_decay", _weight_decay(config)), **kw)


@_register("adam", "torch-adam", "optimi-adam", "bnb-adam", "bnb-adam8bit")
def _adam(lr, config, overrides):
    return optax.adam(lr, **_adam_kwargs(config))


@_register("lion", "optimi-lion", "bnb-lion", "bnb-lion-paged")
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
    """StableAdamW (Wortsman et al. 2023): AdamW whose per-tensor LR is divided
    by max(1, RMS(g²/v̂)) — update clipping replaces global grad clipping."""
    kw = _adam_kwargs(config)
    b1, b2, eps = kw["b1"], kw["b2"], kw["eps"]
    wd = overrides.get("weight_decay", _weight_decay(config))

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
            nu=jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, m, n, p):
            gf = g.astype(jnp.float32)
            m2 = m * b1 + gf * (1.0 - b1)
            n2 = n * b2 + jnp.square(gf) * (1.0 - b2)
            v_hat = n2 / b2c
            rms = jnp.sqrt(jnp.mean(jnp.square(gf) / jnp.maximum(v_hat, eps * eps)))
            scale = 1.0 / jnp.maximum(1.0, rms)
            u = (m2 / b1c) / (jnp.sqrt(v_hat) + eps)
            u = (u + wd * p.astype(jnp.float32)) * scale
            return u.astype(g.dtype), m2, n2

        res = jax.tree_util.tree_map(upd, updates, state.mu, state.nu, params)
        leaves, treedef = jax.tree_util.tree_flatten(updates)
        flat = [res_leaf for res_leaf in treedef.flatten_up_to(res)]
        return (
            treedef.unflatten([f[0] for f in flat]),
            optax.ScaleByAdamState(
                count,
                treedef.unflatten([f[1] for f in flat]),
                treedef.unflatten([f[2] for f in flat]),
            ),
        )

    return optax.chain(
        optax.GradientTransformation(init, update),
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
    base = optax.contrib.prodigy(
        learning_rate=1.0 if lr is None else lr,
        weight_decay=overrides.get("weight_decay", _weight_decay(config, 0.0)),
    )
    steps = int(getattr(config, "prodigy_steps", 0) or 0)
    if not steps:
        return base

    # --prodigy_steps (reference optimizer_param prodigy config): freeze the
    # d-adaptation estimate after N steps so the discovered LR stops growing
    def update_fn(grads, state, params=None):
        updates, new_state = base.update(grads, state, params)
        frozen = state.count >= steps
        new_state = new_state._replace(
            estim_lr=jnp.where(frozen, state.estim_lr, new_state.estim_lr),
            numerator_weighted=jnp.where(
                frozen, state.numerator_weighted, new_state.numerator_weighted
            ),
        )
        return updates, new_state

    return optax.GradientTransformation(base.init, update_fn)


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
    from .soap import soap

    kw = _adam_kwargs(config)
    return soap(
        lr,
        b1=overrides.get("b1", 0.95),
        b2=overrides.get("b2", 0.95),
        shampoo_beta=overrides.get("shampoo_beta", 0.95),
        eps=kw["eps"],
        weight_decay=overrides.get("weight_decay", _weight_decay(config)),
        precondition_frequency=int(overrides.get("precondition_frequency", 10)),
        max_precond_dim=int(overrides.get("max_precond_dim", 8192)),
    )


@_register("adan", "optimi-adan")
def _adan(lr, config, overrides):
    """Adan (Xie et al. 2022): adaptive Nesterov momentum — EMAs of the grad,
    the grad difference, and the Nesterov-corrected square."""
    b1 = overrides.get("b1", 0.98)
    b2 = overrides.get("b2", 0.92)
    b3 = overrides.get("b3", 0.99)
    eps = _adam_kwargs(config)["eps"]
    wd = overrides.get("weight_decay", _weight_decay(config))

    class AdanState(NamedTuple):
        count: jax.Array
        m: optax.Updates
        v: optax.Updates
        n: optax.Updates
        prev_grad: optax.Updates

    def init(params):
        z = lambda p: jnp.zeros_like(p, jnp.float32)
        tm = jax.tree_util.tree_map
        return AdanState(jnp.zeros([], jnp.int32), tm(z, params), tm(z, params), tm(z, params), tm(z, params))

    def update(updates, state, params=None):
        count = state.count + 1
        first = (count == 1).astype(jnp.float32)
        cf = count.astype(jnp.float32)
        c1 = 1.0 - b1 ** cf
        c2 = 1.0 - b2 ** cf
        c3 = 1.0 - b3 ** cf

        def upd(g, m, v, n, pg, p):
            gf = g.astype(jnp.float32)
            diff = (gf - pg) * (1.0 - first)  # zero on the first step
            m2 = m * b1 + gf * (1.0 - b1)
            v2 = v * b2 + diff * (1.0 - b2)
            nest = gf + b2 * diff
            n2 = n * b3 + jnp.square(nest) * (1.0 - b3)
            denom = jnp.sqrt(n2 / c3) + eps
            u = (m2 / c1 + b2 * v2 / c2) / denom + wd * p.astype(jnp.float32)
            return u.astype(g.dtype), m2, v2, n2, gf

        leaves, treedef = jax.tree_util.tree_flatten(updates)
        res = [
            upd(g, m, v, n, pg, p)
            for g, m, v, n, pg, p in zip(
                leaves,
                treedef.flatten_up_to(state.m),
                treedef.flatten_up_to(state.v),
                treedef.flatten_up_to(state.n),
                treedef.flatten_up_to(state.prev_grad),
                treedef.flatten_up_to(params),
            )
        ]
        return (
            treedef.unflatten([r[0] for r in res]),
            AdanState(
                count,
                treedef.unflatten([r[1] for r in res]),
                treedef.unflatten([r[2] for r in res]),
                treedef.unflatten([r[3] for r in res]),
                treedef.unflatten([r[4] for r in res]),
            ),
        )

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.scale_by_learning_rate(lr),
    )


@_register("ranger", "optimi-ranger")
def _ranger(lr, config, overrides):
    """Ranger = RAdam + Lookahead.  The slow-weight copy lives in optimizer
    state; every ``sync_period`` steps the emitted update retargets the params
    onto slow + α·(fast − slow)."""
    kw = _adam_kwargs(config)
    sync_period = int(overrides.get("sync_period", 6))
    alpha = float(overrides.get("slow_step_size", 0.5))
    inner = optax.radam(lr, **kw)

    class LookaheadState(NamedTuple):
        inner: Any
        slow: optax.Updates
        count: jax.Array

    def init(params):
        return LookaheadState(
            inner.init(params),
            jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params),
            jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None):
        fast_updates, inner_state = inner.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % sync_period) == 0

        def leaf(u, slow, p):
            fast_next = p.astype(jnp.float32) + u.astype(jnp.float32)
            slow_next = slow + alpha * (fast_next - slow)
            emitted = jnp.where(sync, slow_next - p.astype(jnp.float32), u.astype(jnp.float32))
            new_slow = jnp.where(sync, slow_next, slow)
            return emitted.astype(u.dtype), new_slow

        leaves, treedef = jax.tree_util.tree_flatten(fast_updates)
        res = [
            leaf(u, s, p)
            for u, s, p in zip(leaves, treedef.flatten_up_to(state.slow), treedef.flatten_up_to(params))
        ]
        return (
            treedef.unflatten([r[0] for r in res]),
            LookaheadState(inner_state, treedef.unflatten([r[1] for r in res]), count),
        )

    return optax.GradientTransformation(init, update)


@_register("asgd", "torch-asgd")
def _asgd(lr, config, overrides):
    """ASGD: SGD iterates + a Polyak parameter average kept in state (torch's
    ``ax`` buffer).  The averaged copy is what torch exposes after training."""
    t0 = float(overrides.get("t0", 1e6))

    class ASGDState(NamedTuple):
        count: jax.Array
        averaged: optax.Updates

    def init(params):
        return ASGDState(
            jnp.zeros([], jnp.int32),
            jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params),
        )

    def update(updates, state, params=None):
        count = state.count + 1
        cf = count.astype(jnp.float32)
        mu_w = 1.0 / jnp.maximum(1.0, cf - t0)

        def leaf(g, ax, p):
            new_p = p.astype(jnp.float32) + g.astype(jnp.float32)  # post-lr update applied below
            new_ax = ax + mu_w * (new_p - ax)
            return new_ax

        leaves, treedef = jax.tree_util.tree_flatten(updates)
        new_ax = [
            leaf(g, a, p)
            for g, a, p in zip(leaves, treedef.flatten_up_to(state.averaged), treedef.flatten_up_to(params))
        ]
        return updates, ASGDState(count, treedef.unflatten(new_ax))

    return optax.chain(
        optax.scale_by_learning_rate(lr),
        optax.GradientTransformation(init, update),
    )


@_register("sparseadam", "torch-sparseadam")
def _sparseadam(lr, config, overrides):
    raise NotImplementedError(
        "sparseadam requires sparse gradients, which XLA/TPU does not produce; "
        "use adamw (dense) instead"
    )


def optimizer_names() -> Tuple[str, ...]:
    return tuple(sorted(_OPTIMIZERS))


def _te_freeze_predicate(config: Any, strategy: str):
    """Layer-freeze mask for text-encoder training (reference
    --freeze_encoder_strategy before|after|between with --freeze_encoder_before
    /_after layer indices): frozen leaves get optax.set_to_zero updates."""
    import re as _re

    before = int(config.get("freeze_encoder_before", 0) or 0)
    after = int(config.get("freeze_encoder_after", 10**9) or 10**9)

    def frozen(path) -> bool:
        if strategy == "none":
            return False
        idx = None
        keys = [getattr(k, "key", str(k)) for k in path]
        for i, key in enumerate(keys):
            if key == "layers" and i + 1 < len(keys) and _re.fullmatch(r"\d+", str(keys[i + 1])):
                idx = int(keys[i + 1])
                break
        if idx is None:
            # embeddings / final norm etc. freeze only with "before" (they sit
            # upstream of the first block) — reference freezes embeddings too
            return strategy == "before" and before > 0
        if strategy == "before":
            return idx < before
        if strategy == "after":
            return idx > after
        if strategy == "between":
            return before <= idx <= after
        raise ValueError(
            f"unknown freeze_encoder_strategy {strategy!r}; known: none, before, after, between"
        )

    return frozen


def get_optimizer(
    config: Any,
    learning_rate: optax.ScalarOrSchedule,
) -> optax.GradientTransformation:
    """Build the optax chain: clip → named optimizer (+ grad accumulation).

    With ``train_text_encoder`` and a distinct ``text_encoder_lr`` (reference
    --text_encoder_lr, field_registry training.py:740), the ``te_params``
    subtree gets its own optimizer instance at that rate via multi_transform;
    everything else rides the main schedule.
    """
    name = (config.get("optimizer") or "adamw").lower()
    if name not in _OPTIMIZERS:
        raise ValueError(f"unknown optimizer {name!r}; known: {optimizer_names()}")
    overrides = parse_optimizer_config(config.get("optimizer_config"))
    tx = _OPTIMIZERS[name](learning_rate, config, overrides)

    # sidecar optimizer groups (text encoder / lyric embedder) ride an
    # optax.multi_transform keyed by top-level trainable collection
    transforms: Dict[str, optax.GradientTransformation] = {"model": tx}
    # BitFit (reference --layer_freeze_strategy=bitfit, model_freeze.py:82
    # apply_bitfit_freezing): full fine-tune trains ONLY bias leaves; LoRA
    # adapters have no bias and arrive pre-frozen, so bitfit no-ops there
    # exactly like the reference
    freeze_layers = (config.get("layer_freeze_strategy") or "none").lower()
    if freeze_layers not in ("none", "bitfit"):
        raise ValueError(
            f"unknown layer_freeze_strategy {freeze_layers!r}; known: none, bitfit"
        )
    bitfit = freeze_layers == "bitfit" and config.get("model_type", "lora") == "full"
    if bitfit:
        transforms["bitfit_frozen"] = optax.set_to_zero()
    te_lr = config.get("text_encoder_lr")
    freeze_strategy = (config.get("freeze_encoder_strategy") or "none").lower()
    frozen_fn = None
    if config.get("train_text_encoder") and (te_lr or freeze_strategy != "none"):
        transforms["te"] = _OPTIMIZERS[name](float(te_lr), config, overrides) if te_lr else tx
        transforms["te_frozen"] = optax.set_to_zero()
        frozen_fn = _te_freeze_predicate(config, freeze_strategy)
    if config.get("lyrics_embedder_train"):
        # reference --lyrics_embedder_optimizer/_lr (trainer.py:3292 sidecar)
        lyr_name = (config.get("lyrics_embedder_optimizer") or name).lower()
        if lyr_name not in _OPTIMIZERS:
            raise ValueError(
                f"unknown lyrics_embedder_optimizer {lyr_name!r}; known: {optimizer_names()}"
            )
        lyr_lr = config.get("lyrics_embedder_lr")
        lyr_sched_name = config.get("lyrics_embedder_lr_scheduler")
        if lyr_sched_name:
            # sidecar LR schedule override (reference trainer.py:3965,6813:
            # the lyric embedder's scheduler defaults to the main lr_scheduler
            # but --lyrics_embedder_lr_scheduler picks its own curve)
            from .schedules import get_lr_schedule

            class _Overlay:
                def __init__(self, base, over):
                    self._base, self._over = base, over

                def get(self, key, default=None):
                    if key in self._over:
                        return self._over[key]
                    return self._base.get(key, default)

            lyr_rate = get_lr_schedule(
                _Overlay(config, {
                    "lr_scheduler": lyr_sched_name,
                    "learning_rate": float(lyr_lr) if lyr_lr else config.get("learning_rate"),
                }),
                int(config.get("max_train_steps") or 1000),
            )
        else:
            lyr_rate = float(lyr_lr) if lyr_lr else learning_rate
        transforms["lyrics"] = _OPTIMIZERS[lyr_name](lyr_rate, config, overrides)
    if len(transforms) > 1:

        def label_tree(params):
            out = {}
            for key, sub in params.items():
                if key in ("te_params", "te_lora") and "te" in transforms:
                    out[key] = jax.tree_util.tree_map_with_path(
                        lambda path, _: "te_frozen" if frozen_fn(path) else "te", sub
                    )
                elif key == "lyrics_params" and "lyrics" in transforms:
                    out[key] = jax.tree_util.tree_map(lambda _: "lyrics", sub)
                elif bitfit:
                    out[key] = jax.tree_util.tree_map_with_path(
                        lambda path, _: "model"
                        if getattr(path[-1], "key", str(path[-1])) == "bias"
                        else "bitfit_frozen",
                        sub,
                    )
                else:
                    out[key] = jax.tree_util.tree_map(lambda _: "model", sub)
            return out

        tx = optax.multi_transform(transforms, label_tree)

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
