"""Shared flax.linen building blocks for the model zoo.

LoRA is first-class here instead of the reference's module-surgery approach
(reference: helpers/models/common.py:982 ``add_lora_adapter`` via peft): every
``LoRADense`` owns optional low-rank parameters in a separate ``lora`` variable
collection, so the trainable pytree for adapter runs is simply the ``lora``
collection while base weights stay frozen (and quantizable) in ``params``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import apply_rope, dot_product_attention

Dtype = Any

# T-LoRA per-sample rank mask, set for the duration of one traced forward
# (same trace-context-global pattern as ops.attention's CP config).  Shape
# (B, rank); None disables.
_TLORA_MASK: Optional[jax.Array] = None

# int8 MXU matmul mode for quantized frozen bases ("off" | "forward" | "full");
# static at trace time — set from config before building the jitted step
# (training/quantization.py int8_dynamic_dot)
_QUANTIZED_MATMUL: str = "off"


def set_quantized_matmul(mode: str) -> None:
    global _QUANTIZED_MATMUL
    _QUANTIZED_MATMUL = mode or "off"


# adapter-branch dropout probability (PEFT lora_dropout); static at trace
# time, applied only when a "dropout" rng is provided (train path)
_LORA_DROPOUT: float = 0.0

# per-module LoRA target predicate (reference --lora_target_modules /
# --flux_lora_target / --slider_lora_target, helpers/models/common.py:918
# get_lora_target_layers): called with the "/"-joined flax module path of
# each LoRADense at trace time; None adapts every LoRADense (the default).
# Static at trace time — set from config before init AND before building the
# jitted step (same trace-context-global pattern as _QUANTIZED_MATMUL).
_LORA_TARGET: Optional[Callable[[str], bool]] = None


def set_lora_target(fn: Optional[Callable[[str], bool]]) -> None:
    global _LORA_TARGET
    _LORA_TARGET = fn


# --lora_init_type (reference cmd_args.py:1141 lora_initialisation_style →
# PEFT init_lora_weights): "default" = Microsoft kaiming-uniform(a=√5) on A,
# "gaussian" = N(0, 1/r).  pissa/olora/loftq are post-init transforms applied
# by training/lora_init.py on top of either.  Static at trace time.
_LORA_INIT_STYLE: str = "default"


def set_lora_init_style(style: str) -> None:
    global _LORA_INIT_STYLE
    _LORA_INIT_STYLE = (style or "default").lower()


def lora_a_initializer(rank: int) -> Callable:
    if _LORA_INIT_STYLE == "gaussian":
        return nn.initializers.normal(stddev=1.0 / rank)
    # torch kaiming_uniform(a=√5) on a (r, in) weight == U(±1/√fan_in); flax
    # variance_scaling uniform bound = √(3·scale/fan_in) → scale = 1/3
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def lora_path_enabled(path: Sequence[str]) -> bool:
    if _LORA_TARGET is None:
        return True
    return bool(_LORA_TARGET("/".join(path)))


def set_lora_dropout(p: float) -> None:
    global _LORA_DROPOUT
    _LORA_DROPOUT = float(p or 0.0)


# --init_lokr_norm (reference trainer.py:3259 →
# peft_init.init_lokr_network_with_perturbed_normal): w1 starts at ones and
# w2 as a random tensor rescaled to the org weight's norm/std/mean × scale,
# so the Kronecker delta starts as a small perturbation shaped like the base
# weight instead of exactly zero.  None disables.  Static at trace time.
_LOKR_INIT_NORM: Optional[float] = None


def set_lokr_init_norm(scale: Optional[float]) -> None:
    global _LOKR_INIT_NORM
    _LOKR_INIT_NORM = None if scale is None else float(scale)


def set_tlora_mask(mask: Optional[jax.Array]) -> None:
    global _TLORA_MASK
    _TLORA_MASK = mask


def tlora_rank_mask(
    timesteps: jax.Array, max_rank: int, min_rank: int = 1,
    alpha: float = 1.0, max_timestep: float = 1.0,
) -> jax.Array:
    """(B, max_rank) 0/1 mask: fewer active ranks at higher noise (reference
    lycoris tlora compute_timestep_mask; t in [0, max_timestep])."""
    frac = jnp.clip(1.0 - timesteps.astype(jnp.float32) / max_timestep, 0.0, 1.0)
    active = min_rank + (max_rank - min_rank) * frac**alpha
    return (jnp.arange(max_rank)[None, :] < active[:, None]).astype(jnp.float32)


def lokr_factorize(n: int, factor: int = -1) -> Tuple[int, int]:
    """LyCORIS LoKr dimension factorization: n = m * k with m <= k.

    factor=-1 → most balanced split (largest divisor ≤ √n); factor>0 → the
    lycoris semantics of clamping the small side to ``factor`` when possible.
    """
    if factor > 0 and n % factor == 0:
        return factor, n // factor
    m = int(math.sqrt(n))
    while m > 1 and n % m:
        m -= 1
    return m, n // m


class LoRADense(nn.Module):
    """Dense layer with an optional low-rank adapter branch in the ``lora`` collection.

    * ``lora_algo="lora"``: y += (α/r)·(x A) B with A ~ N(0, 1/r), B = 0
      (reference: PEFT LoRA injection, helpers/models/common.py:982)
    * ``lora_algo="lokr"``: ΔW = kron(W1, W2), W1 (a×b) normal, W2 (c×d) zeros
      with in = a·c, out = b·d (reference: LyCORIS LoKr via lycoris-lora,
      simpletuner/lycoris_defaults.py)
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    lokr_factor: int = -1
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        # DoRA needs the dense kernel for the direction norm, so it bypasses
        # the int8-MXU fast paths (dequant still happens inside remat scope)
        dora = self.lora_algo == "dora" and self.lora_rank > 0 and lora_path_enabled(self.scope.path)
        kernel_dense = None
        y = None
        if not self.is_initializing() and self.has_variable("qscales", "kernel_packed"):
            # int4 frozen base (training/quantization.py): the kernel rides the
            # qscales collection as packed nibbles ((in/2, out) uint8) because
            # a half-height leaf can't live in params under flax's shape
            # check; unpack + scale HERE, inside the block's remat scope, so
            # HBM holds 0.5 byte/param plus one transient bf16 kernel
            packed = self.get_variable("qscales", "kernel_packed")
            scale = self.get_variable("qscales", "kernel_scale")
            if _QUANTIZED_MATMUL != "off" and not dora:
                # nibbles unpack to int8 in [-7, 7] and ride the same s8
                # MXU contraction as the int8 base
                from ..training.quantization import (
                    int8_dynamic_dot,
                    unpack_int4_to_int8,
                )

                y = int8_dynamic_dot(
                    x.astype(self.dtype), unpack_int4_to_int8(packed), scale,
                    _QUANTIZED_MATMUL == "full",
                )
            else:
                from ..training.quantization import unpack_int4

                kernel_dense = unpack_int4(packed, scale, self.dtype)
        else:
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features), self.param_dtype
            )
            if kernel.dtype in (jnp.int8, jnp.dtype(jnp.float8_e4m3fn)):
                # quantized frozen base (training/quantization.py use-site layout):
                # per-output-channel scales ride the ``qscales`` collection and the
                # dequant happens HERE — inside the block's remat scope — so HBM
                # only ever holds the int8 copy plus one transient bf16 kernel
                scale = self.variable(
                    "qscales", "kernel_scale", lambda: jnp.ones((self.features,), jnp.float32)
                ).value
                if kernel.dtype == jnp.int8 and _QUANTIZED_MATMUL != "off" and not dora:
                    # int8 MXU path: dynamic per-token activation quantization,
                    # s8 x s8 -> s32 contraction (2x bf16 peak on v5e);
                    # "full" runs the dx backward in int8 too
                    from ..training.quantization import int8_dynamic_dot

                    y = int8_dynamic_dot(
                        x.astype(self.dtype), kernel, scale,
                        _QUANTIZED_MATMUL == "full",
                    )
                else:
                    kernel_dense = (kernel.astype(jnp.float32) * scale[None, :]).astype(self.dtype)
            else:
                kernel_dense = kernel.astype(self.dtype)
        if y is None:
            if dora:
                # magnitude applies pre-bias; DoRA replaces base + adapter
                y = self._dora_output(x, kernel_dense, in_features)
            else:
                y = jnp.dot(x.astype(self.dtype), kernel_dense)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if dora:
            return y
        return self._apply_adapter(x, y, in_features)

    def _dora_output(self, x: jax.Array, kernel: jax.Array, in_features: int) -> jax.Array:
        """DoRA (Liu et al. 2024; PEFT use_dora=True): W' = m ⊙ (W+ΔW)/‖W+ΔW‖_c
        with the column norm detached (PEFT layer.py _get_weight_norm().detach())
        and m initialized to ‖W₀‖_c so W' = W₀ at step 0."""
        rank = self.lora_rank
        alpha = self.lora_alpha if self.lora_alpha is not None else float(rank)
        scale = alpha / rank
        lora_a = self.variable(
            "lora",
            "lora_A",
            lambda rng: lora_a_initializer(rank)(rng, (in_features, rank), self.param_dtype),
            self.make_rng("params") if self.is_initializing() else None,
        )
        lora_b = self.variable(
            "lora",
            "lora_B",
            lambda rng: jnp.zeros((rank, self.features), self.param_dtype),
            None,
        )
        k32 = kernel.astype(jnp.float32)
        magnitude = self.variable(
            "lora",
            "dora_m",
            lambda rng: jnp.linalg.norm(k32, axis=0),
            None,
        )
        a32 = lora_a.value.astype(jnp.float32)
        b32 = lora_b.value.astype(jnp.float32)
        norm = jnp.linalg.norm(k32 + scale * (a32 @ b32), axis=0)
        norm = jax.lax.stop_gradient(jnp.maximum(norm, 1e-9))
        mag_scale = (magnitude.value.astype(jnp.float32) / norm).astype(self.dtype)
        base = jnp.dot(x.astype(self.dtype), kernel)
        delta = scale * jnp.dot(
            jnp.dot(x.astype(self.dtype), lora_a.value.astype(self.dtype)),
            lora_b.value.astype(self.dtype),
        )
        return (base + delta) * mag_scale

    def _apply_adapter(self, x: jax.Array, y: jax.Array, in_features: int) -> jax.Array:
        if self.lora_rank <= 0 or not lora_path_enabled(self.scope.path):
            return y
        if self.lora_algo == "lokr":
            return y + self._lokr_delta(x, in_features)
        if self.lora_algo == "singlora":
            return y + self._singlora_delta(x, in_features)
        if self.lora_algo == "loha":
            return y + self._loha_delta(x, in_features)
        if self.lora_algo == "ia3":
            return self._ia3_scale(y)
        # "lora" and "tlora" share the two-matrix form
        return y + self._lora_delta(x, in_features)

    def _lora_delta(self, x: jax.Array, in_features: int) -> jax.Array:
        rank = self.lora_rank
        alpha = self.lora_alpha if self.lora_alpha is not None else float(rank)
        lora_a = self.variable(
            "lora",
            "lora_A",
            lambda rng: lora_a_initializer(rank)(rng, (in_features, rank), self.param_dtype),
            self.make_rng("params") if self.is_initializing() else None,
        )
        lora_b = self.variable(
            "lora",
            "lora_B",
            lambda rng: jnp.zeros((rank, self.features), self.param_dtype),
            None,
        )
        scale = alpha / rank
        x_in = x
        if _LORA_DROPOUT > 0 and self.has_rng("dropout"):
            # PEFT lora_dropout: dropout on the adapter-branch INPUT only;
            # the frozen base path stays exact
            keep = 1.0 - _LORA_DROPOUT
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            x_in = x * mask.astype(x.dtype) / keep
        h = jnp.dot(x_in.astype(self.dtype), lora_a.value.astype(self.dtype))
        if self.lora_algo == "tlora" and _TLORA_MASK is not None:
            # T-LoRA per-sample rank gating (reference helpers/training/
            # lycoris.py:13 apply_tlora_timestep_mask): mask shape (B, rank)
            mask = _TLORA_MASK.reshape(
                (_TLORA_MASK.shape[0],) + (1,) * (h.ndim - 2) + (rank,)
            )
            h = h * mask.astype(h.dtype)
        return scale * jnp.dot(h, lora_b.value.astype(self.dtype))

    def _singlora_delta(self, x: jax.Array, in_features: int) -> jax.Array:
        """SingLoRA (reference: peft-singlora, --peft_lora_mode=singlora):
        one matrix A (max(in,out) × r), ΔW = A[:in] @ A[:out]ᵀ — half the
        adapter params of LoRA and symmetric-by-construction for square W.
        The paper's u(t) warm-up ramp is handled by the LR schedule here
        (jit keeps weights step-independent)."""
        rank = self.lora_rank
        alpha = self.lora_alpha if self.lora_alpha is not None else float(rank)
        size = max(in_features, self.features)
        # small (not zero) init: ΔW = A Aᵀ is quadratic in A, so A=0 is a
        # saddle with zero gradient; tiny A gives ΔW≈0 with usable gradients
        a = self.variable(
            "lora",
            "singlora_A",
            lambda rng: nn.initializers.normal(stddev=1e-3)(rng, (size, rank), self.param_dtype),
            self.make_rng("params") if self.is_initializing() else None,
        )
        mat = a.value.astype(self.dtype)
        scale = alpha / rank
        # ΔW = A_in @ A_outᵀ, applied without materialising ΔW
        return scale * jnp.dot(
            jnp.dot(x.astype(self.dtype), mat[:in_features]), mat[: self.features].T
        )

    def _loha_delta(self, x: jax.Array, in_features: int) -> jax.Array:
        """LyCORIS LoHa (Hadamard product low-rank): ΔW = (A1·B1) ⊙ (A2·B2)
        scaled by α/r; B2 = 0 at init so the adapter starts as an identity
        (reference: lycoris-lora LohaModule via lycoris_config.algo=loha,
        simpletuner/lycoris_defaults.py)."""
        rank = self.lora_rank
        alpha = self.lora_alpha if self.lora_alpha is not None else float(rank)
        init_rng = self.make_rng("params") if self.is_initializing() else None

        def normal_init(shape):
            return lambda rng: nn.initializers.normal(stddev=1.0 / rank)(rng, shape, self.param_dtype)

        w1_a = self.variable("lora", "loha_w1_a", normal_init((in_features, rank)), init_rng)
        w1_b = self.variable(
            "lora", "loha_w1_b",
            lambda rng: nn.initializers.normal(stddev=0.02)(rng, (rank, self.features), self.param_dtype),
            self.make_rng("params") if self.is_initializing() else None,
        )
        w2_a = self.variable("lora", "loha_w2_a", normal_init((in_features, rank)), init_rng)
        w2_b = self.variable(
            "lora", "loha_w2_b",
            lambda rng: jnp.zeros((rank, self.features), self.param_dtype), None,
        )
        scale = alpha / rank
        delta = (
            jnp.dot(w1_a.value, w1_b.value) * jnp.dot(w2_a.value, w2_b.value)
        ).astype(self.dtype)
        return scale * jnp.dot(x.astype(self.dtype), delta)

    def _ia3_scale(self, y: jax.Array) -> jax.Array:
        """(IA)³: learned per-output-channel rescaling ℓ (ones at init ⇒
        identity); y ↦ y ⊙ ℓ (reference: lycoris algo=ia3)."""
        ell = self.variable(
            "lora", "ia3_scale",
            lambda rng: jnp.ones((self.features,), self.param_dtype), None,
        )
        return y * ell.value.astype(self.dtype)

    def _lokr_delta(self, x: jax.Array, in_features: int) -> jax.Array:
        a, c = lokr_factorize(in_features, self.lokr_factor)
        b, d = lokr_factorize(self.features, self.lokr_factor)
        norm_init = _LOKR_INIT_NORM

        def w1_init(rng):
            if norm_init is not None:
                # reference peft_init.py:37: lokr_w1.fill_(1.0)
                return jnp.ones((a, b), self.param_dtype)
            return nn.initializers.normal(stddev=0.02)(rng, (a, b), self.param_dtype)

        def w2_init(rng):
            if norm_init is None:
                return jnp.zeros((c, d), self.param_dtype)
            # reference peft_init.approximate_normal_tensor: a normal tensor
            # rescaled to the org weight's norm, restd'd and remeaned, × scale
            org = self.get_variable("params", "kernel").astype(jnp.float32)
            t = jax.random.normal(rng, (c, d), jnp.float32)
            t = t * (jnp.linalg.norm(org) / jnp.maximum(jnp.linalg.norm(t), 1e-12))
            t = t * (jnp.std(org) / jnp.maximum(jnp.std(t), 1e-12))
            t = t - jnp.mean(t) + jnp.mean(org)
            return (t * norm_init).astype(self.param_dtype)

        init_rng = self.make_rng("params") if self.is_initializing() else None
        w1 = self.variable("lora", "lokr_w1", w1_init, init_rng)
        w2 = self.variable("lora", "lokr_w2", w2_init, init_rng)
        alpha = self.lora_alpha if self.lora_alpha is not None else 1.0
        delta = jnp.kron(w1.value, w2.value).astype(self.dtype)  # (a·c, b·d)
        return alpha * jnp.dot(x.astype(self.dtype), delta)


class RMSNorm(nn.Module):
    dim: Optional[int] = None
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x_f = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x_f), axis=-1, keepdims=True)
        y = x_f * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
            y = y * scale.astype(jnp.float32)
        return y.astype(self.dtype)


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0, time_factor: float = 1000.0
) -> jax.Array:
    """Sinusoidal timestep embedding (flow models scale sigma in [0,1] by 1000)."""
    timesteps = timesteps.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class MLPEmbedder(nn.Module):
    """2-layer SiLU MLP used for time/vector/guidance conditioning."""

    hidden_size: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = LoRADense(self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="in_layer")(x)
        x = nn.silu(x)
        return LoRADense(self.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="out_layer")(x)


class FeedForward(nn.Module):
    dim: int
    mult: float = 4.0
    activation: str = "gelu_tanh"  # gelu_tanh | geglu | silu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = int(self.dim * self.mult)
        dense = lambda features, name: LoRADense(
            features,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            name=name,
        )
        if self.activation == "geglu":
            h = dense(inner * 2, "proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
        elif self.activation == "silu":
            h = nn.silu(dense(inner, "proj_in")(x))
        else:
            h = nn.gelu(dense(inner, "proj_in")(x), approximate=True)
        return dense(self.dim, "proj_out")(h)


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context, QK-RMSNorm and RoPE.

    Operates on (B, S, C); uses the framework attention dispatcher (Pallas flash on
    TPU).  All projections are LoRA-aware.
    """

    num_heads: int
    head_dim: Optional[int] = None
    qk_norm: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    out_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        rope: Optional[Tuple[jax.Array, jax.Array]] = None,
        q_segment_ids: Optional[jax.Array] = None,
        kv_segment_ids: Optional[jax.Array] = None,
    ) -> jax.Array:
        head_dim = self.head_dim or x.shape[-1] // self.num_heads
        inner = head_dim * self.num_heads
        kv_source = x if context is None else context

        dense = lambda features, name, bias=True: LoRADense(
            features,
            use_bias=bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            name=name,
        )
        q = dense(inner, "to_q")(x)
        k = dense(inner, "to_k")(kv_source)
        v = dense(inner, "to_v")(kv_source)

        batch, sq = q.shape[:2]
        sk = k.shape[1]
        q = q.reshape(batch, sq, self.num_heads, head_dim)
        k = k.reshape(batch, sk, self.num_heads, head_dim)
        v = v.reshape(batch, sk, self.num_heads, head_dim)

        if self.qk_norm:
            q = RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm_q")(q)
            k = RMSNorm(dtype=self.dtype, param_dtype=self.param_dtype, name="norm_k")(k)

        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        out = dot_product_attention(
            q, k, v, q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids
        )
        out = out.reshape(batch, sq, inner)
        return dense(x.shape[-1], "to_out", bias=self.out_bias)(out)


class PatchEmbed(nn.Module):
    """Conv patchifier for DiTs operating on (B, H, W, C) latents."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        batch, height, width, _ = x.shape
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        return x.reshape(batch, -1, self.embed_dim)


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """(B, dim) mods broadcast over the sequence; (B, S, dim) mods apply
    per token (LongCat-Image tokenwise timesteps, reference
    longcat_image/transformer.py:169-180)."""
    if shift.ndim == 2:
        shift, scale = shift[:, None, :], scale[:, None, :]
    return x * (1.0 + scale) + shift


def gate_mod(gate: jax.Array) -> jax.Array:
    """Broadcast a (B, dim) gate over the sequence axis; pass (B, S, dim)
    tokenwise gates through unchanged."""
    return gate[:, None, :] if gate.ndim == 2 else gate


class AdaLayerNormZero(nn.Module):
    """AdaLN-Zero: emits (shift, scale, gate) triples from the conditioning vector."""

    num_outputs: int = 6  # 6 for attn+mlp, 3 for single-stream, 2 for final layer
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    # modulation-linear adapters (flux --flux_lora_target=ai-toolkit targets
    # norm.linear / norm1.linear / norm1_context.linear); rank 0 = off
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"

    @nn.compact
    def __call__(self, vec: jax.Array, dim: int) -> Sequence[jax.Array]:
        vec = nn.silu(vec)
        out = LoRADense(
            dim * self.num_outputs,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            name="lin",
        )(vec)
        return jnp.split(out, self.num_outputs, axis=-1)


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 with optional affine params."""

    use_scale: bool = True
    use_bias: bool = True
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(
            epsilon=self.eps,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
