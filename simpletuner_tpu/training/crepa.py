"""CREPA — Cross-frame Representation Alignment (full-depth rebuild).

Reference: helpers/training/crepa.py:92-1119 (CrepaMode/CrepaFeatureSource/
CrepaScheduler/CrepaRegularizer) + the trainer integration in
helpers/models/common.py:4760-4860 (_validate_crepa_configuration,
_build_crepa_teacher_batch, EMA-teacher self-flow forward).

TPU-native shape:
* the weight schedule (warmup / linear / cosine / polynomial decay / step
  cutoff) is a pure function of the global step and runs INSIDE the jitted
  step (``scheduled_weight``) — no host round trip;
* the similarity-EMA cutoff (reference CrepaScheduler._update_similarity_ema)
  is inherently cross-step host state: the trainer tracks the EMA from the
  step metrics and feeds a 0/1 ``crepa_cutoff`` scalar into the next batch
  (``CrepaHostState``), matching the reference's permanent/recoverable modes;
* the in-loop teacher (reference DINOv2 via torch.hub) is a flax ViT
  (models/vision_encoder.py) riding ``frozen["crepa_teacher"]``; clean latents
  decode through the TAE (crepa_use_tae) or the frozen VAE decoder inside the
  step, resize + ImageNet-normalize in jnp, then the ViT's patch tokens are
  the teacher features;
* the learned projector (reference ``crepa_projector`` LayerNorm+Linear
  attached to the model) is a ``crepa_params`` trainable collection applied
  with explicit jnp ops.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FEATURE_SOURCES = ("encoder", "backbone", "self_flow")
_SCHEDULERS = ("constant", "linear", "cosine", "polynomial")
_THRESHOLD_MODES = ("permanent", "recoverable")

# ImageNet normalization (reference crepa.py:689-692)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class CrepaSettings:
    enabled: bool = False
    block_index: int = 0
    distance: int = 1
    tau: float = 1.0
    cumulative_neighbors: bool = False
    normalize_neighbour_sum: bool = False
    normalize_by_frames: bool = True
    spatial_align: bool = True
    base_weight: float = 0.5
    scheduler: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0  # 0 -> max_train_steps at wiring time
    lambda_end: float = 0.0
    cutoff_step: int = 0
    power: float = 1.0
    similarity_threshold: Optional[float] = None
    similarity_ema_decay: float = 0.99
    threshold_mode: str = "permanent"
    feature_source: str = "encoder"
    teacher_block_index: Optional[int] = None
    self_flow_mask_ratio: float = 0.1
    use_tae: bool = False
    encoder_image_size: int = 518
    mode: str = "image"  # image | video (reference CrepaMode)
    max_train_steps: int = 0

    @classmethod
    def from_config(cls, config: Any, mode: str = "image", max_train_steps: int = 0) -> "CrepaSettings":
        enabled = bool(getattr(config, "crepa_enabled", False))
        if not enabled:
            return cls(enabled=False)
        raw_source = getattr(config, "crepa_feature_source", None)
        use_backbone = bool(getattr(config, "crepa_use_backbone_features", False))
        use_self_flow = bool(getattr(config, "crepa_self_flow", False))
        aliases = {
            "encoder": "encoder", "external": "encoder",
            "backbone": "backbone", "internal": "backbone",
            "self_flow": "self_flow", "selfflow": "self_flow",
        }
        source = aliases.get(str(raw_source).strip().lower()) if raw_source else None
        if raw_source and source is None:
            raise ValueError(
                f"unsupported crepa_feature_source={raw_source!r}; expected one "
                f"of {', '.join(_FEATURE_SOURCES)}"
            )
        if use_backbone and use_self_flow:
            raise ValueError("crepa_use_backbone_features and crepa_self_flow cannot both be enabled")
        if source is not None:
            if use_backbone and source != "backbone":
                raise ValueError("crepa_use_backbone_features conflicts with crepa_feature_source")
            if use_self_flow and source != "self_flow":
                raise ValueError("crepa_self_flow conflicts with crepa_feature_source")
        else:
            source = "self_flow" if use_self_flow else ("backbone" if use_backbone else "encoder")

        block_index = getattr(config, "crepa_block_index", None)
        if block_index is None:
            raise ValueError("crepa_block_index must be set when CREPA is enabled")
        distance = int(getattr(config, "crepa_adjacent_distance", 1) or 1)
        if distance < 0:
            raise ValueError("crepa_adjacent_distance must be non-negative")
        tau = float(getattr(config, "crepa_adjacent_tau", 1.0) or 1.0)
        if tau <= 0:
            raise ValueError("crepa_adjacent_tau must be greater than zero")
        scheduler = str(getattr(config, "crepa_scheduler", "constant") or "constant").lower()
        if scheduler not in _SCHEDULERS:
            raise ValueError(f"unknown crepa_scheduler {scheduler!r}; known: {_SCHEDULERS}")
        threshold_mode = str(getattr(config, "crepa_threshold_mode", "permanent") or "permanent").lower()
        if threshold_mode not in _THRESHOLD_MODES:
            raise ValueError(f"unknown crepa_threshold_mode {threshold_mode!r}")
        mask_ratio = float(getattr(config, "crepa_self_flow_mask_ratio", 0.1) or 0.0)
        if source == "self_flow":
            if not 0.0 <= mask_ratio <= 0.5:
                raise ValueError("crepa_self_flow_mask_ratio must be within [0.0, 0.5]")
            if getattr(config, "crepa_teacher_block_index", None) is None:
                raise ValueError("crepa_self_flow requires crepa_teacher_block_index")
            if not getattr(config, "use_ema", False):
                raise ValueError("crepa_self_flow requires an EMA teacher; enable use_ema")
        threshold = getattr(config, "crepa_similarity_threshold", None)
        raw_decay = getattr(config, "crepa_similarity_ema_decay", None)
        return cls(
            enabled=True,
            block_index=int(block_index),
            distance=distance,
            tau=tau,
            cumulative_neighbors=bool(getattr(config, "crepa_cumulative_neighbors", False)),
            normalize_neighbour_sum=bool(getattr(config, "crepa_normalize_neighbour_sum", False)),
            normalize_by_frames=bool(getattr(config, "crepa_normalize_by_frames", True)
                                     if getattr(config, "crepa_normalize_by_frames", None) is not None
                                     else True),
            spatial_align=bool(getattr(config, "crepa_spatial_align", True)
                               if getattr(config, "crepa_spatial_align", None) is not None
                               else True),
            base_weight=float(getattr(config, "crepa_lambda", 0.5) or 0.0),
            scheduler=scheduler,
            warmup_steps=int(getattr(config, "crepa_warmup_steps", 0) or 0),
            decay_steps=int(getattr(config, "crepa_decay_steps", 0) or 0) or max_train_steps,
            lambda_end=float(getattr(config, "crepa_lambda_end", 0.0) or 0.0),
            cutoff_step=int(getattr(config, "crepa_cutoff_step", 0) or 0),
            power=float(getattr(config, "crepa_power", 1.0) or 1.0),
            similarity_threshold=float(threshold) if threshold is not None else None,
            similarity_ema_decay=float(raw_decay) if raw_decay is not None else 0.99,
            threshold_mode=threshold_mode,
            feature_source=source,
            teacher_block_index=(
                int(getattr(config, "crepa_teacher_block_index"))
                if getattr(config, "crepa_teacher_block_index", None) is not None else None
            ),
            self_flow_mask_ratio=mask_ratio,
            use_tae=bool(getattr(config, "crepa_use_tae", False)),
            encoder_image_size=int(getattr(config, "crepa_encoder_image_size", 518) or 518),
            mode=mode,
            max_train_steps=max_train_steps,
        )


def schedule_settings(
    base_weight: float,
    scheduler: str,
    warmup_steps: int,
    decay_steps: int,
    lambda_end: float,
    cutoff_step: int,
    power: float,
    max_train_steps: int,
    similarity_threshold: Optional[float] = None,
    similarity_ema_decay: float = 0.99,
    threshold_mode: str = "permanent",
    encoder_image_size: int = 518,
) -> "CrepaSettings":
    """A CrepaSettings that carries only the shared scheduler/cutoff state —
    U-REPA reuses CREPA's weight schedule and similarity-EMA machinery
    (reference crepa.py: UrepaRegularizer shares CrepaScheduler)."""
    scheduler = str(scheduler or "constant").lower()
    if scheduler not in _SCHEDULERS:
        raise ValueError(f"unknown scheduler {scheduler!r}; known: {_SCHEDULERS}")
    threshold_mode = str(threshold_mode or "permanent").lower()
    if threshold_mode not in _THRESHOLD_MODES:
        raise ValueError(f"unknown threshold_mode {threshold_mode!r}")
    return CrepaSettings(
        enabled=True,
        block_index=0,
        base_weight=float(base_weight),
        scheduler=scheduler,
        warmup_steps=int(warmup_steps or 0),
        decay_steps=int(decay_steps or 0) or int(max_train_steps or 0),
        lambda_end=float(lambda_end or 0.0),
        cutoff_step=int(cutoff_step or 0),
        power=float(power or 1.0),
        similarity_threshold=(
            float(similarity_threshold) if similarity_threshold is not None else None
        ),
        similarity_ema_decay=float(similarity_ema_decay),
        threshold_mode=threshold_mode,
        encoder_image_size=int(encoder_image_size or 518),
        max_train_steps=int(max_train_steps or 0),
    )


# ---------------------------------------------------------------------------------
# weight schedule (reference CrepaScheduler._compute_scheduled_weight; pure jnp)
# ---------------------------------------------------------------------------------


def scheduled_weight(settings: CrepaSettings, step: jax.Array) -> jax.Array:
    """λ(step): warmup ramp, then constant/linear/cosine/polynomial decay to
    lambda_end; crepa_cutoff_step zeroes it from that step on.  Runs inside
    the jitted step (the similarity-EMA cutoff is a separate host-fed flag)."""
    step = step.astype(jnp.float32)
    base, end = settings.base_weight, settings.lambda_end
    warmup = float(max(settings.warmup_steps, 0))
    total = float(max(settings.decay_steps - settings.warmup_steps, 1))
    progress = jnp.clip((step - warmup) / total, 0.0, 1.0)
    if settings.scheduler == "constant":
        after = jnp.float32(base)
    elif settings.scheduler == "linear":
        after = base + (end - base) * progress
    elif settings.scheduler == "cosine":
        after = end + (base - end) * (1.0 + jnp.cos(jnp.pi * progress)) / 2.0
    else:  # polynomial
        after = (base - end) * (1.0 - progress) ** settings.power + end
    weight = jnp.where(
        (warmup > 0) & (step < warmup), base * step / jnp.maximum(warmup, 1.0), after
    )
    if settings.cutoff_step > 0:
        weight = jnp.where(step >= settings.cutoff_step, 0.0, weight)
    return weight


class CrepaHostState:
    """Host-side similarity-EMA cutoff (reference CrepaScheduler EMA logic).

    The trainer calls ``update`` with each step's crepa_alignment_score metric
    and injects ``flag()`` into the next batch as ``crepa_cutoff``."""

    def __init__(self, settings: CrepaSettings):
        self.settings = settings
        self.ema: Optional[float] = None
        self.triggered = False

    def update(self, alignment_score: Optional[float]) -> None:
        if alignment_score is None or not np.isfinite(alignment_score):
            return
        decay = self.settings.similarity_ema_decay
        self.ema = (
            alignment_score if self.ema is None
            else decay * self.ema + (1 - decay) * alignment_score
        )
        threshold = self.settings.similarity_threshold
        if threshold is not None and self.ema is not None:
            over = self.ema >= threshold
            if over:
                self.triggered = True
            elif self.settings.threshold_mode == "recoverable":
                self.triggered = False

    def flag(self) -> float:
        return 1.0 if self.triggered else 0.0


# ---------------------------------------------------------------------------------
# projector (reference attach_to_model: LayerNorm + Linear, fp32)
# ---------------------------------------------------------------------------------


def init_projector(rng: jax.Array, hidden_size: int, target_dim: int) -> Dict[str, jax.Array]:
    bound = 1.0 / math.sqrt(hidden_size)
    return {
        "ln_scale": jnp.ones((hidden_size,), jnp.float32),
        "ln_bias": jnp.zeros((hidden_size,), jnp.float32),
        "kernel": jax.random.uniform(
            rng, (hidden_size, target_dim), jnp.float32, -bound, bound
        ),
        "bias": jnp.zeros((target_dim,), jnp.float32),
    }


def apply_projector(params: Dict[str, jax.Array], hidden: jax.Array) -> jax.Array:
    x = hidden.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    x = (x - mean) / jnp.sqrt(var + 1e-5)
    x = x * params["ln_scale"] + params["ln_bias"]
    return x @ params["kernel"] + params["bias"]


# ---------------------------------------------------------------------------------
# shape plumbing (reference _project_hidden_states / _maybe_align_*)
# ---------------------------------------------------------------------------------


def to_btnd(tokens: jax.Array, mode: str, num_frames: Optional[int] = None) -> jax.Array:
    """Structure flat tokens as (B, T, N, D).

    image: (B,S,D)->(B,1,S,D).  video: DiT hidden states arrive frame-flattened
    (B, T*N, D) — reshape by the latent frame count so neighbour offsets index
    FRAMES (reference _project_hidden_states reshapes by num_frames); a stream
    that doesn't divide (e.g. joint text+video tokens) degrades to per-token
    frames (B,T,1,D).  4-D passes through."""
    if tokens.ndim == 3:
        if mode == "image":
            return tokens[:, None]
        if num_frames and num_frames > 1 and tokens.shape[1] % num_frames == 0:
            b, s, d = tokens.shape
            return tokens.reshape(b, num_frames, s // num_frames, d)
        return tokens[:, :, None]
    if tokens.ndim != 4:
        raise ValueError(f"CREPA expected 3- or 4-D tokens, got {tokens.shape}")
    return tokens


def interpolate_tokens(tokens: jax.Array, target: int) -> jax.Array:
    """Resample the token axis to ``target`` (bilinear on square grids, linear
    otherwise — reference _interpolate_tokens)."""
    b, t, n, d = tokens.shape
    if n == target:
        return tokens
    flat = tokens.reshape(b * t, n, d)
    src = int(math.isqrt(n))
    tgt = int(math.isqrt(target))
    if src * src == n and tgt * tgt == target:
        grid = flat.reshape(b * t, src, src, d)
        out = jax.image.resize(grid, (b * t, tgt, tgt, d), method="bilinear")
        return out.reshape(b, t, target, d)
    out = jax.image.resize(flat, (b * t, target, d), method="linear")
    return out.reshape(b, t, target, d)


def subsample_frames(tokens: jax.Array, target: int) -> jax.Array:
    """Representative-frame selection on the T axis (reference
    _maybe_align_temporal linspace index_select)."""
    t = tokens.shape[1]
    if t == target:
        return tokens
    idx = jnp.linspace(0, t - 1, target).astype(jnp.int32)
    return tokens[:, idx]


def align_shapes(
    projected: jax.Array, teacher: jax.Array, settings: CrepaSettings
) -> Tuple[jax.Array, jax.Array]:
    t = min(projected.shape[1], teacher.shape[1])
    projected = subsample_frames(projected, t)
    teacher = subsample_frames(teacher, t)
    if projected.shape[2] != teacher.shape[2]:
        if not settings.spatial_align:
            projected = projected.mean(axis=2, keepdims=True)
            teacher = teacher.mean(axis=2, keepdims=True)
        else:
            target = min(projected.shape[2], teacher.shape[2])
            projected = interpolate_tokens(projected, target)
            teacher = interpolate_tokens(teacher, target)
    return projected, teacher


# ---------------------------------------------------------------------------------
# the alignment loss (reference compute_loss Eq. (6))
# ---------------------------------------------------------------------------------


def alignment_loss(
    projected: jax.Array,  # (B, T, N, D_t) — already projected
    teacher: jax.Array,  # (B, T, N, D_t) — stop-gradient applied here
    settings: CrepaSettings,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (negative weighted similarity sum, alignment_score, self_similarity).

    Exact reference math: per-patch cosine similarity averaged over patches
    gives (B, T); neighbours at ±d contribute exp(-d/τ)-weighted terms
    (cumulative mode sums d'=1..d); optional weight-sum normalization; the
    per-video sum (optionally /T) is MAXIMIZED (the loss term is its negative)."""
    teacher = jax.lax.stop_gradient(teacher.astype(jnp.float32))
    p = projected.astype(jnp.float32)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
    f = teacher / (jnp.linalg.norm(teacher, axis=-1, keepdims=True) + 1e-8)

    self_sim = (p * f).sum(-1).mean(-1)  # (B, T)
    total_sim = self_sim
    num_frames = int(self_sim.shape[1])
    weight_sum = jnp.ones_like(total_sim) if settings.normalize_neighbour_sum else None
    d = min(settings.distance, num_frames - 1)
    tau = max(settings.tau, 1e-8)
    offsets = range(1, d + 1) if settings.cumulative_neighbors else ([d] if d > 0 else [])
    for offset in offsets:
        weight = math.exp(-float(offset) / tau)
        fwd = (p[:, :-offset] * f[:, offset:]).sum(-1).mean(-1)
        back = (p[:, offset:] * f[:, :-offset]).sum(-1).mean(-1)
        total_sim = total_sim.at[:, :-offset].add(weight * fwd)
        total_sim = total_sim.at[:, offset:].add(weight * back)
        if weight_sum is not None:
            weight_sum = weight_sum.at[:, :-offset].add(weight)
            weight_sum = weight_sum.at[:, offset:].add(weight)
    if weight_sum is not None:
        total_sim = total_sim / jnp.maximum(weight_sum, 1e-12)
    per_video = total_sim.sum(axis=1)
    if settings.normalize_by_frames:
        per_video = per_video / float(num_frames)
    return -per_video.mean(), jax.lax.stop_gradient(total_sim.mean()), jax.lax.stop_gradient(self_sim.mean())


# ---------------------------------------------------------------------------------
# in-loop teacher features (reference _decode_latents_unified + _encode_frames)
# ---------------------------------------------------------------------------------


def encode_teacher_frames(
    teacher_apply,
    decode_fn,
    latents: jax.Array,
    settings: CrepaSettings,
) -> jax.Array:
    """Clean latents -> pixels -> resized+normalized -> ViT patch tokens.

    ``teacher_apply(images_bhwc) -> (B', N, D)``; ``decode_fn(latents) ->
    (B,H,W,3) in [-1,1]`` (or (B,T,H,W,3) for video)."""
    pixels = decode_fn(latents)
    pixels = jnp.clip(pixels, -1.0, 1.0) * 0.5 + 0.5  # [0, 1]
    if pixels.ndim == 4:
        pixels = pixels[:, None]  # (B, 1, H, W, 3)
    b, t, h, w, c = pixels.shape
    size = settings.encoder_image_size
    frames = pixels.reshape(b * t, h, w, c)
    frames = jax.image.resize(frames, (b * t, size, size, c), method="bilinear")
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    frames = (frames.astype(jnp.float32) - mean) / std
    tokens = teacher_apply(frames)  # (B*T, N, D)
    return tokens.reshape(b, t, tokens.shape[1], tokens.shape[2])


def self_flow_mask(rng: jax.Array, latents: jax.Array, mask_ratio: float) -> jax.Array:
    """Token-mask the teacher's input latents (reference self-flow masking:
    the EMA teacher sees a masked view so the student aligns to robust
    features).  Masks whole spatial positions with probability mask_ratio."""
    if mask_ratio <= 0:
        return latents
    shape = latents.shape[:-1] + (1,)
    keep = jax.random.bernoulli(rng, 1.0 - mask_ratio, shape)
    return latents * keep.astype(latents.dtype)


# ---------------------------------------------------------------------------------
# loss-term assembly (called from ModelFoundation.loss_fn)
# ---------------------------------------------------------------------------------


def crepa_loss_term(
    model,
    settings: CrepaSettings,
    variables: Dict[str, Any],
    intermediates: Dict[str, Any],
    prepared: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The weighted CREPA term + log scalars (reference CrepaRegularizer.
    compute_loss + the trainer's scheduler/cutoff plumbing)."""
    from .repa import _flat_hiddens

    hiddens = _flat_hiddens(intermediates)
    if not hiddens:
        raise ValueError("crepa_enabled but the model sowed no hidden states")
    hidden = hiddens[settings.block_index % len(hiddens)][1]
    if hidden.ndim == 4 and hidden.shape[0] == 1:  # sow stacking
        hidden = hidden[0]
    latents = prepared["latents"]
    num_frames = int(latents.shape[1]) if latents.ndim == 5 else None
    hidden4 = to_btnd(hidden, settings.mode, num_frames)

    if "crepa_params" not in variables:
        raise ValueError("crepa_enabled but no crepa_params projector in the train state")
    projected = apply_projector(variables["crepa_params"], hidden4)

    if settings.feature_source == "backbone":
        if settings.teacher_block_index is None:
            raise ValueError("crepa_use_backbone_features requires crepa_teacher_block_index")
        teacher = hiddens[settings.teacher_block_index % len(hiddens)][1]
        if teacher.ndim == 4 and teacher.shape[0] == 1:
            teacher = teacher[0]
        teacher = to_btnd(teacher, settings.mode, num_frames)
    elif settings.feature_source == "self_flow":
        ema_overlay = prepared.get("crepa_ema_trainable")
        if ema_overlay is None:
            raise ValueError("crepa_self_flow requires the EMA overlay in the batch")
        teacher_vars = {**variables, **jax.lax.stop_gradient(ema_overlay)}
        teacher_prepared = dict(prepared)
        teacher_prepared.pop("crepa_ema_trainable", None)
        teacher_prepared["noisy_latents"] = self_flow_mask(
            jax.random.fold_in(rng, 0xCE), prepared["noisy_latents"],
            settings.self_flow_mask_ratio,
        )
        _, teacher_inter = model.model_predict_with_intermediates(teacher_vars, teacher_prepared)
        teacher_hiddens = _flat_hiddens(teacher_inter)
        teacher = teacher_hiddens[settings.teacher_block_index % len(teacher_hiddens)][1]
        if teacher.ndim == 4 and teacher.shape[0] == 1:
            teacher = teacher[0]
        teacher = jax.lax.stop_gradient(to_btnd(teacher, settings.mode, num_frames))
    else:  # encoder (in-loop vision teacher over decoded clean latents)
        teacher_module = getattr(model, "_crepa_teacher_module", None)
        decode_fn = getattr(model, "_crepa_decode_fn", None)
        if teacher_module is None or "crepa_teacher" not in variables or decode_fn is None:
            raise ValueError(
                "crepa feature_source=encoder needs the vision teacher and a "
                "latent decoder attached (trainer init_crepa)"
            )
        teacher_params = variables["crepa_teacher"]

        def teacher_apply(images):
            return teacher_module.apply({"params": teacher_params}, images)

        teacher = encode_teacher_frames(
            teacher_apply,
            lambda z: decode_fn(variables, z),
            prepared["latents"],
            settings,
        )

    projected, teacher = align_shapes(projected, teacher, settings)
    neg_sim, align_score, self_sim = alignment_loss(projected, teacher, settings)
    weight = scheduled_weight(settings, jnp.asarray(prepared.get("global_step", 0)))
    cutoff = prepared.get("crepa_cutoff")
    if cutoff is not None:
        weight = weight * (1.0 - cutoff.astype(jnp.float32))
    term = weight * neg_sim
    logs = {
        "crepa_loss": jax.lax.stop_gradient(term),
        "crepa_alignment_score": align_score,
        "crepa_similarity_self": self_sim,
        "crepa_weight": jax.lax.stop_gradient(weight),
    }
    return term, logs
