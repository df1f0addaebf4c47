"""Jit-compiled sampling loops.

The reference samples validation images by calling diffusers pipelines step by
step in Python (helpers/training/validation.py:2872 setup_pipeline → pipeline
__call__).  On TPU a Python loop would re-dispatch every step; instead the whole
denoise loop is one ``lax.fori_loop`` inside a single jitted program, so N-step
sampling costs one compile + one device program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def classifier_free_guidance(
    cond: jax.Array,
    uncond: jax.Array,
    scale: float,
    rescale: float = 0.0,
) -> jax.Array:
    """CFG with optional rescaling (reference --validation_guidance_rescale;
    Lin et al. "Common Diffusion Noise Schedules and Sample Steps are Flawed"
    eq. 15-16: renormalize the guided prediction's per-sample std toward the
    conditional prediction's to curb overexposure)."""
    guided = uncond + scale * (cond - uncond)
    if not rescale:
        return guided
    axes = tuple(range(1, guided.ndim))
    std_cond = jnp.std(cond, axis=axes, keepdims=True)
    std_guided = jnp.maximum(jnp.std(guided, axis=axes, keepdims=True), 1e-8)
    renorm = guided * (std_cond / std_guided)
    return rescale * renorm + (1.0 - rescale) * guided


def sample_loop(
    scheduler,
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
    collect_intermediates: bool = False,
    init_latents: jax.Array = None,
    strength: float = 1.0,
    start_step: int = 0,
    stop_step: Optional[int] = None,
    start_latents: jax.Array = None,
) -> jax.Array:
    """Run the (possibly partial) denoise loop.

    ``denoise_fn(latents, timestep) -> model_pred`` must already close over
    params/conditioning (and CFG if wanted).  Works with any scheduler exposing
    ``timestep(i)`` + ``step(i, latents, pred)``; schedulers with internal state
    (UniPC) expose ``init_state``/``step_with_state`` and are handled too.

    ``start_step``/``stop_step``/``start_latents`` run a slice of the ladder
    for multi-stage pipelines (reference SDXL base/refiner denoising_end /
    denoising_start split, sdxl/model.py:525): ``start_latents`` are latents
    already at ``start_step``'s noise level (a previous stage's output), NOT
    a clean image — use ``init_latents``+``strength`` for img2img.

    With ``collect_intermediates`` the per-step latents come back stacked
    (num_steps, ...) alongside the final latents — the TAE-preview hook
    (reference ValidationPreviewer, validation.py:1633) decodes them cheaply.
    """
    start = start_step
    stop = scheduler.num_steps if stop_step is None else min(stop_step, scheduler.num_steps)
    if start_latents is not None:
        latents0 = start_latents
    elif init_latents is not None and strength < 1.0:
        # img2img (reference img2img pipelines): skip the first (1−strength)·N
        # steps and enter the ladder from the reference image noised to that
        # step's noise level
        start = min(int(scheduler.num_steps * (1.0 - strength)), scheduler.num_steps - 1)
        latents0 = scheduler.add_noise(init_latents.astype(jnp.float32), noise, start)
    else:
        latents0 = scheduler.init_latents(noise)
    stateful = hasattr(scheduler, "step_with_state")

    if stateful:
        def scan_body(carry, i):
            latents, state = carry
            pred = denoise_fn(latents, scheduler.timestep(i))
            new_latents, new_state = scheduler.step_with_state(i, latents, pred, state)
            return (new_latents, new_state), (new_latents if collect_intermediates else None)

        (latents, _), collected = jax.lax.scan(
            scan_body,
            (latents0, scheduler.init_state(noise)),
            jnp.arange(start, stop),
        )
        return (latents, collected) if collect_intermediates else latents

    def scan_body(latents, i):
        pred = denoise_fn(latents, scheduler.timestep(i))
        new_latents = scheduler.step(i, latents, pred)
        return new_latents, (new_latents if collect_intermediates else None)

    latents, collected = jax.lax.scan(
        scan_body, latents0, jnp.arange(start, stop)
    )
    return (latents, collected) if collect_intermediates else latents
