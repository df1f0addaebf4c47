"""Validation: render sample images from the in-training model.

Reference: helpers/training/validation.py:1839 ``Validation`` /
``run_validations`` :2458 — per-interval prompt rendering via a diffusers
pipeline, benchmark stitching, tracker/webhook upload.  TPU-shape: the whole
denoise loop is one jitted program (schedulers/sampling.py); prompt embeds are
computed once up front (before text encoders unload) and reused every run.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..schedulers import DDIMScheduler, FlowMatchEulerScheduler, UniPCScheduler, sample_loop
from ..training.losses import DDPMScheduleConfig
from ..webhooks.events import validation_event

logger = logging.getLogger(__name__)

# default validation prompts used by --validation_prompt_library when no user
# library file is configured (reference: simpletuner's built-in prompt library)
BUILTIN_PROMPT_LIBRARY: Dict[str, str] = {
    "woman": "a woman, hanging out on the beach",
    "man": "a man playing guitar in a park",
    "child": "a child flying a kite on a sunny day",
    "animal": "a golden retriever running through a field",
    "landscape": "an alpine lake at sunrise, mist over the water",
    "architecture": "a futuristic city skyline at night, neon reflections",
    "still_life": "a bowl of fruit on a wooden table, soft window light",
    "abstract": "colorful abstract shapes, flowing gradients",
}


def build_scheduler(model, num_steps: int, image_seq_len: Optional[int] = None):
    """Per-family inference scheduler (reference validation.py:2778 setup_scheduler)."""
    if model.is_flow:
        shift = getattr(model.config, "validation_noise_scheduler_shift", None)
        use_dyn = bool(getattr(model.config, "flow_schedule_auto_shift", False))
        return FlowMatchEulerScheduler.create(
            num_steps,
            shift=shift if shift is not None else 3.0,
            use_dynamic_shifting=use_dyn,
            image_seq_len=image_seq_len,
        )
    if model.prediction_type == "sample" and hasattr(model, "sigma_max"):
        # EDM x0-prediction family (cosmos): Karras-ρ Euler ladder
        # (reference cosmos/model.py:80-84 sigma_min/max + schedule order 7)
        from ..schedulers import EDMEulerScheduler

        return EDMEulerScheduler.create(
            num_steps,
            sigma_min=float(getattr(model, "sigma_min", 0.002)),
            sigma_max=float(getattr(model, "sigma_max", 80.0)),
            rho=float(getattr(model, "sigma_schedule_order", 7.0)),
        )
    name = (getattr(model.config, "validation_noise_scheduler", None) or "ddim").lower()
    # the FAMILY's beta ladder, not the SD default (DeepFloyd is
    # squaredcos_cap_v2; reference pipelines ship per-repo scheduler configs)
    import dataclasses as _dc

    schedule = _dc.replace(
        model.ddpm_schedule_config(),
        rescale_betas_zero_snr=bool(getattr(model.config, "rescale_betas_zero_snr", False)),
    )
    if name == "unipc":
        return UniPCScheduler.create_ddpm(num_steps, schedule, model.prediction_type)
    return DDIMScheduler.create(num_steps, schedule, model.prediction_type)


class Validation:
    def __init__(
        self,
        model,
        config,
        decode_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        output_dir: str = "output",
        trackers: Optional[List] = None,
        webhook_handler=None,
        init_latents_fn: Optional[Callable[[], Optional[np.ndarray]]] = None,
        mesh=None,
    ):
        # mesh enables parallel validation (reference validation.py:2038-2061
        # context-parallel validation): prompts batch together and the batch
        # dim shards over (data, fsdp); the context axis shards each image's
        # attention sequence automatically through the global CP dispatch
        self.mesh = mesh
        # img2img validation (reference validation.py:2891 — IMG2IMG pipeline
        # when validation_using_datasets): init latents come from the data
        # plane, denoising starts at validation_strength
        self.init_latents_fn = init_latents_fn
        self.strength = float(getattr(config, "validation_strength", 0.2) or 0.2)
        self.img2img = bool(getattr(config, "validation_using_datasets", False))
        self.model = model
        self.config = config
        self.decode_fn = decode_fn
        self.output_dir = output_dir
        self.trackers = trackers or []
        self.webhook_handler = webhook_handler
        self.prompts: List[str] = []
        self._embeds: List[Dict[str, np.ndarray]] = []
        self._sample_jit = None

        # Tiny-AutoEncoder preview decoder (reference ValidationPreviewer,
        # validation.py:1633): cheap streamed previews during sampling.  When
        # no taesd weights are configured the full VAE decode is used instead.
        self.preview_interval = max(1, int(getattr(config, "validation_preview_steps", 1) or 1))
        self._tae_decode = None
        tae_path = getattr(config, "validation_preview_tae_path", None)
        if getattr(config, "validation_preview", False) and tae_path:
            try:
                from ..models.tae import TAEConfig, TAEDecoder, load_taesd_decoder

                channels = int(getattr(model, "latent_channels", 4))
                tae_cfg = TAEConfig.taef1() if channels == 16 else TAEConfig.taesd()
                tae_params = load_taesd_decoder(tae_cfg, str(tae_path))
                decoder = TAEDecoder(tae_cfg)
                self._tae_decode = lambda z: decoder.apply(tae_params, z) * 2.0 - 1.0
            except Exception as exc:  # missing/bad weights: fall back to the VAE
                import logging

                logging.getLogger(__name__).warning(
                    "validation_preview_tae_path %s unusable (%s); previews use the full VAE",
                    tae_path, exc,
                )

        raw = getattr(config, "validation_prompt", None)
        if raw:
            self.prompts = [raw] if isinstance(raw, str) else list(raw)
        library = getattr(config, "user_prompt_library", None)
        if library and os.path.exists(str(library)):
            import json

            with open(library) as handle:
                self.prompts.extend(json.load(handle).values())
        elif getattr(config, "validation_prompt_library", False):
            # --validation_prompt_library without a user file: the built-in
            # library (reference ships a default prompt set for this flag)
            self.prompts.extend(BUILTIN_PROMPT_LIBRARY.values())

        # assistant-LoRA reweighting for inference (reference
        # configure_assistant_lora_for_inference, common.py:722-760: the
        # frozen assistant trains at --assistant_lora_strength but renders at
        # --assistant_lora_inference_strength, default 0 = unmerged)
        self._assistant: Optional[tuple] = None

        self.num_steps = int(getattr(config, "validation_num_inference_steps", 20) or 20)
        if getattr(config, "twinflow_enabled", False):
            # TwinFlow validates at its few-step target (reference
            # validation.py:2789: twinflow_target_step_count drives the UCGM
            # scheduler's generation step count, default 1)
            self.num_steps = max(1, int(getattr(config, "twinflow_target_step_count", 1) or 1))
        raw_res = getattr(config, "validation_resolution", None) or getattr(config, "resolution", 512) or 512
        if isinstance(raw_res, str) and "x" in raw_res:  # reference "WxH" format
            raw_res = raw_res.split("x")[0]
        self.resolution = int(float(raw_res))
        self.interval = getattr(config, "validation_steps", None)
        self.seed = int(getattr(config, "validation_seed", None) or getattr(config, "seed", 42) or 42)
        self.disabled = bool(getattr(config, "validation_disable", False)) or not self.prompts

    # ---- embed prep (must run while text encoders are alive) ------------------------------
    def precompute_embeds(self) -> None:
        if self.disabled:
            return
        try:
            self._embeds = self.model.encode_text(self.prompts)
            # negative embeds for CFG (reference: validation negative embeds
            # cached up front, text_embeds.py:323-349)
            if self._wants_cfg():
                negative = str(getattr(self.config, "validation_negative_prompt", "") or "")
                self._negative_embeds = self.model.encode_text([negative])[0]
        except Exception as exc:
            logger.warning("validation embed precompute failed (%s); disabling validation", exc)
            self.disabled = True

    def _cfg_params(self, scheduler):
        """(rescale, no-cfg t-threshold) for the guided denoise closures
        (reference --validation_guidance_rescale /
        --validation_no_cfg_until_timestep)."""
        rescale = float(getattr(self.config, "validation_guidance_rescale", 0.0) or 0.0)
        until = int(getattr(self.config, "validation_no_cfg_until_timestep", 0) or 0)
        no_cfg_t = scheduler.timestep(min(until, scheduler.num_steps - 1)) if until > 0 else None
        return rescale, no_cfg_t

    def _slg_params(self, scheduler):
        """Skip-layer guidance window (reference validation.py:4469 SD3.5
        skip_guidance_layers): (layers, scale, t_enter, t_exit) or None.
        The window is a step-index fraction [start, stop); t descends during
        sampling so step i >= start·N maps to t <= timestep(start·N)."""
        layers = getattr(self.config, "validation_guidance_skip_layers", None)
        if not layers:
            return None
        if isinstance(layers, (int, float, str)):
            layers = [int(float(layers))]
        if not hasattr(self.model, "denoise_fn_skip_layers"):
            raise ValueError(
                f"validation_guidance_skip_layers is not supported for "
                f"model_family={self.model.NAME!r} (sd3 only)"
            )
        start = float(getattr(self.config, "validation_guidance_skip_layers_start", 0.01) or 0.01)
        stop = float(getattr(self.config, "validation_guidance_skip_layers_stop", 0.2) or 0.2)
        scale = float(getattr(self.config, "validation_guidance_skip_scale", 2.8) or 2.8)
        n = scheduler.num_steps
        t_enter = scheduler.timestep(min(int(start * n), n - 1))
        t_exit = scheduler.timestep(min(int(stop * n), n - 1))
        return tuple(int(i) for i in layers), scale, t_enter, t_exit

    def _wants_cfg(self) -> bool:
        """True CFG (two forward passes) for families without guidance embeds."""
        guidance = float(getattr(self.config, "validation_guidance", 0.0) or 0.0)
        has_guidance_embed = bool(getattr(getattr(self.model, "arch", None), "guidance_embed", False))
        return guidance > 1.0 and not has_guidance_embed

    # ---- scheduling ------------------------------------------------------------------------
    def would_validate(self, step: int, force: bool = False) -> bool:
        if self.disabled:
            return False
        if force:
            return True
        return bool(self.interval) and step > 0 and step % int(self.interval) == 0

    # ---- benchmark (base-model renders for stitching; reference
    # init_benchmark_base_model + stitching at validation.py:2219) ---------------------------
    def run_benchmark(self, base_variables) -> None:
        if self.disabled or getattr(self.model, "MODALITY", "image") != "image":
            return
        self._benchmark_images = []
        for index, embeds in enumerate(self._embeds):
            image = self._render(base_variables, embeds, index)
            path = os.path.join(self.output_dir, "benchmark", f"base_{index}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            self._save_png(image, path)
            self._benchmark_images.append(image)

    def _stitch(self, base: np.ndarray, current: np.ndarray) -> np.ndarray:
        height = min(base.shape[0], current.shape[0])
        return np.concatenate([base[:height], current[:height]], axis=1)

    # ---- run -------------------------------------------------------------------------------
    def _latent_shape(self, batch_size: int):
        channels = self.model.latent_channels
        if getattr(self.model, "MODALITY", "image") == "audio":
            vae_cfg = self.model.audio_vae_config()
            seconds = float(getattr(self.config, "validation_audio_duration", 5.0) or 5.0)
            sample_rate = int(getattr(self.config, "validation_audio_sample_rate", 44100) or 44100)
            length = max(int(seconds * sample_rate) // vae_cfg.compression, 8)
            return (batch_size, length, channels)
        if getattr(self.model, "MODALITY", "image") == "video":
            vae_cfg = self.model.video_vae_config()
            size = self.resolution // vae_cfg.spatial_factor
            frames = int(getattr(self.config, "validation_num_video_frames", 9) or 9)
            latent_frames = (frames - 1) // vae_cfg.temporal_factor + 1
            return (batch_size, latent_frames, size, size, channels)
        factor = 8 if getattr(self.model, "REQUIRES_VAE", True) else 1
        size = self.resolution // factor
        return (batch_size, size, size, channels)

    def run_validations(self, variables, step: int, force: bool = False,
                        slug: str = "") -> List[str]:
        """Render every prompt; returns saved file paths.  ``slug`` suffixes
        filenames (e.g. "_ema" for the EMA comparison pass)."""
        if not self.would_validate(step, force):
            return []
        method = (
            str(getattr(self.config, "validation_method", None) or "simpletuner-local")
            .strip().lower().replace("_", "-")
        )
        if method == "external-script":
            self._run_external_validation(step)
            return []
        if method != "simpletuner-local":
            raise ValueError(
                f"unsupported validation_method {method!r}; expected "
                "simpletuner-local or external-script"
            )
        variables = self._reweight_assistant(variables)
        paths: List[str] = []
        for adapter_slug, run_variables in self._adapter_runs(variables):
            paths.extend(self._run_one_pass(run_variables, step, slug + adapter_slug))
        return paths

    def set_assistant(self, delta, train_strength: float) -> None:
        """Record the merged assistant adapter so renders can reweight it."""
        self._assistant = (delta, float(train_strength))

    def _reweight_assistant(self, variables):
        """Shift the assistant adapter from its training strength to
        --assistant_lora_inference_strength (default 0: validation renders the
        bare student, reference common.py:734).  Quantized bases go through
        dequant -> add -> requant per touched kernel."""
        if self._assistant is None:
            return variables
        delta, train_strength = self._assistant
        raw = getattr(self.config, "assistant_lora_inference_strength", None)
        inference_strength = float(raw if raw is not None else 0.0)
        if inference_strength == train_strength:
            return variables
        from .lora import merge_lora_into_variables

        return merge_lora_into_variables(
            variables, delta, scale=inference_strength - train_strength
        )

    def _run_external_validation(self, step: int) -> bool:
        """Shell out to a user validation script (reference validation.py:1935
        validation_method=external-script with {placeholder} substitution)."""
        import subprocess

        template = getattr(self.config, "validation_external_script", None)
        if not template:
            raise ValueError(
                "validation_method=external-script requires validation_external_script"
            )

        def resolve(name: str) -> str:
            if name == "local_checkpoint_path":
                checkpoints = sorted(
                    (d for d in os.listdir(self.output_dir) if d.startswith("checkpoint-")),
                    key=lambda d: int(d.split("-")[-1]),
                )
                if not checkpoints:
                    raise FileNotFoundError("no checkpoints exist yet in output_dir")
                return os.path.join(self.output_dir, checkpoints[-1])
            if name == "global_step":
                return str(step)
            return str(getattr(self.config, name, "") or "")

        import re as _re

        background = bool(getattr(self.config, "validation_external_background", False))
        try:
            command = _re.sub(r"\{(\w+)\}", lambda m: resolve(m.group(1)), str(template))
            logger.info("running external validation: %s", command)
            if background:
                subprocess.Popen(command, shell=True)
            else:
                subprocess.run(command, shell=True, check=True, timeout=3600)
            return True
        except FileNotFoundError as exc:
            logger.warning("external validation skipped: %s", exc)
            return False
        except subprocess.SubprocessError as exc:
            logger.warning("external validation failed: %s", exc)
            return False

    def _adapter_runs(self, variables):
        """Validation adapter sweeps (reference validation_adapters.py):
        render with the live weights plus one pass per configured external
        adapter merged into the base params at its strength."""
        runs = [("", variables)]
        specs = getattr(self.config, "validation_adapters", None) or []
        if isinstance(specs, (str, dict)):
            specs = [specs]
        specs = list(specs)
        single = getattr(self.config, "validation_adapter_path", None)
        if single:
            # reference --validation_adapter_path/_strength/_name: one extra
            # adapter without the full sweep-list syntax
            specs.append({
                "path": str(single),
                "strength": float(getattr(self.config, "validation_adapter_strength", 1.0) or 1.0),
                "label": getattr(self.config, "validation_adapter_name", None),
            })
        mode = (getattr(self.config, "validation_adapter_mode", None) or "comparison").lower()
        if specs and mode == "adapter_only":
            runs = []
        for spec in specs:
            if isinstance(spec, str):
                spec = {"path": spec}
            path = spec.get("path")
            strength = float(spec.get("strength", 1.0))
            label = spec.get("label") or os.path.splitext(os.path.basename(str(path)))[0]
            try:
                from .lora import load_lora_safetensors, merge_lora_into_params

                template = variables.get("lora")
                loaded = load_lora_safetensors(self.model, str(path), template)
                merged = dict(variables)
                merged["params"] = merge_lora_into_params(variables["params"], loaded, strength)
                runs.append((f"_{label}", merged))
            except Exception as exc:
                logger.warning("validation adapter %r failed to load: %s", path, exc)
        return runs

    def _parallel_eligible(self) -> bool:
        """Batched multi-prompt rendering requires uniform embed shapes and a
        plain single-stage text2img pass; anything else falls back to the
        sequential path (logged, never silently different math)."""
        if not bool(getattr(self.config, "validation_parallel", False)):
            return False
        if len(self.prompts) < 2 or self.img2img:
            return False
        if getattr(self.config, "validation_guidance_skip_layers", None):
            logger.info("validation_parallel disabled: skip-layer guidance is per-prompt")
            return False
        if bool(getattr(self.config, "validation_preview", False)):
            logger.info("validation_parallel disabled: preview streaming is per-prompt")
            return False
        supports = getattr(self.model, "supports_multistage_validation", None)
        if callable(supports) and supports():
            logger.info("validation_parallel disabled: multistage validation is sequential")
            return False
        shapes = [
            {k: v.shape for k, v in embeds.items() if hasattr(v, "shape")}
            for embeds in self._embeds
        ]
        if any(s != shapes[0] for s in shapes[1:]):
            logger.info(
                "validation_parallel disabled: prompt embeds have non-uniform "
                "shapes (padding them would change results vs the sequential path)"
            )
            return False
        return True

    def _render_batch(self, variables) -> List[np.ndarray]:
        """One jitted pass over all prompts; batch sharded over (data, fsdp)
        when a mesh is attached, attention sequence over ``context`` via the
        global CP dispatch.  Per-prompt noise matches the sequential path
        (fold_in by prompt index) so results are seed-identical."""
        from ..parallel.mesh import batch_sharding

        n = len(self.prompts)
        shards = 1
        if self.mesh is not None:
            shards = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        batch = -(-n // shards) * shards  # pad to a multiple of the batch shards
        latent_shape = self._latent_shape(batch)
        if len(latent_shape) == 5:
            seq_len = latent_shape[1] * (latent_shape[2] // 2) * (latent_shape[3] // 2)
        else:
            seq_len = (latent_shape[1] // 2) * (latent_shape[2] // 2)
        scheduler = build_scheduler(self.model, self.num_steps, image_seq_len=seq_len)

        def stack(embeds_list, key):
            return jnp.stack([jnp.asarray(e[key]) for e in embeds_list])

        pick = list(range(n)) + [n - 1] * (batch - n)  # pad by repeating the last prompt
        embeds_list = [self._embeds[i] for i in pick]
        batch_dict = {"latents": jnp.zeros(latent_shape, jnp.float32)}
        for key, value in self._embeds[0].items():
            if hasattr(value, "shape"):
                batch_dict[key] = stack(embeds_list, key)
        cond = self.model.inference_conditioning(batch_dict)

        uncond = None
        if self._wants_cfg() and getattr(self, "_negative_embeds", None) is not None:
            neg = {"latents": batch_dict["latents"]}
            for key, value in self._negative_embeds.items():
                if hasattr(value, "shape"):
                    neg[key] = jnp.broadcast_to(
                        jnp.asarray(value)[None], (batch,) + value.shape
                    )
            uncond = self.model.inference_conditioning(neg)
        guidance_scale = float(getattr(self.config, "validation_guidance", 0.0) or 0.0)

        key = jax.random.PRNGKey(self.seed)
        noise = jnp.stack(
            [jax.random.normal(jax.random.fold_in(key, i), latent_shape[1:], jnp.float32)
             for i in pick]
        )
        if self.mesh is not None:
            noise = jax.device_put(noise, batch_sharding(self.mesh))

        model = self.model
        decode = self.decode_fn
        cfg_rescale, no_cfg_t = self._cfg_params(scheduler)

        def sample(variables, cond, uncond, noise):
            if uncond is not None:
                from ..schedulers import classifier_free_guidance

                cond_fn = model.denoise_fn(variables, cond)
                uncond_fn = model.denoise_fn(variables, uncond)

                def denoise(latents, t):
                    scale = guidance_scale
                    if no_cfg_t is not None:
                        # CFG off for the first N steps (t descends during
                        # sampling; reference --validation_no_cfg_until_timestep)
                        scale = jnp.where(t > no_cfg_t, 1.0, guidance_scale)
                    return classifier_free_guidance(
                        cond_fn(latents, t), uncond_fn(latents, t), scale,
                        rescale=cfg_rescale,
                    )
            else:
                denoise = model.denoise_fn(variables, cond)
            latents = sample_loop(scheduler, denoise, noise)
            if decode is None:
                return latents
            scaling = model.VAE_SCALING_FACTOR or 1.0
            shift = model.VAE_SHIFT_FACTOR or 0.0
            return decode(latents / scaling + shift)

        out = np.asarray(jax.jit(sample)(variables, cond, uncond, noise))
        return [out[i] for i in range(n)]

    def _run_one_pass(self, variables, step: int, slug: str = "") -> List[str]:
        paths = []
        images = []
        is_audio = getattr(self.model, "MODALITY", "image") == "audio"
        batched = self._render_batch(variables) if self._parallel_eligible() else None
        num_images = max(1, int(getattr(self.config, "num_validation_images", 1) or 1))
        for index, (prompt, embeds) in enumerate(zip(self.prompts, self._embeds)):
            # extra per-prompt variants (reference --num_validation_images):
            # distinct noise via a disjoint fold_in index space
            for variant in range(1, num_images):
                extra = self._render(variables, embeds, index + 7919 * variant)
                self._save_variant(extra, step, index, variant, slug)
            image = batched[index] if batched is not None else self._render(variables, embeds, index)
            is_video = image.ndim == 4
            ext = "wav" if is_audio else ("mp4" if is_video else "png")
            filename = os.path.join(
                self.output_dir, "validation", f"step_{step}_{index}{slug}.{ext}"
            )
            os.makedirs(os.path.dirname(filename), exist_ok=True)
            if is_audio:
                self._save_wav(image, filename, int(getattr(self.config, "validation_audio_sample_rate", 44100) or 44100))
                continue
            if is_video:
                self._save_video(image, filename)
                image = image[image.shape[0] // 2]  # middle frame for trackers
            else:
                self._save_png(image, filename)
                benchmarks = getattr(self, "_benchmark_images", None)
                if benchmarks and index < len(benchmarks):
                    stitched = self._stitch(benchmarks[index], image)
                    self._save_png(
                        stitched,
                        os.path.join(
                            self.output_dir, "validation", f"step_{step}_{index}_vs_base.png"
                        ),
                    )
            paths.append(filename)
            images.append(image)
            if self.webhook_handler is not None:
                self.webhook_handler.send_raw(validation_event(step, prompt, filename))
        for tracker in self.trackers:
            try:
                tracker.log_images(images, self.prompts, step)
            except Exception as exc:
                logger.debug("tracker image log failed: %s", exc)
        return paths

    def _save_variant(self, image: np.ndarray, step: int, index: int,
                      variant: int, slug: str = "") -> None:
        is_audio = getattr(self.model, "MODALITY", "image") == "audio"
        is_video = image.ndim == 4
        ext = "wav" if is_audio else ("mp4" if is_video else "png")
        filename = os.path.join(
            self.output_dir, "validation", f"step_{step}_{index}_v{variant}{slug}.{ext}")
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        if is_audio:
            self._save_wav(image, filename, int(getattr(
                self.config, "validation_audio_sample_rate", 44100) or 44100))
        elif is_video:
            self._save_video(image, filename)
        else:
            self._save_png(image, filename)

    def _render(self, variables, embeds: Dict[str, np.ndarray], index: int) -> np.ndarray:
        # family-custom multistage chain (DeepFloyd IF: image-space handoff
        # with an SR stage, unlike the shared-ladder split below) — the model
        # owns the whole render and returns the final uint8 image, or None to
        # fall through (reference deepfloyd/model.py:244 run_multistage_validation)
        custom_fn = getattr(self.model, "validation_multistage_render", None)
        if callable(custom_fn):
            image = custom_fn(self, variables, embeds, index)
            if image is not None:
                return image
        plan_fn = getattr(self.model, "validation_stage_plan", None)
        if callable(plan_fn):
            plan = plan_fn(variables)
            if plan:
                return self._render_staged(plan, embeds, index)
        supports = getattr(self.model, "supports_multistage_validation", None)
        if callable(supports) and supports() and len(self._latent_shape(1)) == 5:
            return self._render_multistage(variables, embeds, index)
        return self._render_single(variables, embeds, index)

    def _render_staged(self, plan, embeds: Dict[str, np.ndarray], index: int) -> np.ndarray:
        """Chained split-pipeline sampling (reference sdxl/model.py:525
        run_multistage_validation, pixart/model.py:595): stage k denoises
        steps [b_{k-1}, b_k) of ONE shared ladder with its own (model,
        variables); the handoff is the latent tensor itself — no re-noising,
        exactly diffusers' denoising_end/denoising_start contract."""
        latent_shape = self._latent_shape(1)
        if len(latent_shape) == 5:
            seq_len = latent_shape[1] * (latent_shape[2] // 2) * (latent_shape[3] // 2)
        else:
            seq_len = (latent_shape[1] // 2) * (latent_shape[2] // 2)
        scheduler = build_scheduler(self.model, self.num_steps, image_seq_len=seq_len)
        guidance_scale = float(getattr(self.config, "validation_guidance", 0.0) or 0.0)

        batch = {"latents": jnp.zeros(latent_shape, jnp.float32)}
        for key, value in embeds.items():
            if hasattr(value, "shape"):
                batch[key] = jnp.asarray(value)[None]
        neg_batch = None
        if self._wants_cfg() and getattr(self, "_negative_embeds", None) is not None:
            neg_batch = {"latents": batch["latents"]}
            for key, value in self._negative_embeds.items():
                if hasattr(value, "shape"):
                    neg_batch[key] = jnp.asarray(value)[None]

        noise = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), index), latent_shape, jnp.float32
        )
        latents = scheduler.init_latents(noise)
        boundary = 0
        for stage_index, stage in enumerate(plan):
            stage_model, stage_vars = stage["model"], stage["variables"]
            stop = (
                self.num_steps if stage_index == len(plan) - 1
                else max(boundary + 1, int(round(self.num_steps * float(stage["until"]))))
            )
            # each stage traces under its own trace-time globals (lora
            # targets, int8 mode) — the fixed stage has none
            if hasattr(stage_model, "apply_trace_globals"):
                stage_model.apply_trace_globals()
            cond = stage_model.inference_conditioning(batch)
            uncond = stage_model.inference_conditioning(neg_batch) if neg_batch else None

            def stage_sample(stage_vars, cond, uncond, latents,
                             _m=stage_model, _start=boundary, _stop=stop):
                if uncond is not None:
                    from ..schedulers import classifier_free_guidance

                    cond_fn = _m.denoise_fn(stage_vars, cond)
                    uncond_fn = _m.denoise_fn(stage_vars, uncond)

                    def denoise(z, t):
                        return classifier_free_guidance(
                            cond_fn(z, t), uncond_fn(z, t), guidance_scale
                        )
                else:
                    denoise = _m.denoise_fn(stage_vars, cond)
                return sample_loop(
                    scheduler, denoise, latents,
                    start_step=_start, stop_step=_stop, start_latents=latents,
                )

            latents = jax.jit(stage_sample)(stage_vars, cond, uncond, latents)
            boundary = stop
        if hasattr(self.model, "apply_trace_globals"):
            self.model.apply_trace_globals()
        out = np.asarray(latents)[0]
        if self.decode_fn is not None:
            scaling = self.model.VAE_SCALING_FACTOR or 1.0
            shift = self.model.VAE_SHIFT_FACTOR or 0.0
            out = np.asarray(self.decode_fn(jnp.asarray(out)[None] / scaling + shift))[0]
            out = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return out

    def _render_multistage(self, variables, embeds: Dict[str, np.ndarray], index: int) -> np.ndarray:
        """Two-stage spatial-upscale validation (reference ltxvideo2
        model.py:1026-1089): stage 1 samples at half spatial resolution, the
        latent upsampler doubles it, stage 2 re-noises at
        ``LTX2_STAGE2_SIGMAS[0]`` and denoises over that short ladder."""
        from ..schedulers.flow_euler import FlowMatchEulerScheduler

        full_shape = self._latent_shape(1)
        b, t, h, w, c = full_shape
        stage1_shape = (b, t, max(h // 2, 1), max(w // 2, 1), c)

        batch = {"latents": jnp.zeros(stage1_shape, jnp.float32)}
        for key, value in embeds.items():
            if hasattr(value, "shape"):
                batch[key] = jnp.asarray(value)[None]
        cond = self.model.inference_conditioning(batch)

        seq = stage1_shape[1] * (stage1_shape[2] // 2) * (stage1_shape[3] // 2)
        scheduler1 = build_scheduler(self.model, self.num_steps, image_seq_len=max(seq, 1))
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), index)
        noise1 = jax.random.normal(rng, stage1_shape, jnp.float32)

        @jax.jit
        def stage1(variables, cond, noise):
            return sample_loop(scheduler1, self.model.denoise_fn(variables, cond), noise)

        latents = stage1(variables, cond, noise1)
        upscaled = self.model.spatial_upscale_latents(latents)

        sigma_list = [float(s) for s in self.model.LTX2_STAGE2_SIGMAS]
        sigmas2 = jnp.asarray(sigma_list + [0.0], jnp.float32)
        scheduler2 = FlowMatchEulerScheduler(sigmas=sigmas2, timesteps=sigmas2[:-1])
        noise2 = jax.random.normal(jax.random.fold_in(rng, 1), upscaled.shape, jnp.float32)
        start = (1.0 - sigma_list[0]) * upscaled + sigma_list[0] * noise2

        @jax.jit
        def stage2(variables, cond, start_latents):
            return sample_loop(scheduler2, self.model.denoise_fn(variables, cond), start_latents)

        final = stage2(variables, cond, start)
        out = np.asarray(final)[0]
        if self.decode_fn is not None:
            scaling = self.model.VAE_SCALING_FACTOR or 1.0
            shift = self.model.VAE_SHIFT_FACTOR or 0.0
            out = np.asarray(self.decode_fn(jnp.asarray(out)[None] / scaling + shift))[0]
            out = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return out

    def _render_single(self, variables, embeds: Dict[str, np.ndarray], index: int) -> np.ndarray:
        latent_shape = self._latent_shape(1)
        if len(latent_shape) == 5:  # video: (B, T, H, W, C)
            seq_len = latent_shape[1] * (latent_shape[2] // 2) * (latent_shape[3] // 2)
        else:
            seq_len = (latent_shape[1] // 2) * (latent_shape[2] // 2)
        scheduler = build_scheduler(self.model, self.num_steps, image_seq_len=seq_len)
        batch = {"latents": jnp.zeros(latent_shape, jnp.float32)}
        for key, value in embeds.items():
            if hasattr(value, "shape"):
                batch[key] = jnp.asarray(value)[None]
        cond = self.model.inference_conditioning(batch)

        uncond = None
        if self._wants_cfg() and getattr(self, "_negative_embeds", None) is not None:
            neg_batch = {"latents": batch["latents"]}
            for key, value in self._negative_embeds.items():
                if hasattr(value, "shape"):
                    neg_batch[key] = jnp.asarray(value)[None]
            uncond = self.model.inference_conditioning(neg_batch)
        guidance_scale = float(getattr(self.config, "validation_guidance", 0.0) or 0.0)

        init_latents = None
        if self.img2img and self.init_latents_fn is not None:
            raw_init = self.init_latents_fn()
            if raw_init is not None:
                init_latents = jnp.asarray(raw_init, jnp.float32)[None]
        strength = self.strength if init_latents is not None else 1.0

        preview = bool(getattr(self.config, "validation_preview", False))
        if self._sample_jit is None:
            model = self.model
            decode = self.decode_fn
            tae_decode = self._tae_decode
            preview_interval = self.preview_interval

            cfg_rescale, no_cfg_t = self._cfg_params(scheduler)
            slg = self._slg_params(scheduler)

            def sample(variables, cond, uncond, noise, init_latents=None):
                if uncond is not None:
                    from ..schedulers import classifier_free_guidance

                    cond_fn = model.denoise_fn(variables, cond)
                    uncond_fn = model.denoise_fn(variables, uncond)
                    skip_fn = (
                        model.denoise_fn_skip_layers(variables, cond, slg[0])
                        if slg is not None else None
                    )

                    def denoise(latents, t):
                        scale = guidance_scale
                        if no_cfg_t is not None:
                            scale = jnp.where(t > no_cfg_t, 1.0, guidance_scale)
                        cond_pred = cond_fn(latents, t)
                        guided = classifier_free_guidance(
                            cond_pred, uncond_fn(latents, t), scale,
                            rescale=cfg_rescale,
                        )
                        if skip_fn is not None:
                            # SLG: add skip_scale·(cond − cond_skipped) inside
                            # the [start, stop) step window (t descends)
                            _, slg_scale, t_enter, t_exit = slg
                            window = ((t <= t_enter) & (t > t_exit)).astype(guided.dtype)
                            guided = guided + window * slg_scale * (
                                cond_pred - skip_fn(latents, t)
                            )
                        return guided
                else:
                    denoise = model.denoise_fn(variables, cond)
                result = sample_loop(
                    scheduler, denoise, noise, collect_intermediates=preview,
                    init_latents=init_latents,
                    strength=self.strength if init_latents is not None else 1.0,
                )
                latents, intermediates = result if preview else (result, None)

                def maybe_decode(z):
                    if decode is None:
                        return z
                    scaling = model.VAE_SCALING_FACTOR or 1.0
                    shift = model.VAE_SHIFT_FACTOR or 0.0
                    return decode(z / scaling + shift)

                out = maybe_decode(latents)
                if preview:
                    # streamed preview (reference ValidationPreviewer,
                    # validation.py:1633): every Nth sampling step through the
                    # Tiny AutoEncoder when available, else the full VAE
                    steps = intermediates.shape[0]
                    picks = jnp.arange(0, steps, preview_interval)
                    frames_z = intermediates[picks][:, 0]
                    if tae_decode is not None:
                        frames = tae_decode(frames_z)
                    else:
                        frames = maybe_decode(frames_z)
                    return out, frames, picks
                return out

            self._sample_jit = jax.jit(sample)

        noise = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(self.seed), index), latent_shape, jnp.float32
        )
        result = self._sample_jit(variables, cond, uncond, noise, init_latents)
        if preview:
            out, frames, picks = result
            out = np.asarray(out)[0]
            frames = np.asarray(frames)
            picks = np.asarray(picks)
            decoded = self._tae_decode is not None or self.decode_fn is not None
            if decoded:
                frames = np.clip((frames + 1.0) * 127.5, 0, 255).astype(np.uint8)
            # stream one webhook event per preview step (reference
            # ValidationPreviewer._emit_event)
            if self.webhook_handler is not None and decoded:
                import base64
                import io

                from ..webhooks.events import validation_preview_event

                total = int(picks[-1]) + 1 if len(picks) else 0
                for frame, step_idx in zip(frames, picks):
                    buffer = io.BytesIO()
                    self._save_png(frame, buffer)
                    payload = base64.b64encode(buffer.getvalue()).decode("ascii")
                    self.webhook_handler.send_raw(
                        validation_preview_event(
                            prompt=self.prompts[index] if index < len(self.prompts) else "",
                            sampling_step=int(step_idx),
                            total_steps=total,
                            image_base64=payload,
                        )
                    )
            strip = np.concatenate(list(frames), axis=1)
            path = os.path.join(self.output_dir, "validation", f"preview_{index}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            self._save_png(strip, path)
        else:
            out = np.asarray(result)[0]
        if self.decode_fn is not None and getattr(self.model, "MODALITY", "image") != "audio":
            out = np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return out

    @staticmethod
    def _save_wav(waveform: np.ndarray, path: str, sample_rate: int = 44100) -> None:
        """(S, C) float32 [-1,1] -> 16-bit WAV (reference validation_audio.py)."""
        from scipy.io import wavfile

        clipped = np.clip(waveform, -1.0, 1.0)
        wavfile.write(path, sample_rate, (clipped * 32767).astype(np.int16))

    @staticmethod
    def _save_video(frames: np.ndarray, path: str, fps: int = 8) -> None:
        """(T, H, W, C) uint8 -> mp4 (reference validation_video.py export)."""
        import cv2

        if frames.dtype != np.uint8:
            lo, hi = float(frames.min()), float(frames.max())
            frames = ((frames - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        height, width = frames.shape[1:3]
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
        )
        for frame in frames:
            writer.write(cv2.cvtColor(frame[..., :3], cv2.COLOR_RGB2BGR))
        writer.release()

    @staticmethod
    def _save_png(image: np.ndarray, path: str) -> None:
        from PIL import Image

        if image.dtype != np.uint8:
            lo, hi = float(image.min()), float(image.max())
            image = ((image - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        if image.ndim == 3 and image.shape[-1] not in (1, 3, 4):
            image = image[..., :3]
        Image.fromarray(image).save(path, format="PNG")  # path or file-like buffer
