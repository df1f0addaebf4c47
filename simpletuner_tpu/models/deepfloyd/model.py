"""DeepFloyd IF family (reference: helpers/models/deepfloyd — pixel-space
epsilon UNet (no VAE) with T5-XXL conditioning; stage-1 text-to-image at 64px,
stage-2 4x super-resolution conditioned on the low-res image plus an
aug-noise-level class embedding; SURVEY.md §2.3).

Multi-stage validation mirrors the reference's IF chaining
(reference deepfloyd/model.py:244 run_multistage_validation): stage I renders
at final/4 (floor 64px), stage II re-noises an upscaled copy at a fixed
noise level and denoises the 4x canvas with the low-res conditioning
concatenated on channels, and stage III optionally runs the SD x4 latent
upscaler (reference deepfloyd/model.py:287-309)."""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from ..common import TextEncoderSpec
from ..sd1x.model import SD1x
from ..unet import UNetConfig

logger = logging.getLogger(__name__)


class _StageConfig:
    """Read-through config with per-stage overrides (same shape as
    staged_validation._StageConfig; the fixed stage shares the run config but
    points at its own checkpoint and never carries adapters)."""

    def __init__(self, base: Any, overrides: Dict[str, Any]):
        self._base = base
        self._overrides = dict(overrides)

    def __getattr__(self, name: str):
        if name in ("_base", "_overrides"):
            raise AttributeError(name)
        if name in self._overrides:
            return self._overrides[name]
        return getattr(self._base, name)

    def get(self, name: str, default: Any = None):
        if name in self._overrides:
            return self._overrides[name]
        getter = getattr(self._base, "get", None)
        if callable(getter):
            return getter(name, default)
        return getattr(self._base, name, default)


class DeepFloyd(SD1x):
    NAME = "deepfloyd"
    PREDICTION_TYPE = "epsilon"
    REQUIRES_VAE = False  # pixel space
    # IF scheduler config: squaredcos_cap_v2 betas (hub scheduler_config.json)
    DDPM_BETA_START = 0.0001
    DDPM_BETA_END = 0.02
    DDPM_BETA_SCHEDULE = "squaredcos_cap_v2"
    # T5-XXL encoder: in-step TE training untested for the T5 path; keep the
    # inherited SD1x opt-in off rather than accept-and-maybe-break
    SUPPORTS_TEXT_ENCODER_TRAINING = False
    LATENT_CHANNEL_COUNT = 3
    DEFAULT_RESOLUTION = 64
    DEFAULT_FLAVOUR = "i-m-400m"
    HUGGINGFACE_PATHS = {
        # stage one, text-to-image (reference deepfloyd/model.py:64-68)
        "i-m-400m": "DeepFloyd/IF-I-M-v1.0",
        "i-l-900m": "DeepFloyd/IF-I-L-v1.0",
        "i-xl-4.3b": "DeepFloyd/IF-I-XL-v1.0",
        # stage two, super-resolution (reference deepfloyd/model.py:69-71)
        "ii-m-450m": "DeepFloyd/IF-II-M-v1.0",
        "ii-l-1.2b": "DeepFloyd/IF-II-L-v1.0",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder", max_length=77),
    )
    VAE_SCALING_FACTOR = 1.0

    VALIDATION_PIPELINE_MODES = {"auto", "trained-stage", "full-pipeline"}
    VALIDATION_STAGE3_MODES = {"none", "sd-x4-upscaler"}
    # IFSuperResolutionPipeline default aug level for the upscaled conditioning
    STAGE2_NOISE_LEVEL = 250
    # reference floors stage edges at IF's 64px training resolution
    # (deepfloyd/model.py:222-230); tests shrink this to keep CPU renders tiny
    STAGE_MIN_EDGE = 64

    def __init__(self, config: Any, arch: Optional[UNetConfig] = None):
        stage2 = str(getattr(config, "model_flavour", "") or "").startswith("ii-")
        if arch is None:
            import dataclasses as _dc

            if getattr(config, "model_arch_preset", None) == "tiny":
                arch = _dc.replace(
                    UNetConfig.tiny(),
                    in_channels=6 if stage2 else 3,
                    out_channels=3,
                    class_embed_timestep=stage2,
                )
            else:
                arch = UNetConfig(
                    in_channels=6 if stage2 else 3,
                    out_channels=3,
                    block_out_channels=(64, 128, 256, 512),
                    cross_attention_dim=4096,
                    class_embed_timestep=stage2,
                    # IF places attention only at low resolutions (hub IF-II
                    # config: Resnet blocks up top, SimpleCrossAttn at ≤32px);
                    # attending at the 256px SR input level would be a 65k-token
                    # self-attention per layer
                    cross_attention_blocks=(
                        (False, False, True, True) if stage2 else (True, True, True, False)
                    ),
                )
        super().__init__(config, arch=arch)

    @property
    def latent_channels(self) -> int:
        return 3

    def _current_stage(self) -> int:
        """2 for the SR flavours (reference deepfloyd/model.py:97-98)."""
        return 2 if str(getattr(self.config, "model_flavour", "") or "").startswith("ii-") else 1

    def example_batch(self, batch_size: int = 1, resolution: int = 64):
        import jax.numpy as jnp

        return {
            "latents": jnp.zeros((batch_size, resolution, resolution, 3), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 77, self.arch.cross_attention_dim), jnp.float32),
        }

    def get_model_inputs(self, prepared: Dict[str, Any]) -> Dict[str, Any]:
        import jax.numpy as jnp

        inputs = super().get_model_inputs(prepared)
        if self._current_stage() == 2:
            if "sr_condition" in prepared:
                # inference: channels 3:6 carry the (noised) upscaled stage-1
                # image, class labels carry the aug noise level (diffusers
                # IFSuperResolutionPipeline contract)
                cond = prepared["sr_condition"].astype(inputs["sample"].dtype)
                inputs["sample"] = jnp.concatenate([inputs["sample"], cond], axis=-1)
                inputs["class_labels"] = prepared["aug_level"]
            else:
                # training: the reference duplicates the noisy latents onto the
                # conditioning channels and feeds the denoise timestep as the
                # aug level (reference deepfloyd/model.py:384-395)
                inputs["sample"] = jnp.concatenate(
                    [inputs["sample"], inputs["sample"]], axis=-1
                )
                inputs["class_labels"] = prepared["timesteps"]
        return inputs

    def encode_text(self, prompts):
        (t5,) = self.text_encoders
        out = t5.encode(prompts)
        return [
            {
                "text_embeds": np.asarray(out["last_hidden_state"][i], np.float32),
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    # ---- validation pipeline modes (reference deepfloyd/model.py:100-130) ----------------
    def _validation_mode(self) -> str:
        mode = str(
            getattr(self.config, "deepfloyd_validation_pipeline_mode", None) or "auto"
        ).strip().lower()
        if mode not in self.VALIDATION_PIPELINE_MODES:
            raise ValueError(
                "deepfloyd_validation_pipeline_mode must be one of: "
                + ", ".join(sorted(self.VALIDATION_PIPELINE_MODES))
            )
        if mode == "auto":
            # img2img-style dataset validation keeps the trained stage only
            if getattr(self.config, "validation_using_datasets", False):
                return "trained-stage"
            return "full-pipeline"
        return mode

    def _stage3_mode(self) -> str:
        mode = str(
            getattr(self.config, "deepfloyd_validation_stage3_mode", None) or "none"
        ).strip().lower()
        if mode not in self.VALIDATION_STAGE3_MODES:
            raise ValueError(
                "deepfloyd_validation_stage3_mode must be one of: "
                + ", ".join(sorted(self.VALIDATION_STAGE3_MODES))
            )
        return mode

    def check_user_config(self) -> None:
        super().check_user_config()
        self._validation_mode()
        self._stage3_mode()

    def supports_multistage_validation(self) -> bool:
        return self._validation_mode() == "full-pipeline"

    # ---- fixed stage loading -----------------------------------------------------------
    def _stage_model_path(self, stage: int) -> str:
        field = f"deepfloyd_validation_stage{stage}_model"
        configured = getattr(self.config, field, None)
        if not configured:
            raise ValueError(
                f"{field} must point at a LOCAL diffusers directory for the "
                f"fixed stage-{stage} model (this build cannot download the "
                "reference default from the hub)"
            )
        path = str(configured)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"{field}={path!r} is not a directory; full-pipeline "
                "validation needs the fixed stage checkpoint on disk"
            )
        return path

    def _stage_arch(self, stage: int, path: str) -> UNetConfig:
        cfg_path = os.path.join(path, "unet", "config.json")
        if not os.path.isfile(cfg_path):
            cfg_path = os.path.join(path, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as fh:
                raw = json.load(fh)
            fields = {f.name for f in dataclasses.fields(UNetConfig)}
            if {k for k in raw if not k.startswith("_")} <= fields:
                return UNetConfig(**{
                    k: tuple(v) if isinstance(v, list) else v
                    for k, v in raw.items() if not k.startswith("_")
                })
        base = dataclasses.replace(
            self.arch,
            in_channels=6 if stage == 2 else 3,
            class_embed_timestep=stage == 2,
        )
        return base

    def _load_stage(self, stage: int):
        cache = getattr(self, "_if_stage_cache", None)
        if cache is None:
            cache = {}
            self._if_stage_cache = cache
        if stage in cache:
            return cache[stage]
        path = self._stage_model_path(stage)
        from ..weight_import import load_unet_params

        overrides = {
            "pretrained_model_name_or_path": path,
            "model_type": "full",
            "lora_rank": 0,
            "controlnet": False,
            "model_flavour": "ii-m-450m" if stage == 2 else "i-m-400m",
        }
        stage_model = DeepFloyd(
            _StageConfig(self.config, overrides), arch=self._stage_arch(stage, path)
        )
        weights_path = path
        unet_dir = os.path.join(path, "unet")
        if os.path.isdir(unet_dir):
            weights_path = unet_dir
        variables = {"params": load_unet_params(stage_model, weights_path)}
        self.apply_trace_globals()
        logger.info("loaded fixed IF validation stage %d from %s", stage, path)
        cache[stage] = (stage_model, variables)
        return cache[stage]

    # ---- the custom multi-stage render (validation.py _render hook) --------------------
    def validation_multistage_render(self, validation, variables, embeds, index):
        """Chained IF render (reference run_multistage_validation,
        deepfloyd/model.py:244-309).  Returns a uint8 HWC image, or None to
        fall back to single-stage rendering."""
        if not self.supports_multistage_validation():
            return None
        import jax
        import jax.numpy as jnp

        from ...schedulers import classifier_free_guidance
        from ...schedulers.sampling import sample_loop
        from ...training.validation import build_scheduler

        trained_stage = self._current_stage()

        def stage_pair(stage: int):
            if stage == trained_stage:
                return self, variables
            return self._load_stage(stage)

        def stage_steps(stage: int, default: int) -> int:
            raw = getattr(
                self.config, f"deepfloyd_validation_stage{stage}_num_inference_steps", None
            )
            return max(1, int(raw if raw is not None else default))

        def stage_guidance(stage: int, default: float) -> float:
            raw = getattr(self.config, f"deepfloyd_validation_stage{stage}_guidance", None)
            return float(raw if raw is not None else default)

        # resolution ladder (reference deepfloyd/model.py:222-230)
        requested = int(validation.resolution)
        stage3_scale = 4 if self._stage3_mode() == "sd-x4-upscaler" else 1
        floor = int(self.STAGE_MIN_EDGE)
        stage2_edge = max(floor, requested // stage3_scale)
        stage1_edge = max(floor, stage2_edge // 4)
        stage1_edge = max(8, (stage1_edge // 8) * 8)
        stage2_edge = stage1_edge * 4

        batch = {}
        for key, value in embeds.items():
            if hasattr(value, "shape"):
                batch[key] = jnp.asarray(value)[None]
        neg = getattr(validation, "_negative_embeds", None)
        neg_batch = None
        if neg is not None:
            neg_batch = {
                key: jnp.asarray(value)[None]
                for key, value in neg.items() if hasattr(value, "shape")
            }

        base_guidance = float(getattr(self.config, "validation_guidance", 0.0) or 0.0)
        rng = jax.random.fold_in(jax.random.PRNGKey(validation.seed), index)
        rng1, rng2, rng_aug = jax.random.split(rng, 3)

        def run_stage(stage, shape, noise_rng, extra, steps, guidance):
            stage_model, stage_vars = stage_pair(stage)
            if hasattr(stage_model, "apply_trace_globals"):
                stage_model.apply_trace_globals()
            scheduler = build_scheduler(stage_model, steps)
            cond = dict(stage_model.inference_conditioning({**batch, "latents": jnp.zeros(shape)}))
            cond.update(extra)
            uncond = None
            if neg_batch is not None and guidance > 1.0:
                uncond = dict(
                    stage_model.inference_conditioning({**neg_batch, "latents": jnp.zeros(shape)})
                )
                uncond.update(extra)
            noise = jax.random.normal(noise_rng, shape, jnp.float32)

            def sample(stage_vars, cond, uncond, noise):
                if uncond is not None:
                    cond_fn = stage_model.denoise_fn(stage_vars, cond)
                    uncond_fn = stage_model.denoise_fn(stage_vars, uncond)

                    def denoise(z, t):
                        return classifier_free_guidance(cond_fn(z, t), uncond_fn(z, t), guidance)
                else:
                    denoise = stage_model.denoise_fn(stage_vars, cond)
                return sample_loop(scheduler, denoise, noise)

            out = jax.jit(sample)(stage_vars, cond, uncond, noise)
            return scheduler, out

        # --- stage I: text-to-image at the low edge --------------------------------------
        logger.info("IF validation stage I at %dpx", stage1_edge)
        _, pixels1 = run_stage(
            1, (1, stage1_edge, stage1_edge, 3), rng1, {},
            stage_steps(1, min(validation.num_steps, 30)),
            stage_guidance(1, base_guidance if base_guidance > 1.0 else 7.0),
        )
        pixels1 = jnp.clip(pixels1, -1.0, 1.0)

        # --- stage II: 4x SR with noised low-res conditioning ----------------------------
        logger.info("IF validation stage II at %dpx", stage2_edge)
        upscaled = jax.image.resize(
            pixels1, (1, stage2_edge, stage2_edge, 3), "bilinear"
        )
        noise_level = self.STAGE2_NOISE_LEVEL
        stage2_model, _ = stage_pair(2)
        # aug noising rides the same squaredcos ladder (diffusers
        # image_noising_scheduler in IFSuperResolutionPipeline)
        from ...training.losses import make_alphas_cumprod

        ac = make_alphas_cumprod(stage2_model.ddpm_schedule_config())
        a = ac[noise_level]
        aug_noise = jax.random.normal(rng_aug, upscaled.shape, jnp.float32)
        noised_cond = jnp.sqrt(a) * upscaled + jnp.sqrt(1.0 - a) * aug_noise
        extra2 = {
            "sr_condition": noised_cond,
            "aug_level": jnp.full((1,), noise_level, jnp.float32),
        }
        _, pixels2 = run_stage(
            2, (1, stage2_edge, stage2_edge, 3), rng2, extra2,
            stage_steps(2, validation.num_steps),
            stage_guidance(2, base_guidance if base_guidance > 1.0 else 4.0),
        )
        result = jnp.clip(pixels2, -1.0, 1.0)

        if stage3_scale == 4:
            result = self._run_stage3_upscaler(validation, result, index)

        if hasattr(self, "apply_trace_globals"):
            self.apply_trace_globals()
        out = np.asarray(result)[0]
        return np.clip((out + 1.0) * 127.5, 0, 255).astype(np.uint8)

    # ---- stage III: SD x4 latent upscaler (reference deepfloyd/model.py:287-309) -------
    def _run_stage3_upscaler(self, validation, pixels, index):
        """SD x4 upscaler: SD2-arch UNet (7 input channels: 4 latent + 3
        low-res pixels), noise-level class conditioning, 4x-downscale VAE,
        CLIP text encoder — all loaded from the LOCAL
        ``deepfloyd_validation_stage3_model`` diffusers directory."""
        import jax
        import jax.numpy as jnp

        from ...schedulers import classifier_free_guidance
        from ...schedulers.ddim import DDIMScheduler
        from ...schedulers.sampling import sample_loop
        from ...training.losses import DDPMScheduleConfig, make_alphas_cumprod

        bundle = getattr(self, "_stage3_bundle", None)
        if bundle is None:
            path = self._stage_model_path(3)
            from ..text_encoders import load_text_encoders
            from ..vae import AutoencoderKL, VAEConfig
            from ..vae_import import load_vae_params
            from ..weight_import import load_unet_params

            unet_arch = UNetConfig(
                in_channels=7,
                out_channels=4,
                block_out_channels=(256, 512, 512, 1024),
                cross_attention_dim=1024,
                class_embed_timestep=True,
            )
            arch_from_disk = self._stage_arch(3, path)
            if arch_from_disk.in_channels == 7:
                unet_arch = arch_from_disk
            overrides = {
                "pretrained_model_name_or_path": path,
                "model_type": "full",
                "lora_rank": 0,
                "controlnet": False,
                "model_flavour": "i-m-400m",
            }
            stage_model = DeepFloyd(_StageConfig(self.config, overrides), arch=unet_arch)
            unet_dir = os.path.join(path, "unet")
            unet_path = unet_dir if os.path.isdir(unet_dir) else path
            unet_vars = {"params": load_unet_params(stage_model, unet_path)}
            # x4-upscaler VAE: 4x downscale (channel multipliers (1, 2, 4)),
            # scaling factor 0.08333 (hub vae/config.json)
            vae = AutoencoderKL(
                VAEConfig(
                    latent_channels=4,
                    channel_multipliers=(1, 2, 4),
                    scaling_factor=0.08333,
                )
            )
            vae_params = load_vae_params(vae, os.path.join(path, "vae"))
            spec = TextEncoderSpec(
                name="clip-h", family="clip-l", subfolder="text_encoder", max_length=77
            )
            (te,) = load_text_encoders([spec], pretrained_path=path)
            self.apply_trace_globals()
            bundle = (stage_model, unet_vars, vae, vae_params, te)
            self._stage3_bundle = bundle
            logger.info("loaded SD x4 upscaler for IF stage III from %s", path)

        stage_model, unet_vars, vae, vae_params, te = bundle
        prompt = validation.prompts[index] if index < len(validation.prompts) else ""
        te_out = te.encode([prompt])
        text_embeds = jnp.asarray(np.asarray(te_out["last_hidden_state"]), jnp.float32)

        noise_level = int(
            getattr(self.config, "deepfloyd_validation_stage3_noise_level", None) or 100
        )
        guidance = float(
            getattr(self.config, "deepfloyd_validation_stage3_guidance", None) or 4.0
        )
        # the upscaler conditions on the raw low-res pixels noised at
        # noise_level with the LINEAR-beta ladder of its low-res scheduler
        schedule = DDPMScheduleConfig(
            beta_start=0.0001, beta_end=0.02, beta_schedule="linear"
        )
        ac = make_alphas_cumprod(schedule)
        rng = jax.random.fold_in(
            jax.random.PRNGKey(validation.seed), 104729 + index
        )
        rng_lat, rng_aug = jax.random.split(rng)
        a = ac[noise_level]
        noised = jnp.sqrt(a) * pixels + jnp.sqrt(1.0 - a) * jax.random.normal(
            rng_aug, pixels.shape, jnp.float32
        )

        height, width = pixels.shape[1], pixels.shape[2]
        latents = jax.random.normal(rng_lat, (1, height, width, 4), jnp.float32)
        scheduler = DDIMScheduler.create(
            validation.num_steps, schedule, "v_prediction"
        )

        def denoise_at(vars_, cond_pixels, embeds_):
            def fn(z, t):
                sample = jnp.concatenate([z, cond_pixels.astype(z.dtype)], axis=-1)
                return stage_model.module.apply(
                    vars_,
                    sample=sample,
                    timesteps=jnp.broadcast_to(t, (z.shape[0],)),
                    encoder_hidden_states=embeds_,
                    class_labels=jnp.full((z.shape[0],), noise_level, jnp.float32),
                )
            return fn

        if guidance > 1.0:
            neg_out = te.encode([""])
            neg_embeds = jnp.asarray(np.asarray(neg_out["last_hidden_state"]), jnp.float32)
            cond_fn = denoise_at(unet_vars, noised, text_embeds)
            uncond_fn = denoise_at(unet_vars, noised, neg_embeds)

            def denoise(z, t):
                return classifier_free_guidance(cond_fn(z, t), uncond_fn(z, t), guidance)
        else:
            denoise = denoise_at(unet_vars, noised, text_embeds)

        latents = jax.jit(
            lambda lat: sample_loop(scheduler, denoise, lat)
        )(latents)
        decoded = vae.apply(
            vae_params, latents / 0.08333, method=type(vae).decode
        )
        return jnp.clip(decoded, -1.0, 1.0)
