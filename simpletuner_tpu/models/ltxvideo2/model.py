"""LTX-2 family (reference: helpers/models/ltxvideo2 — 19B audiovisual
flow-matching DiT with joint video+audio denoising, Gemma-3 connector text
conditioning, 128-channel video latents and a mel audio latent stream;
SURVEY.md §2.3 "ltxvideo2").

Training conventions (reference model.py:1960-2250 ``model_predict``):
* video latents are packed to (B, F·H·W, 128) tokens (patch 1);
* BOTH modalities are noised with the same flow sigmas and denoised jointly —
  the loss is the mean of the video and audio flow-matching losses;
* timesteps may be tokenwise (intrinsic/i2v conditioning keeps conditioning
  tokens at σ=0) — the transformer takes (B,) or (B, S) σ values.
The DiT body lives in ``transformer.py`` and is checkpoint-faithful to the
vendored ``LTX2VideoTransformer3DModel``.  The Gemma text "connectors" run on
the encode side; cached ``text_embeds`` are their 3840-dim output features.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import ModelFoundation, TextEncoderSpec
from ...training.losses import flow_interpolate, flow_target
from .transformer import LTX2Config, LTX2Transformer

__all__ = ["LTX2Config", "LTX2Transformer", "LTXVideo2"]


class LTXVideo2(ModelFoundation):
    NAME = "ltxvideo2"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    MODALITY = "video"
    LATENT_CHANNEL_COUNT = 128
    DEFAULT_RESOLUTION = 768
    DEFAULT_FLAVOUR = "ltx2"
    HUGGINGFACE_PATHS = {"ltx2": "Lightricks/LTX-2"}
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="gemma-3", family="gemma-2", subfolder="text_encoder", max_length=256),
    )
    DEFAULT_LORA_TARGET = ("to_q", "to_k", "to_v", "to_out")

    def __init__(self, config: Any, arch: Optional[LTX2Config] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = LTX2Config.tiny()
        else:
            self.arch = LTX2Config()

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels

    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("ltxvideo2 is a flow-matching family")

    def video_vae_config(self):
        """Generic causal-VAE config for the latent cache (32x spatial /
        8x temporal / 128ch, matching AutoencoderKLLTX2Video compression).
        ``load_video_vae`` below imports the checkpoint-faithful VAE."""
        from ..video_vae import VideoVAEConfig

        if getattr(self.config, "model_arch_preset", None) == "tiny":
            import dataclasses as _dc

            return _dc.replace(VideoVAEConfig.tiny(), latent_channels=self.arch.in_channels)
        return VideoVAEConfig(
            latent_channels=128,
            base_channels=64,
            channel_multipliers=(1, 2, 4, 8, 8, 8),
            temporal_downsample=(False, True, True, True, False, False),
            num_res_blocks=2,
        )

    # ---- multistage (spatial-upscale) validation ------------------------------------
    # reference ltxvideo2/model.py:140 LTX2_STAGE2_SIGMAS + :1026-1089: stage 1
    # renders at half resolution, the latent upsampler doubles it, stage 2
    # re-noises at sigmas[0] and runs this short ladder
    LTX2_STAGE2_SIGMAS = (0.909375, 0.725, 0.421875)

    def supports_multistage_validation(self) -> bool:
        mode = str(getattr(self.config, "ltx2_validation_pipeline_mode", "trained-stage")
                   or "trained-stage").strip().lower()
        if mode not in ("trained-stage", "spatial-upscale"):
            raise ValueError(
                "ltx2_validation_pipeline_mode must be trained-stage or spatial-upscale"
            )
        return mode == "spatial-upscale"

    def latent_upsampler(self):
        """Cached (module, variables) for the stage-2 spatial upsampler.
        Requires a resolvable checkpoint except under the tiny test preset,
        where a fresh x2 upsampler stands in."""
        if getattr(self, "_latent_upsampler", None) is None:
            import os

            path = getattr(self.config, "ltx2_validation_spatial_upsampler_model", None)
            if path and os.path.isfile(str(path)):
                from .latent_upsampler import load_ltx2_latent_upsampler

                self._latent_upsampler = load_ltx2_latent_upsampler(str(path))
            elif getattr(self.config, "model_arch_preset", None) == "tiny":
                import dataclasses as _dc

                from .latent_upsampler import LTX2LatentUpsampler, LTX2UpsamplerConfig

                cfg = _dc.replace(LTX2UpsamplerConfig.tiny(), in_channels=self.arch.in_channels)
                module = LTX2LatentUpsampler(cfg)
                variables = module.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 1, 4, 4, cfg.in_channels))
                )
                self._latent_upsampler = (module, variables)
            else:
                raise ValueError(
                    "spatial-upscale validation requires "
                    "ltx2_validation_spatial_upsampler_model to point at a local "
                    "safetensors file (no silent random-weight fallback)"
                )
        return self._latent_upsampler

    def spatial_upscale_latents(self, latents: jax.Array) -> jax.Array:
        """2x spatial upscale of (B, T, H, W, C) diffusion latents.  Uses the
        faithful video-VAE per-channel statistics when a real VAE is attached
        (``self._video_vae_stats``); identity statistics otherwise."""
        from .latent_upsampler import upsample_ltx2_video_latents

        module, variables = self.latent_upsampler()
        stats = getattr(self, "_video_vae_stats", None)
        if stats is not None:
            mean, std = stats
        else:
            mean = jnp.zeros((latents.shape[-1],), jnp.float32)
            std = jnp.ones((latents.shape[-1],), jnp.float32)
        return upsample_ltx2_video_latents(latents, module, variables, mean, std)

    @staticmethod
    def load_video_vae(path: str, tiny: bool = False):
        """Checkpoint-faithful ``AutoencoderKLLTX2Video`` import → (module,
        variables); see ``video_vae.py`` for the architecture contract."""
        from .video_vae import LTX2VideoVAE, LTX2VideoVAEConfig, load_ltx2_video_vae

        cfg = LTX2VideoVAEConfig.tiny() if tiny else LTX2VideoVAEConfig()
        return LTX2VideoVAE(cfg), load_ltx2_video_vae(cfg, path)

    def create_module(self):
        return LTX2Transformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
        )

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        del resolution
        return {
            "latents": jnp.zeros((batch_size, 2, 4, 4, self.arch.in_channels), jnp.float32),
            "audio_latents": jnp.zeros((batch_size, 6, self.arch.audio_in_channels), jnp.float32),
            "text_embeds": jnp.zeros((batch_size, 8, self.arch.caption_channels), jnp.float32),
        }

    # ---- intrinsic conditioning (reference model.py:1766-1893) -------------------------
    def _intrinsic_condition_specs(self):
        """Parse --ltx2_intrinsic_conditioning (JSON str/dict/list) plus the
        alias probability knobs into a spec list (reference
        _ltx2_intrinsic_condition_specs, model.py:1766-1793)."""
        import json as _json

        raw = getattr(self.config, "ltx2_intrinsic_conditioning", None)
        if raw is None:
            specs = []
        elif isinstance(raw, str):
            specs = _json.loads(raw)
        elif isinstance(raw, dict):
            specs = [raw]
        else:
            specs = list(raw)
        aliases = (
            ("first_frame", "ltx2_first_frame_conditioning_probability", {}),
            ("prefix", "ltx2_prefix_conditioning_probability",
             {"temporal_boundary": "ltx2_prefix_conditioning_frames"}),
            ("suffix", "ltx2_suffix_conditioning_probability",
             {"temporal_boundary": "ltx2_suffix_conditioning_frames"}),
            ("mask", "ltx2_mask_conditioning_probability", {}),
        )
        for cond_type, prob_attr, extra in aliases:
            probability = float(getattr(self.config, prob_attr, 0.0) or 0.0)
            if probability <= 0:
                continue
            spec = {"type": cond_type, "probability": probability}
            for key, attr in extra.items():
                value = getattr(self.config, attr, None)
                if value is not None:
                    spec[key] = value
            specs.append(spec)
        known = {"first_frame", "prefix", "suffix", "spatial_crop", "mask"}
        for spec in specs:
            if spec.get("type") not in known:
                raise ValueError(
                    f"Unsupported LTX-2 intrinsic conditioning type: {spec.get('type')!r}."
                )
        return specs

    def _intrinsic_token_mask(self, spec, prepared, batch, frames, height, width):
        """(B, S) float mask of tokens held clean for one spec (reference
        _ltx2_temporal/spatial/mask_condition_mask, model.py:1680-1764).
        Tokens are (frame-major) F·H·W at patch size 1."""
        seq = frames * height * width
        tokens_per_frame = height * width
        kind = spec["type"]
        if kind in ("first_frame", "prefix", "suffix"):
            n_frames = 1 if kind == "first_frame" else int(
                spec.get("temporal_boundary", spec.get("num_frames", 1))
            )
            n_tokens = min(n_frames, frames) * tokens_per_frame
            if n_frames * tokens_per_frame > seq:
                raise ValueError(
                    f"LTX-2 temporal conditioning requested {n_frames * tokens_per_frame} "
                    f"tokens, but target has {seq} tokens."
                )
            idx = jnp.arange(seq)
            mask1d = (idx >= seq - n_tokens) if kind == "suffix" else (idx < n_tokens)
            return jnp.broadcast_to(mask1d.astype(jnp.float32), (batch, seq))
        if kind == "spatial_crop":
            region = spec.get("spatial_region", spec.get("region", (0, 0, 0, 0)))
            if len(region) != 4:
                raise ValueError(
                    f"LTX-2 spatial_crop conditioning requires [y1, x1, y2, x2], got {region}."
                )
            y1, x1, y2, x2 = (int(v) for v in region)
            y1, y2 = max(0, min(y1, height)), max(0, min(y2, height))
            x1, x2 = max(0, min(x1, width)), max(0, min(x2, width))
            if y2 < y1 or x2 < x1:
                raise ValueError(
                    f"LTX-2 spatial_crop region must be ordered [y1, x1, y2, x2], got {region}."
                )
            spatial = jnp.zeros((height, width), jnp.float32).at[y1:y2, x1:x2].set(1.0)
            return jnp.broadcast_to(
                jnp.tile(spatial.reshape(-1), frames), (batch, seq)
            )
        # kind == "mask": a pixel/latent mask rides the batch (reference reads
        # prepared_batch[mask_key]; this data plane delivers mask conditioning
        # datasets as latent-resolution "loss_mask")
        mask_key = spec.get("mask_key", "conditioning_pixel_values")
        raw = prepared.get(mask_key)
        if raw is None and mask_key == "conditioning_pixel_values":
            raw = prepared.get("loss_mask")
        if raw is None:
            raise ValueError(
                f"LTX-2 mask conditioning requested but prepared_batch[{mask_key!r}] is missing."
            )
        raw = raw.astype(jnp.float32)
        if raw.ndim == 2:  # (H', W') shared
            raw = jnp.broadcast_to(raw[None], (batch,) + raw.shape)
        raw = jnp.where(raw.min() < 0, raw / 2.0 + 0.5, raw)
        if raw.ndim == 3:  # (B, H', W') -> every frame
            resized = jax.image.resize(raw, (batch, height, width), "linear")
            resized = jnp.broadcast_to(resized[:, None], (batch, frames, height, width))
        elif raw.ndim == 4:  # (B, F', H', W')
            resized = jax.image.resize(raw, (batch, frames, height, width), "nearest")
        else:
            raise ValueError(
                f"LTX-2 mask conditioning expects [B,H,W] or [B,F,H,W], got {raw.shape}."
            )
        return (resized > 0.5).astype(jnp.float32).reshape(batch, seq)

    def _apply_intrinsic_conditioning(self, rng, prepared):
        """Replace conditioned tokens with clean latents at per-token t=0 and
        exclude them from the loss (reference _apply_ltx2_intrinsic_conditioning,
        model.py:1796-1893: noisy := m·clean + (1−m)·noisy, timesteps := (1−m)·t,
        loss_mask &= (m == 0), each spec gated per-sample by probability)."""
        specs = self._intrinsic_condition_specs()
        if not specs:
            return prepared
        noisy = prepared["noisy_latents"]
        batch, frames, height, width, channels = noisy.shape
        seq = frames * height * width
        clean = prepared["latents"].astype(noisy.dtype)
        noisy_tok = noisy.reshape(batch, seq, channels)
        clean_tok = clean.reshape(batch, seq, channels)
        t_tok = jnp.broadcast_to(
            prepared["timesteps"].astype(jnp.float32).reshape(batch, 1), (batch, seq)
        )
        keep = jnp.ones((batch, seq), jnp.float32)
        consumed_loss_mask = False
        for i, spec in enumerate(specs):
            probability = float(spec.get("probability", 1.0))
            if probability <= 0:
                continue
            gate = (
                jax.random.uniform(jax.random.fold_in(rng, 0x17C + i), (batch, 1))
                < probability
            ).astype(jnp.float32)
            if (
                spec["type"] == "mask"
                and spec.get("mask_key", "conditioning_pixel_values") == "conditioning_pixel_values"
                and "conditioning_pixel_values" not in prepared
                and "loss_mask" in prepared
            ):
                # the data plane delivered the mask dataset as loss_mask; it
                # becomes the conditioning source, not a loss mask on top
                consumed_loss_mask = True
            mask = self._intrinsic_token_mask(spec, prepared, batch, frames, height, width)
            mask = mask * gate
            noisy_tok = mask[..., None] * clean_tok + (1.0 - mask[..., None]) * noisy_tok
            t_tok = (1.0 - mask) * t_tok
            keep = keep * (1.0 - mask)
        out = dict(prepared)
        out["noisy_latents"] = noisy_tok.reshape(noisy.shape)
        out["token_timesteps"] = t_tok  # tokenwise t for the transformer
        video_mask = keep.reshape(batch, frames, height, width, 1)
        existing = None if consumed_loss_mask else prepared.get("loss_mask")
        if existing is not None:
            em = existing.astype(jnp.float32)
            if em.ndim == 3:  # (B, H', W') image-style mask -> every frame
                em = jax.image.resize(em, (batch, height, width), "linear")
                em = jnp.broadcast_to(em[:, None, :, :, None], video_mask.shape)
            else:
                em = em.reshape(video_mask.shape)
            video_mask = video_mask * em
        out["loss_mask"] = video_mask
        return out

    # ---- joint AV noising (reference: both modalities share the flow sigmas) ----------
    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = super().prepare_batch(rng, batch)
        audio = prepared.get("audio_latents")
        if audio is not None:
            rng_a = jax.random.fold_in(rng, 0xA7D10)
            noise_a = prepared.pop("override_audio_noise", None)
            if noise_a is None:
                noise_a = jax.random.normal(rng_a, audio.shape, jnp.float32)
            sigmas = prepared["sigmas"]
            prepared["audio_noisy_latents"] = flow_interpolate(
                audio.astype(jnp.float32), noise_a, sigmas
            )
            prepared["audio_target"] = flow_target(audio.astype(jnp.float32), noise_a)
        return self._apply_intrinsic_conditioning(jax.random.fold_in(rng, 0x17C0), prepared)

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]  # (B, F, H, W, C)
        batch, frames, height, width, channels = noisy.shape
        inputs = {
            "video_tokens": noisy.reshape(batch, frames * height * width, channels),
            "audio_tokens": prepared.get(
                "audio_noisy_latents",
                jnp.zeros((batch, 1, self.arch.audio_in_channels), jnp.float32),
            ),
            "text_embeds": prepared["text_embeds"],
            # intrinsic conditioning keeps clean tokens at t=0 via tokenwise
            # timesteps (the transformer's adaLN embeds (B, S) natively)
            "timesteps": prepared.get("token_timesteps", prepared["timesteps"]),
            "num_frames": frames,
            "height": height,
            "width": width,
        }
        if "token_timesteps" in prepared:
            # the audio stream keeps the scalar sigma draw
            inputs["audio_timesteps"] = prepared["timesteps"]
        if "text_attention_mask" in prepared:
            inputs["text_mask"] = prepared["text_attention_mask"]

        # IC-LoRA reference-video conditioning (reference model.py:2048-2102:
        # a single 5D conditioning latent concatenates as clean tokens with
        # re-scaled rope coords)
        ref = prepared.get("control_latents")
        if ref is not None and ref.ndim == 5:
            rb, rf, rh, rw, rc = ref.shape
            if rc != channels:
                raise ValueError(
                    "LTX-2 IC-LoRA conditioning latents must match target "
                    f"latent channels ({rc} vs {channels})"
                )
            inputs["ref_tokens"] = ref.reshape(rb, rf * rh * rw, rc)
            inputs["ref_shape"] = (rf, rh, rw)
            spatial = getattr(self.config, "ltx2_reference_spatial_scale_factor", None)
            if spatial is None:
                # infer from the latent grids (reference
                # _infer_ltx2_reference_spatial_scale, model.py:1894-1914)
                if rh == height and rw == width:
                    spatial = 1
                elif rh <= 0 or rw <= 0 or height % rh or width % rw:
                    raise ValueError(
                        f"LTX-2 reference dims {rh}x{rw} must evenly divide "
                        f"target {height}x{width}"
                    )
                else:
                    spatial = height // rh
                    if spatial != width // rw:
                        raise ValueError(
                            "LTX-2 reference scale must be uniform, got "
                            f"{height // rh} vs {width // rw}"
                        )
            inputs["ref_spatial_scale"] = int(spatial)
            inputs["ref_temporal_scale"] = int(
                getattr(self.config, "ltx2_reference_temporal_scale_factor", 1) or 1
            )
            strength = prepared.get("conditioning_strength")
            if strength is not None:
                inputs["ref_strength"] = jnp.broadcast_to(
                    jnp.asarray(strength, jnp.float32).reshape(-1, 1),
                    (rb, rf * rh * rw),
                )
        return inputs

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        video_out, audio_out = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs
        )
        self._last_audio_pred = audio_out
        return video_out.reshape(prepared["noisy_latents"].shape)

    def model_predict_with_intermediates(self, variables, prepared, rngs=None):
        (video_out, audio_out), state = self.module.apply(
            variables, **self.get_model_inputs(prepared), rngs=rngs, mutable=["intermediates"]
        )
        self._last_audio_pred = audio_out
        return video_out.reshape(prepared["noisy_latents"].shape), state.get("intermediates", {})

    def loss_fn(self, variables, rng, batch):
        """Joint AV loss: mean of video and audio flow losses (reference
        ltxvideo2 model.py loss over both streams)."""
        prepared = self.prepare_batch(rng, batch)
        pred = self.model_predict(variables, prepared)
        loss = self.compute_loss(pred, prepared)
        aux: Dict[str, jax.Array] = {"timesteps": prepared["timesteps"]}
        if "audio_target" in prepared:
            audio_pred = self._last_audio_pred
            audio_loss = jnp.mean(
                jnp.square(audio_pred.astype(jnp.float32) - prepared["audio_target"])
            )
            loss = 0.5 * (loss + audio_loss)
            aux["audio_loss"] = audio_loss
        return loss, aux

    # ---- validation reference-video conditioning (IC-LoRA at render time) --------------
    def validation_video_conditioning_entries(self):
        """Parse --validation_ltx2_video_conditioning: JSON list of paths,
        [path, strength] pairs, or {path/video_path, strength} objects
        (reference model.py:1161-1195)."""
        import json as _json
        import os as _os

        raw = getattr(self.config, "validation_ltx2_video_conditioning", None)
        if raw in (None, "", [], ()):
            return None
        if isinstance(raw, str):
            raw = _json.loads(raw)
        if isinstance(raw, dict):
            raw = [raw]
        if not isinstance(raw, (list, tuple)):
            raise ValueError(
                "validation_ltx2_video_conditioning must be a JSON list of "
                "paths, [path, strength] pairs, or objects with path/video_path"
            )
        resolved = []
        for entry in raw:
            strength = 1.0
            if isinstance(entry, str):
                path = entry
            elif isinstance(entry, dict):
                path = entry.get("path", entry.get("video_path"))
                strength = float(entry.get("strength", 1.0))
            elif isinstance(entry, (list, tuple)) and len(entry) == 2:
                path, strength = entry
                strength = float(strength)
            else:
                raise ValueError(
                    "each validation_ltx2_video_conditioning entry must be a "
                    "path, [path, strength] pair, or object with path/video_path"
                )
            if not path:
                raise ValueError(
                    "validation_ltx2_video_conditioning entry is missing path/video_path"
                )
            resolved.append((_os.path.expanduser(str(path)), strength))
        return resolved

    def set_validation_video_conditioning(self, latents, strength: float) -> None:
        """Install pre-encoded reference latents (1, F, H, W, C) for renders."""
        self._validation_ref = (np.asarray(latents, np.float32), float(strength))

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        cond = {"text_embeds": batch["text_embeds"]}
        if "audio_latents" in batch:
            cond["audio_latents"] = batch["audio_latents"]
        ref = getattr(self, "_validation_ref", None)
        if ref is not None:
            latents, strength = ref
            cond["control_latents"] = jnp.asarray(latents)
            cond["conditioning_strength"] = jnp.full((latents.shape[0],), strength, jnp.float32)
        return cond

    def encode_text(self, prompts):
        (gemma,) = self.text_encoders
        out = gemma.encode(prompts)
        hidden = np.asarray(out["last_hidden_state"], np.float32)
        # connectors emit caption_channels-wide features; tile/truncate the
        # encoder width to the connector width (cache-compatible shim until the
        # gemma connector stack lands)
        width = self.arch.caption_channels
        if hidden.shape[-1] < width:
            reps = -(-width // hidden.shape[-1])
            hidden = np.tile(hidden, (1, 1, reps))[..., :width]
        elif hidden.shape[-1] > width:
            hidden = hidden[..., :width]
        return [
            {
                "text_embeds": hidden[i],
                "attention_mask": np.asarray(out["attention_mask"][i]),
            }
            for i in range(len(prompts))
        ]

    def collate_text_embeds(self, embeds):
        return {"text_embeds": np.stack([np.asarray(e["text_embeds"]) for e in embeds])}
