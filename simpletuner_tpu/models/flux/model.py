"""Flux family (reference: helpers/models/flux/model.py:49-128 class contract,
:625-793 ``model_predict`` — pack latents → RoPE ids → guidance vector →
transformer → unpack)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..common import ModelFoundation, TextEncoderSpec
from .transformer import (
    FluxConfig,
    FluxTransformer,
    make_img_ids,
    make_txt_ids,
    pack_latents,
    unpack_latents,
)


class Flux(ModelFoundation):
    NAME = "flux"
    PREDICTION_TYPE = "flow_matching"
    MODEL_TYPE = "transformer"
    LATENT_CHANNEL_COUNT = 16
    DEFAULT_RESOLUTION = 1024
    DEFAULT_FLAVOUR = "dev"
    HUGGINGFACE_PATHS = {
        "dev": "black-forest-labs/FLUX.1-dev",
        "schnell": "black-forest-labs/FLUX.1-schnell",
        "krea": "black-forest-labs/FLUX.1-Krea-dev",
        "kontext": "black-forest-labs/FLUX.1-Kontext-dev",
    }
    TEXT_ENCODER_CONFIGURATION = (
        TextEncoderSpec(name="clip-l", family="clip-l", subfolder="text_encoder", max_length=77, output="pooled"),
        TextEncoderSpec(name="t5-xxl", family="t5-xxl", subfolder="text_encoder_2", max_length=512),
    )
    DEFAULT_LORA_TARGET = ("attn_q", "attn_k", "attn_v", "attn_proj", "linear1", "linear2")
    SLIDER_LORA_TARGET = ("to_k", "to_q", "to_v", "to_out.0", "to_qkv")
    VAE_SCALING_FACTOR = 0.3611
    VAE_SHIFT_FACTOR = 0.1159

    # --flux_lora_target presets (reference flux/model.py:1105-1233); names are
    # diffusers module paths, matched through the flux LoRA key map with PEFT
    # suffix semantics.  Single-block q/k/v/proj_mlp ride ONE fused linear1
    # here, so any matching split name adapts the whole fused projection.
    LORA_TARGET_PRESETS = {
        "all": [
            "to_k", "to_q", "to_v", "to_qkv", "add_qkv_proj",
            "add_k_proj", "add_q_proj", "add_v_proj", "to_out.0", "to_add_out",
        ],
        "context": [
            "add_k_proj", "add_q_proj", "add_v_proj", "add_qkv_proj", "to_add_out",
        ],
        "context+ffs": [
            "add_k_proj", "add_q_proj", "add_v_proj", "add_qkv_proj",
            "to_add_out", "ff_context.net.0.proj", "ff_context.net.2",
        ],
        "all+ffs": [
            "to_k", "to_q", "to_v", "to_qkv", "add_qkv_proj",
            "add_k_proj", "add_q_proj", "add_v_proj", "to_out.0", "to_add_out",
            "ff.net.0.proj", "ff.net.2", "ff_context.net.0.proj",
            "ff_context.net.2", "proj_mlp", "proj_out",
        ],
        "all+ffs+embedder": [
            "x_embedder",
            "to_k", "to_q", "to_v", "to_qkv", "add_qkv_proj",
            "add_k_proj", "add_q_proj", "add_v_proj", "to_out.0", "to_add_out",
            "ff.net.0.proj", "ff.net.2", "ff_context.net.0.proj",
            "ff_context.net.2", "proj_mlp", "proj_out",
        ],
        "ai-toolkit": [
            "to_q", "to_k", "to_qkv", "add_qkv_proj", "to_v",
            "add_q_proj", "add_k_proj", "add_v_proj", "to_out.0", "to_add_out",
            "ff.net.0.proj", "ff.net.2", "ff_context.net.0.proj",
            "ff_context.net.2", "norm.linear", "norm1.linear",
            "norm1_context.linear", "proj_mlp", "proj_out",
        ],
        "tiny": ["single_transformer_blocks.7.proj_out",
                 "single_transformer_blocks.20.proj_out"],
        "nano": ["single_transformer_blocks.7.proj_out"],
    }

    def family_lora_targets(self):
        preset = getattr(self.config, "flux_lora_target", None) or "all"
        if preset == "controlnet":
            raise NotImplementedError(
                "flux_lora_target=controlnet (LoRA over ControlNet modules) is "
                "not supported; use model_type=controlnet for full ControlNet "
                "training"
            )
        if preset not in self.LORA_TARGET_PRESETS:
            raise ValueError(
                f"unknown flux_lora_target {preset!r}; available: "
                f"{sorted(self.LORA_TARGET_PRESETS)}"
            )
        return self.LORA_TARGET_PRESETS[preset]

    @classmethod
    def get_acceleration_presets(cls):
        """Generic TPU presets plus the measured 12B-on-16G-v5e recipe
        (bench.py flagship: int8 frozen base + rank-16 LoRA + full remat at
        1024px runs at >50% MFU on a single 16G chip)."""
        presets = super().get_acceleration_presets()
        presets.append(
            {
                "name": "v5e-16g-12b-lora",
                "description": "Full 12B Flux LoRA on one 16G v5e: int8 base, full remat, bs1@1024px",
                "tradeoff": "measured 52% MFU / ~0.46 samples/s on v5e-1",
                "config": {
                    "gradient_checkpointing": True,
                    "gradient_checkpointing_policy": "full",
                    "base_model_precision": "int8",
                    "train_batch_size": 1,
                    "resolution": 1024,
                },
            }
        )
        return presets

    def __init__(self, config: Any, arch: Optional[FluxConfig] = None):
        super().__init__(config)
        if arch is not None:
            self.arch = arch
        elif getattr(config, "model_arch_preset", None) == "tiny":
            self.arch = FluxConfig.tiny()
        else:
            self.arch = FluxConfig(
                guidance_embed=self.flavour in (None, "dev", "krea", "kontext")
            )

    @property
    def latent_channels(self) -> int:
        return self.arch.in_channels // 4  # 2x2 packing

    # ---- construction -----------------------------------------------------------------
    def _flowmap_settings(self):
        """FlowMap interval conditioning (reference helpers/models/flowmap.py),
        enabled by AnyFlow distillation or an explicit flowmap_gate config."""
        gate = getattr(self.config, "flowmap_gate", None)
        deltatime = getattr(self.config, "flowmap_deltatime_type", None) or "r"
        if gate is None and getattr(self.config, "distillation_method", None) == "anyflow":
            mc = getattr(self.config, "distillation_config", None) or {}
            gate = mc.get("gate_value", 0.25)
            deltatime = mc.get("deltatime_type", "r")
        if deltatime not in ("r", "t-r"):
            raise ValueError("flowmap deltatime_type must be 'r' or 't-r'")
        return float(gate or 0.0), deltatime

    def create_module(self):
        tread = getattr(self.config, "tread_config", None) or {}
        routes = tuple(tread.get("routes", ())) if isinstance(tread, dict) else tuple(tread or ())
        flowmap_gate, flowmap_deltatime = self._flowmap_settings()
        return FluxTransformer(
            config=self.arch,
            dtype=jnp.bfloat16 if getattr(self.config, "mixed_precision", "bf16") == "bf16" else jnp.float32,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_algo=self.lora_algo,
            lora_mod_layers=(
                self.lora_rank > 0
                and getattr(self.config, "flux_lora_target", None) == "ai-toolkit"
            ),
            remat=bool(getattr(self.config, "gradient_checkpointing", False)),
            remat_policy=getattr(self.config, "gradient_checkpointing_policy", None) or "full",
            remat_skip_last=int(getattr(self.config, "gradient_checkpointing_skip_last", 0) or 0),
            remat_interval=int(getattr(self.config, "gradient_checkpointing_interval", 0) or 1),
            tread_routes=routes,
            flowmap_gate=flowmap_gate,
            flowmap_deltatime_type=flowmap_deltatime,
            qk_clip=self.wants_qk_clip,
        )

    @property
    def wants_qk_clip(self) -> bool:
        """MuonClip QK-clip (reference trainer.py:6743-6751 + optimizers/muon):
        per-head max attention logits are collected during the forward and the
        q/k projections are rescaled post-step.  Full-rank muon training only —
        in LoRA mode the attention weights are frozen and must not be mutated."""
        return (
            str(getattr(self.config, "optimizer", "") or "").lower() == "muon"
            and getattr(self.config, "model_type", "lora") == "full"
            and bool(getattr(self.config, "muon_qk_clip", True))
        )

    def apply_qk_clip(
        self, trainable, qk_maxima, tau: float = 100.0, alpha: float = 0.5
    ):
        """Rescale per-head q/k projection columns where max logits exceed tau.

        ``qk_maxima``: {"double_3": (heads,), "single_7": (heads,), ...}.
        gamma = min(1, tau/max); q *= gamma^alpha per head, k *= gamma^(1-alpha)
        (reference muon/_apply_qk_clip)."""
        import jax.numpy as jnp

        params = dict(trainable.get("params", {}))
        if not params:
            return trainable
        dh = self.arch.head_dim
        dim = self.arch.hidden_size

        def col_scale(node, factors):
            # kernels are (in, out) with head-major out; biases (out,)
            out = dict(node)
            expand = jnp.repeat(factors, dh)
            if "kernel" in out:
                out["kernel"] = out["kernel"] * expand[None, : out["kernel"].shape[1]]
            if "bias" in out:
                out["bias"] = out["bias"] * expand[: out["bias"].shape[0]]
            return out

        for key, maxima in qk_maxima.items():
            gamma = jnp.minimum(1.0, tau / jnp.maximum(maxima, 1e-6))
            gq = gamma ** alpha
            gk = gamma ** (1.0 - alpha)
            if key.startswith("double_") and key in params:
                block = dict(params[key])
                for name, g in (
                    ("img_attn_q", gq), ("txt_attn_q", gq),
                    ("img_attn_k", gk), ("txt_attn_k", gk),
                ):
                    if name in block:
                        block[name] = col_scale(block[name], g)
                params[key] = block
            elif key.startswith("single_") and key in params:
                block = dict(params[key])
                lin1 = block.get("linear1")
                if lin1 is not None:
                    lin1 = dict(lin1)
                    scale_vec = jnp.concatenate(
                        [
                            jnp.repeat(gq, dh),
                            jnp.repeat(gk, dh),
                            jnp.ones((lin1["kernel"].shape[1] - 2 * dim,), gq.dtype),
                        ]
                    )
                    lin1["kernel"] = lin1["kernel"] * scale_vec[None, :]
                    if "bias" in lin1:
                        lin1["bias"] = lin1["bias"] * scale_vec
                    block["linear1"] = lin1
                params[key] = block
        out = dict(trainable)
        out["params"] = params
        return out

    def post_init_params(self, variables):
        # clone the time embedder into the FlowMap delta embedder (reference
        # helpers/models/flowmap.py:7 clone_flowmap_embedder) so the interval
        # pathway starts as a faithful copy of the time pathway
        params = variables.get("params", {})
        if "flowmap_delta_in" in params and "time_in" in params:
            variables = dict(variables)
            variables["params"] = dict(params)
            variables["params"]["flowmap_delta_in"] = jax.tree_util.tree_map(
                jnp.array, params["time_in"]
            )
        return variables

    def example_batch(self, batch_size: int = 1, resolution: int = 64) -> Dict[str, jax.Array]:
        latent = resolution // 8
        txt_len = 16 if self.arch.txt_in_features < 512 else 512
        channels = self.arch.in_channels // 4  # 2x2 packing
        return {
            "latents": jnp.zeros((batch_size, latent, latent, channels), jnp.float32),
            "t5_embeds": jnp.zeros((batch_size, txt_len, self.arch.txt_in_features), jnp.float32),
            "pooled_embeds": jnp.zeros((batch_size, self.arch.vec_in_features), jnp.float32),
        }

    # ---- jit path -----------------------------------------------------------------------
    def prepare_batch(self, rng: jax.Array, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        prepared = super().prepare_batch(rng, batch)
        latents = batch["latents"]
        batch_size, height, width = latents.shape[0], latents.shape[1], latents.shape[2]
        prepared["img_ids"] = make_img_ids(batch_size, height, width)
        prepared["txt_ids"] = make_txt_ids(batch_size, batch["t5_embeds"].shape[1])
        # guidance vector for the distilled (dev) flavour; reference flux/model.py guidance modes
        mode = getattr(self.config, "flux_guidance_mode", "constant") or "constant"
        if mode == "random-range":
            low = getattr(self.config, "flux_guidance_min", 0.0) or 0.0
            high = getattr(self.config, "flux_guidance_max", 4.0) or 4.0
            rng_g = jax.random.fold_in(rng, 7)
            prepared["guidance"] = jax.random.uniform(rng_g, (batch_size,), minval=low, maxval=high)
        else:
            value = getattr(self.config, "flux_guidance_value", 1.0)
            value = 1.0 if value is None else value
            prepared["guidance"] = jnp.full((batch_size,), value, jnp.float32)
        if getattr(self.config, "tread_config", None):
            prepared["tread_rng"] = jax.random.fold_in(rng, 99)
        return prepared

    @property
    def is_kontext(self) -> bool:
        return self.flavour == "kontext"

    def supports_multi_reference(self) -> bool:
        return self.is_kontext

    def get_model_inputs(self, prepared: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        noisy = prepared["noisy_latents"]
        img = pack_latents(noisy)
        img_ids = prepared["img_ids"]
        if self.is_kontext and "control_latents" in prepared:
            # Kontext edit conditioning (reference flux/model.py:517
            # prepare_batch_conditions + build_kontext_inputs): each clean
            # reference image rides as extra tokens at t-index 1..N;
            # loss/prediction covers only the noisy half (model_predict
            # slices them back off).  control_latents is (B, H, W, C) for one
            # reference or (B, N, H, W, C) for multi-reference edit batches
            # (conditioning_multidataset_sampling=combined).
            control = prepared["control_latents"].astype(noisy.dtype)
            refs = [control] if control.ndim == 4 else [
                control[:, i] for i in range(control.shape[1])
            ]
            batch, height, width = noisy.shape[0], noisy.shape[1], noisy.shape[2]
            for i, ref_latents in enumerate(refs):
                ref_ids = make_img_ids(batch, height, width).at[..., 0].set(i + 1)
                img = jnp.concatenate([img, pack_latents(ref_latents)], axis=1)
                img_ids = jnp.concatenate([img_ids, ref_ids], axis=1)
        inputs = {
            "img": img,
            "img_ids": img_ids,
            "txt": prepared["t5_embeds"],
            "txt_ids": prepared["txt_ids"],
            "timesteps": prepared["timesteps"],
            "vec": prepared.get("pooled_embeds"),
            "guidance": prepared.get("guidance"),
        }
        if "tread_rng" in prepared:
            inputs["tread_rng"] = prepared["tread_rng"]
        if "flowmap_r_timesteps" in prepared:
            inputs["r_timesteps"] = prepared["flowmap_r_timesteps"]
        if (
            getattr(self.config, "flux_attention_masked_training", False)
            and "t5_masks" in prepared
        ):
            # --flux_attention_masked_training (reference flux/model.py:742-751
            # + transformer.py:227 expand_flux_attention_mask): padded T5
            # tokens must not be attended to.  The reference applies a key
            # mask broadcast over all queries; here padded tokens get segment
            # id -1 (pad) so the flash kernel excludes them both as keys and
            # as queries — equivalent for the loss because padded-token
            # outputs never reach the image rows or the final projection.
            # Sequence order matches the fused stream: text first, then image
            # (incl. kontext reference tokens, which are always valid).
            txt_seg = jnp.where(prepared["t5_masks"].astype(jnp.int32) > 0, 0, -1)
            img_seg = jnp.zeros((img.shape[0], img.shape[1]), jnp.int32)
            inputs["segment_ids"] = jnp.concatenate([txt_seg, img_seg], axis=1)
        return inputs

    def inference_conditioning(self, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        latents = batch["latents"]
        batch_size, height, width = latents.shape[0], latents.shape[1], latents.shape[2]
        cond = {
            "t5_embeds": batch["t5_embeds"],
            "pooled_embeds": batch["pooled_embeds"],
            "img_ids": make_img_ids(batch_size, height, width),
            "txt_ids": make_txt_ids(batch_size, batch["t5_embeds"].shape[1]),
        }
        guidance = batch.get("guidance", getattr(self.config, "validation_guidance_real", None) or 3.5)
        cond["guidance"] = jnp.broadcast_to(jnp.asarray(guidance, jnp.float32), (batch_size,))
        if (
            getattr(self.config, "flux_attention_masked_training", False)
            and "t5_masks" in batch
        ):
            # masked sampling too (reference flux/model.py:466/:487
            # prompt_mask/negative_mask reach the pipeline when the flag is on)
            cond["t5_masks"] = batch["t5_masks"]
        return cond

    # ---- controlnet (reference flux controlnet_init/controlnet_predict) ---------------
    def controlnet_module(self):
        if not hasattr(self, "_controlnet_module"):
            from .controlnet import FluxControlNet

            self._controlnet_module = FluxControlNet(
                config=self.arch,
                depth=int(getattr(self.config, "controlnet_depth", 2) or 2),
                remat=bool(getattr(self.config, "gradient_checkpointing", False)),
            )
        return self._controlnet_module

    def init_controlnet_params(self, rng: jax.Array, batch: Dict[str, jax.Array]):
        prepared = self.prepare_batch(jax.random.PRNGKey(0), batch)
        inputs = self.get_model_inputs(prepared)
        control = pack_latents(batch.get("control_latents", batch["latents"]))
        module = self.controlnet_module()
        init_fn = jax.jit(
            lambda r: module.init(
                {"params": r},
                img=inputs["img"],
                control=control,
                img_ids=inputs["img_ids"],
                txt=inputs["txt"],
                txt_ids=inputs["txt_ids"],
                timesteps=inputs["timesteps"],
                vec=inputs["vec"],
                guidance=inputs["guidance"],
            )
        )
        return init_fn(rng)["params"]

    def _controlnet_residuals(self, variables, prepared: Dict[str, jax.Array]):
        inputs = self.get_model_inputs(prepared)
        return self.controlnet_module().apply(
            {"params": variables["controlnet"]},
            img=inputs["img"],
            control=pack_latents(prepared["control_latents"]),
            img_ids=inputs["img_ids"],
            txt=inputs["txt"],
            txt_ids=inputs["txt_ids"],
            timesteps=inputs["timesteps"],
            vec=inputs["vec"],
            guidance=inputs.get("guidance"),
        )

    def model_predict(self, variables, prepared: Dict[str, jax.Array], rngs=None) -> jax.Array:
        inputs = self.get_model_inputs(prepared)
        if "controlnet" in variables and "control_latents" in prepared:
            inputs["controlnet_double_residuals"] = self._controlnet_residuals(variables, prepared)
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}
        tokens = self.module.apply(main_vars, **inputs, rngs=rngs)
        height, width = prepared["noisy_latents"].shape[1:3]
        if self.is_kontext and "control_latents" in prepared:
            noisy_tokens = (height // 2) * (width // 2)
            tokens = tokens[:, :noisy_tokens]  # drop the reference-image tokens
        return unpack_latents(tokens, height, width)

    def model_predict_with_intermediates(self, variables, prepared):
        inputs = self.get_model_inputs(prepared)
        main_vars = {k: v for k, v in variables.items() if k != "controlnet"}
        tokens, mutated = self.module.apply(main_vars, **inputs, mutable=["intermediates"])
        height, width = prepared["noisy_latents"].shape[1:3]
        if self.is_kontext and "control_latents" in prepared:
            tokens = tokens[:, : (height // 2) * (width // 2)]
        return unpack_latents(tokens, height, width), mutated.get("intermediates", {})

    # ---- host-side text encoding ---------------------------------------------------------
    def encode_text(self, prompts):
        """CLIP-L pooled + T5 sequence embeds, one dict per prompt (cache payload)."""
        import numpy as np

        clip, t5 = self.text_encoders
        clip_out = clip.encode(prompts)
        t5_out = t5.encode(prompts)
        results = []
        for i in range(len(prompts)):
            results.append(
                {
                    "t5_embeds": np.asarray(t5_out["last_hidden_state"][i], np.float32),
                    "pooled_embeds": np.asarray(clip_out["pooled"][i], np.float32),
                    "attention_mask": np.asarray(t5_out["attention_mask"][i]),
                }
            )
        return results

    def collate_text_embeds(self, embeds):
        import numpy as np

        out = {
            "t5_embeds": np.stack([np.asarray(e["t5_embeds"]) for e in embeds]),
            "pooled_embeds": np.stack([np.asarray(e["pooled_embeds"]) for e in embeds]),
        }
        if all("attention_mask" in e for e in embeds):
            # T5 padding mask rides along for --flux_attention_masked_training
            # (reference flux/model.py:466 prompt_mask / :742-751 mask plumbing)
            out["t5_masks"] = np.stack(
                [np.asarray(e["attention_mask"]).reshape(-1) for e in embeds]
            )
        return out

    # ---- config validation -------------------------------------------------------------
    def check_user_config(self) -> None:
        if getattr(self.config, "prediction_type", None) not in (None, "flow_matching"):
            raise ValueError("flux is a flow-matching family; prediction_type override unsupported")
