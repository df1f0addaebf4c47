"""Flux-architecture rectified-flow DiT in flax.linen (TPU-native re-design).

Capability parity with the reference's vendored Flux transformer
(reference: helpers/models/flux/ — 12B double/single-stream MMDiT with joint
text+image attention, axial RoPE over (t, h, w) ids, AdaLN-zero modulation,
guidance embedding for the distilled flavours).  The implementation here is
original JAX code built for XLA: one fused token stream per block, Pallas flash
attention via the dispatcher, static shapes, and fp32 parameters with bf16
compute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _ckpt_name
from flax import linen as nn

from ...ops import axial_rope
from ..layers import (
    AdaLayerNormZero,
    Attention,
    FeedForward,
    LayerNorm,
    LoRADense,
    MLPEmbedder,
    RMSNorm,
    gate_mod,
    modulate,
    timestep_embedding,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 2x2 patches of 16-channel latents
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    mlp_ratio: float = 4.0
    depth_double: int = 19
    depth_single: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    txt_in_features: int = 4096  # T5-XXL hidden
    vec_in_features: int = 768  # pooled CLIP-L
    # pooled-text conditioning head; LongCat-Image (reference
    # longcat_image/transformer.py:292-321 TimestepEmbeddings) modulates on
    # the timestep alone, so it disables this.
    vector_embed: bool = True
    guidance_embed: bool = True
    qkv_bias: bool = True

    @classmethod
    def tiny(cls) -> "FluxConfig":
        """Small config for tests."""
        return cls(
            in_channels=16,
            hidden_size=64,
            num_heads=2,
            head_dim=32,
            depth_double=2,
            depth_single=2,
            axes_dim=(8, 12, 12),
            txt_in_features=32,
            vec_in_features=32,
        )


class DoubleStreamBlock(nn.Module):
    """MMDiT block: separate img/txt params, joint attention over the fused stream."""

    config: FluxConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    # adapt the modulation linears too (--flux_lora_target=ai-toolkit)
    lora_mod_layers: bool = False
    # MuonClip QK-clip (reference helpers/training/optimizers/muon: per-head
    # max attention logits feed the optimizer's post-step q/k rescale) — costs
    # one extra fp32 QK^T, so it is opt-in for muon training only
    qk_clip: bool = False

    @nn.compact
    def __call__(self, img, txt, vec, rope, segment_ids=None, vec_txt=None):
        cfg = self.config
        dim = cfg.hidden_size
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        mod_lora = lora if self.lora_mod_layers else {}
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # vec may be tokenwise (B, S_img, dim) — LongCat-Image edit gives ref
        # tokens t=0 (reference longcat_image/model.py:684-706); the text
        # stream then modulates on the per-image mean (transformer.py:444-447)
        img_mods = AdaLayerNormZero(6, name="img_mod", **common, **mod_lora)(vec, dim)
        txt_mods = AdaLayerNormZero(6, name="txt_mod", **common, **mod_lora)(
            vec if vec_txt is None else vec_txt, dim)

        # --- joint attention ---------------------------------------------------------
        img_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), img_mods[0], img_mods[1])
        txt_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), txt_mods[0], txt_mods[1])

        def qkv(prefix, x):
            q = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_q", **common, **lora)(x)
            k = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_k", **common, **lora)(x)
            v = LoRADense(dim, use_bias=cfg.qkv_bias, name=f"{prefix}_attn_v", **common, **lora)(x)
            batch, seq = x.shape[:2]
            shape = (batch, seq, cfg.num_heads, cfg.head_dim)
            q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
            q = RMSNorm(name=f"{prefix}_attn_norm_q", **common)(q)
            k = RMSNorm(name=f"{prefix}_attn_norm_k", **common)(k)
            return q, k, v

        img_q, img_k, img_v = qkv("img", img_n)
        txt_q, txt_k, txt_v = qkv("txt", txt_n)

        # fused stream: text tokens first (Flux ordering), then image tokens
        q = jnp.concatenate([txt_q, img_q], axis=1)
        k = jnp.concatenate([txt_k, img_k], axis=1)
        v = jnp.concatenate([txt_v, img_v], axis=1)

        from ...ops import apply_rope, dot_product_attention

        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if self.qk_clip:
            logits = jnp.einsum(
                "bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * (cfg.head_dim ** -0.5)
            self.sow("intermediates", "qk_max", jnp.max(logits, axis=(0, 2, 3)))
        attn = _ckpt_name(
            dot_product_attention(
                q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
            ),
            "attn_out_double",
        )
        batch = img.shape[0]
        attn = attn.reshape(batch, -1, dim)
        txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

        img = img + gate_mod(img_mods[2]) * LoRADense(dim, name="img_attn_proj", **common, **lora)(img_attn)
        txt = txt + gate_mod(txt_mods[2]) * LoRADense(dim, name="txt_attn_proj", **common, **lora)(txt_attn)

        # --- per-stream MLP ------------------------------------------------------------
        img_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img), img_mods[3], img_mods[4])
        img = img + gate_mod(img_mods[5]) * FeedForward(
            dim, cfg.mlp_ratio, name="img_mlp", **common, **lora
        )(img_m)
        txt_m = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(txt), txt_mods[3], txt_mods[4])
        txt = txt + gate_mod(txt_mods[5]) * FeedForward(
            dim, cfg.mlp_ratio, name="txt_mlp", **common, **lora
        )(txt_m)
        return img, txt


class SingleStreamBlock(nn.Module):
    """DiT block over the fused (txt+img) stream with a fused qkv+mlp projection."""

    config: FluxConfig
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    lora_mod_layers: bool = False
    qk_clip: bool = False

    @nn.compact
    def __call__(self, x, vec, rope, segment_ids=None):
        cfg = self.config
        dim = cfg.hidden_size
        mlp_dim = int(dim * cfg.mlp_ratio)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)
        mod_lora = lora if self.lora_mod_layers else {}
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        shift, scale, gate = AdaLayerNormZero(3, name="modulation", **common, **mod_lora)(vec, dim)
        x_n = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(x), shift, scale)

        fused = LoRADense(dim * 3 + mlp_dim, name="linear1", **common, **lora)(x_n)
        qkv, mlp = fused[..., : dim * 3], fused[..., dim * 3:]
        batch, seq = x.shape[:2]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (batch, seq, cfg.num_heads, cfg.head_dim)
        q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
        q = RMSNorm(name="norm_q", **common)(q)
        k = RMSNorm(name="norm_k", **common)(k)

        from ...ops import apply_rope, dot_product_attention

        cos, sin = rope
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if self.qk_clip:
            logits = jnp.einsum(
                "bshd,bthd->bhst", q.astype(jnp.float32), k.astype(jnp.float32)
            ) * (cfg.head_dim ** -0.5)
            self.sow("intermediates", "qk_max", jnp.max(logits, axis=(0, 2, 3)))
        # NOTE (r5): tagging the kernel residuals INSIDE the flash custom_vjp
        # (ops/flash_attention residual_tag) to skip the bwd's fwd-kernel
        # re-run was tried and REVERTED: jax saves the custom_vjp's FULL
        # residual set (q,k,v,out,lse ≈ +92MB/block measured via
        # memory_analysis) once any of it is saveable — +3.5G on the 12B
        # flagship for a ~99 ms win.  The model-level tag below saves only
        # this transposed output (the block body's consumer).
        attn = _ckpt_name(
            dot_product_attention(
                q, k, v, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
            ),
            "attn_out",
        ).reshape(batch, seq, dim)

        out = LoRADense(dim, name="linear2", **common, **lora)(
            jnp.concatenate([attn, nn.gelu(mlp, approximate=True)], axis=-1)
        )
        return x + gate_mod(gate) * out


class FluxTransformer(nn.Module):
    """Full Flux DiT.  Inputs are pre-packed token sequences:

    img: (B, S_img, in_channels) packed latent patches
    img_ids / txt_ids: (B, S, 3) axial position ids
    txt: (B, S_txt, txt_in_features) T5 features
    vec: (B, vec_in_features) pooled CLIP features
    timesteps: (B,) in [0, 1]
    guidance: (B,) guidance scale (distilled flavours)
    """

    config: FluxConfig = FluxConfig()
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: Optional[float] = None
    lora_algo: str = "lora"
    lora_mod_layers: bool = False
    remat: bool = False
    # MuonClip QK-clip plumbing: sow per-head max attention logits per block
    qk_clip: bool = False
    # rematerialization policy: "full" recomputes everything;
    # "dots" saves matmul outputs and recomputes elementwise (usually the best
    # MFU/memory tradeoff on TPU: the MXU work is not repeated)
    remat_policy: str = "full"
    # mixed remat: the LAST K single-stream blocks keep their activations
    # (no remat) — remat trades FLOPs for HBM, so when headroom exists (int4
    # base, small batch) buying back recompute on K blocks raises MFU without
    # touching peak memory much (their bwd runs first, freeing early)
    remat_skip_last: int = 0
    # segmented remat (reference --gradient_checkpointing_interval,
    # safety_check.py:143-268): only every Nth block is rematted; the blocks
    # in between keep their activations.  interval<=1 remats every block.
    remat_interval: int = 1
    # TREAD routes over single-stream layers: tuple of
    # {"selection_ratio": r, "start_layer": i, "end_layer": j} (reference
    # helpers/training/tread.py + flux tread_init; active only when a
    # ``tread_rng`` is passed, i.e. during training)
    tread_routes: Tuple[Any, ...] = ()
    # FlowMap interval conditioning (reference helpers/models/flowmap.py:129
    # blend_flowmap_embeddings, used by AnyFlow/MeanFlow distillation): a
    # second time embedder encodes the interval endpoint and is blended into
    # the time embedding with a fixed gate.  0.0 disables (no extra params).
    flowmap_gate: float = 0.0
    flowmap_deltatime_type: str = "r"  # embed r itself, or the width t - r

    @nn.compact
    def __call__(
        self,
        img: jax.Array,
        img_ids: jax.Array,
        txt: jax.Array,
        txt_ids: jax.Array,
        timesteps: jax.Array,
        vec: jax.Array,
        guidance: Optional[jax.Array] = None,
        r_timesteps: Optional[jax.Array] = None,
        segment_ids: Optional[jax.Array] = None,
        tread_rng: Optional[jax.Array] = None,
        controlnet_double_residuals: Optional[Tuple[jax.Array, ...]] = None,
        controlnet_single_residuals: Optional[Tuple[jax.Array, ...]] = None,
    ) -> jax.Array:
        cfg = self.config
        dim = cfg.hidden_size
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lora = dict(lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, lora_algo=self.lora_algo)

        img_tok = LoRADense(dim, name="img_in", **common, **lora)(img)
        txt_tok = LoRADense(dim, name="txt_in", **common, **lora)(txt)

        # timesteps may be tokenwise (B, S_img): LongCat-Image edit modulates
        # ref tokens at t=0 (reference longcat_image/transformer.py:380-447)
        tokenwise = timesteps.ndim == 2
        if tokenwise:
            if self.tread_routes:
                raise ValueError("tokenwise timesteps are incompatible with TREAD routing")
            if self.flowmap_gate > 0.0:
                raise ValueError("tokenwise timesteps are incompatible with flowmap conditioning")
            t_batch, t_seq = timesteps.shape
            t_emb = timestep_embedding(timesteps.reshape(-1), 256).reshape(t_batch, t_seq, 256)
        else:
            t_emb = timestep_embedding(timesteps, 256)
        time_vec = MLPEmbedder(dim, name="time_in", **common)(t_emb.astype(self.dtype))
        if self.flowmap_gate > 0.0:
            # r defaults to t (zero-width interval == plain flow matching)
            r = timesteps if r_timesteps is None else r_timesteps
            delta = r if self.flowmap_deltatime_type == "r" else timesteps - r
            delta_vec = MLPEmbedder(dim, name="flowmap_delta_in", **common)(
                timestep_embedding(delta, 256).astype(self.dtype)
            )
            gate = jnp.asarray(self.flowmap_gate, time_vec.dtype)
            time_vec = (1.0 - gate) * time_vec + gate * delta_vec
        cond = time_vec
        if cfg.vector_embed:
            vec_cond = MLPEmbedder(dim, name="vector_in", **common)(vec.astype(self.dtype))
            cond = cond + (vec_cond[:, None, :] if tokenwise else vec_cond)
        if cfg.guidance_embed:
            if guidance is None:
                guidance = jnp.ones((img.shape[0],), jnp.float32)
            g_cond = MLPEmbedder(dim, name="guidance_in", **common)(
                timestep_embedding(guidance, 256).astype(self.dtype)
            )
            cond = cond + (g_cond[:, None, :] if tokenwise else g_cond)
        # text-stream / single-stream conditioning views (reference
        # longcat_image/transformer.py:443-447: tokenwise temb feeds the text
        # modulation with its per-image mean)
        cond_txt = cond.mean(axis=1) if tokenwise else cond

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        rope = axial_rope(cfg.axes_dim, ids, cfg.theta)

        double_cls = DoubleStreamBlock
        single_cls = SingleStreamBlock
        if self.remat:
            policy = None
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif self.remat_policy == "attn":
                # save the flash kernel residuals (out + compact lse) of the
                # 38 single-stream blocks across the remat boundary: their bwd
                # skips the fwd kernel re-run entirely (~2.6 ms/block on the
                # flagship) for ~28MB/block of HBM at 1024px.  Double-stream
                # outputs stay rematerialized — saving all 57 overflows a 16G
                # v5e by ~140MB at 12B-int8.
                policy = jax.checkpoint_policies.save_only_these_names("attn_out")
            elif self.remat_policy == "attn_all":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_out_double"
                )
            # "single": remat only the single-stream stack (they are 2/3 of the
            # depth); doubles keep activations -> less recompute when HBM allows
            if self.remat_policy != "single":
                double_cls = nn.remat(DoubleStreamBlock, policy=policy)
            single_cls = nn.remat(SingleStreamBlock, policy=policy)

        remat_interval = max(1, int(self.remat_interval))
        for layer in range(cfg.depth_double):
            layer_double_cls = (
                double_cls if layer % remat_interval == 0 else DoubleStreamBlock
            )
            img_tok, txt_tok = layer_double_cls(
                cfg, name=f"double_{layer}", qk_clip=self.qk_clip,
                lora_mod_layers=self.lora_mod_layers, **common, **lora
            )(img_tok, txt_tok, cond, rope, segment_ids,
              cond_txt if tokenwise else None)
            # hidden-state tap (CREPA/LayerSync plumbing; no-op unless the
            # caller requests mutable=['intermediates'])
            self.sow("intermediates", f"double_{layer}_hidden", img_tok)
            if controlnet_double_residuals is not None:
                # interval-spread residuals (diffusers-style: controlnet depth may
                # be shallower than the host transformer)
                n_res = len(controlnet_double_residuals)
                img_tok = img_tok + controlnet_double_residuals[layer * n_res // cfg.depth_double]

        stream = jnp.concatenate([txt_tok, img_tok], axis=1)
        txt_len = txt_tok.shape[1]
        cond_single = (
            jnp.concatenate(
                [jnp.repeat(cond_txt[:, None, :], txt_len, axis=1), cond], axis=1
            )
            if tokenwise
            else cond
        )

        # normalize TREAD routes to (start, end, ratio) over single-stream layers
        routes = []
        if self.tread_routes and tread_rng is not None:
            from ...training.tread import TREADRouter

            for i, route in enumerate(self.tread_routes):
                start = int(route.get("start_layer", 0))
                end = int(route.get("end_layer", cfg.depth_single - 1))
                if start < 0:
                    start += cfg.depth_single
                if end < 0:
                    end += cfg.depth_single
                routes.append((start, end, float(route["selection_ratio"]), i))

        cos, sin = rope
        saved = None  # (full_stream, keep_idx, saved_rope) while inside a route
        for layer in range(cfg.depth_single):
            for start, end, ratio, ridx in routes:
                if layer == start and saved is None:
                    force_keep = jnp.concatenate(
                        [
                            jnp.ones((stream.shape[0], txt_len), bool),
                            jnp.zeros((stream.shape[0], stream.shape[1] - txt_len), bool),
                        ],
                        axis=1,
                    )
                    router = TREADRouter(ratio, force_keep=force_keep)
                    keep_idx, _ = router.plan(stream, jax.random.fold_in(tread_rng, ridx))
                    saved = (stream, keep_idx, (cos, sin), end)
                    stream = TREADRouter.select(stream, keep_idx)
                    cos = jnp.take_along_axis(saved[2][0], keep_idx[..., None], axis=1)
                    sin = jnp.take_along_axis(saved[2][1], keep_idx[..., None], axis=1)
            layer_cls = (
                SingleStreamBlock
                if self.remat
                and (
                    layer >= cfg.depth_single - int(self.remat_skip_last)
                    or layer % remat_interval != 0
                )
                else single_cls
            )
            stream = layer_cls(
                cfg, name=f"single_{layer}", qk_clip=self.qk_clip,
                lora_mod_layers=self.lora_mod_layers, **common, **lora
            )(stream, cond_single, (cos, sin), None if saved is not None else segment_ids)
            if saved is None:
                self.sow("intermediates", f"single_{layer}_hidden", stream[:, txt_len:])
            if controlnet_single_residuals is not None and saved is None:
                n_res = len(controlnet_single_residuals)
                residual = controlnet_single_residuals[layer * n_res // cfg.depth_single]
                stream = stream.at[:, txt_len:].add(residual)
            if saved is not None and layer == saved[3]:
                from ...training.tread import TREADRouter

                full, keep_idx, full_rope, _ = saved
                stream = TREADRouter.restore(full, stream, keep_idx)
                cos, sin = full_rope
                saved = None
        img_tok = stream[:, txt_len:]

        shift, scale = AdaLayerNormZero(2, name="final_mod", **common)(cond, dim)
        img_tok = modulate(LayerNorm(use_scale=False, use_bias=False, **common)(img_tok), shift, scale)
        return LoRADense(
            cfg.in_channels, name="final_proj", **common,
        )(img_tok).astype(jnp.float32)


def pack_latents(latents: jax.Array, patch: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, H/p * W/p, C*p*p) token packing."""
    batch, height, width, channels = latents.shape
    x = latents.reshape(batch, height // patch, patch, width // patch, patch, channels)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(batch, (height // patch) * (width // patch), channels * patch * patch)


def unpack_latents(tokens: jax.Array, height: int, width: int, patch: int = 2) -> jax.Array:
    """Inverse of :func:`pack_latents`; height/width are the latent dims."""
    batch = tokens.shape[0]
    channels = tokens.shape[-1] // (patch * patch)
    x = tokens.reshape(batch, height // patch, width // patch, patch, patch, channels)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(batch, height, width, channels)


def make_img_ids(batch: int, height: int, width: int, patch: int = 2) -> jax.Array:
    """Axial (t, h, w) position ids for packed latent tokens."""
    h_ids = jnp.arange(height // patch)
    w_ids = jnp.arange(width // patch)
    grid = jnp.stack(
        [
            jnp.zeros((height // patch, width // patch), jnp.int32),
            jnp.broadcast_to(h_ids[:, None], (height // patch, width // patch)),
            jnp.broadcast_to(w_ids[None, :], (height // patch, width // patch)),
        ],
        axis=-1,
    ).reshape(1, -1, 3)
    return jnp.broadcast_to(grid, (batch, grid.shape[1], 3))


def make_txt_ids(batch: int, seq: int) -> jax.Array:
    return jnp.zeros((batch, seq, 3), jnp.int32)
