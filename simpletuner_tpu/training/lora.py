"""LoRA safetensors import/export in PEFT (diffusers) and ComfyUI key layouts.

Reference behavior: helpers/training/lora_format.py (auto-detected ComfyUI ↔
diffusers conversion; ``.lora_A.weight``/``.lora_B.weight`` vs
``.lora_down.weight``/``.lora_up.weight`` + ``.alpha``) and save_hooks.py LoRA
export.  Our adapters live in a flax ``lora`` collection of ``{lora_A, lora_B}``
leaves; exporters map flax module paths onto the reference ecosystem's key
names so exported files load in diffusers/ComfyUI and vice versa.

Weight orientation: torch saves Linear weights as (out, in); our kernels are
(in, out).  lora_A.weight = Aᵀ (r, in); lora_B.weight = Bᵀ (out, r).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def flatten_lora(lora_params: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """flax lora collection -> {'double_0/img_attn_q': {'lora_A': ..., 'lora_B': ...}}"""
    out: Dict[str, Dict[str, np.ndarray]] = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "lora_A" in node and "lora_B" in node:
                entry = {
                    "lora_A": np.asarray(node["lora_A"], np.float32),
                    "lora_B": np.asarray(node["lora_B"], np.float32),
                }
                if "dora_m" in node:  # DoRA magnitude vector rides along
                    entry["dora_m"] = np.asarray(node["dora_m"], np.float32)
                out["/".join(path)] = entry
                return
            if "lokr_w1" in node and "lokr_w2" in node:
                out["/".join(path)] = {
                    "lokr_w1": np.asarray(node["lokr_w1"], np.float32),
                    "lokr_w2": np.asarray(node["lokr_w2"], np.float32),
                }
                return
            if "loha_w1_a" in node:
                out["/".join(path)] = {
                    key: np.asarray(node[key], np.float32)
                    for key in ("loha_w1_a", "loha_w1_b", "loha_w2_a", "loha_w2_b")
                }
                return
            if "ia3_scale" in node:
                out["/".join(path)] = {"ia3_scale": np.asarray(node["ia3_scale"], np.float32)}
                return
            for key, value in node.items():
                walk(value, path + [key])

    walk(lora_params, [])
    return out


def unflatten_lora(flat: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, leaves in flat.items():
        node = out
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = dict(leaves)
    return out


# ---------------------------------------------------------------------------------
# Per-family key maps: flax path -> diffusers module path, or a split spec for
# fused projections: (diffusers_path, start, end) slices of the output dim.
# ---------------------------------------------------------------------------------


def flux_key_map(arch) -> Dict[str, Any]:
    h = arch.hidden_size
    mapping: Dict[str, Any] = {
        "img_in": "x_embedder",
        "txt_in": "context_embedder",
    }
    double = {
        "img_attn_q": "attn.to_q",
        "img_attn_k": "attn.to_k",
        "img_attn_v": "attn.to_v",
        "img_attn_proj": "attn.to_out.0",
        "txt_attn_q": "attn.add_q_proj",
        "txt_attn_k": "attn.add_k_proj",
        "txt_attn_v": "attn.add_v_proj",
        "txt_attn_proj": "attn.to_add_out",
        "img_mlp/proj_in": "ff.net.0.proj",
        "img_mlp/proj_out": "ff.net.2",
        "txt_mlp/proj_in": "ff_context.net.0.proj",
        "txt_mlp/proj_out": "ff_context.net.2",
        # modulation linears (ai-toolkit LoRA target surface)
        "img_mod/lin": "norm1.linear",
        "txt_mod/lin": "norm1_context.linear",
    }
    for layer in range(arch.depth_double):
        for ours, theirs in double.items():
            mapping[f"double_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    mlp_dim = int(h * arch.mlp_ratio)
    for layer in range(arch.depth_single):
        prefix = f"single_transformer_blocks.{layer}"
        mapping[f"single_{layer}/linear1"] = [
            (f"{prefix}.attn.to_q", 0, h),
            (f"{prefix}.attn.to_k", h, 2 * h),
            (f"{prefix}.attn.to_v", 2 * h, 3 * h),
            (f"{prefix}.proj_mlp", 3 * h, 3 * h + mlp_dim),
        ]
        mapping[f"single_{layer}/linear2"] = f"{prefix}.proj_out"
        mapping[f"single_{layer}/modulation/lin"] = f"{prefix}.norm.linear"
    return mapping


def unet_key_map(arch) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel paths (sd1x/sd2x/sdxl/kolors/deepfloyd)."""
    mapping: Dict[str, Any] = {}
    levels = len(arch.block_out_channels)

    def depth_at(level: int) -> int:
        return arch.transformer_layers[min(level, len(arch.transformer_layers) - 1)]

    def spatial(ours: str, theirs: str, depth: int) -> None:
        for i in range(depth):
            for attn in ("attn1", "attn2"):
                for proj, tproj in (
                    ("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"), ("to_out", "to_out.0"),
                ):
                    mapping[f"{ours}/blocks_{i}/{attn}/{proj}"] = (
                        f"{theirs}.transformer_blocks.{i}.{attn}.{tproj}"
                    )
            mapping[f"{ours}/blocks_{i}/ff_proj"] = f"{theirs}.transformer_blocks.{i}.ff.net.0.proj"
            mapping[f"{ours}/blocks_{i}/ff_out"] = f"{theirs}.transformer_blocks.{i}.ff.net.2"
        mapping[f"{ours}/proj_in"] = f"{theirs}.proj_in"
        mapping[f"{ours}/proj_out"] = f"{theirs}.proj_out"

    for level in range(levels):
        if not arch.cross_attention_blocks[level]:
            continue
        for block in range(arch.layers_per_block):
            spatial(
                f"down_{level}_attn_{block}",
                f"down_blocks.{level}.attentions.{block}",
                depth_at(level),
            )
        u = levels - 1 - level  # diffusers up index
        for block in range(arch.layers_per_block + 1):
            spatial(
                f"up_{level}_attn_{block}",
                f"up_blocks.{u}.attentions.{block}",
                depth_at(level),
            )
    spatial("mid_attn", "mid_block.attentions.0", depth_at(levels - 1))
    return mapping


def sd3_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "img_attn_q": "attn.to_q",
        "img_attn_k": "attn.to_k",
        "img_attn_v": "attn.to_v",
        "txt_attn_q": "attn.add_q_proj",
        "txt_attn_k": "attn.add_k_proj",
        "txt_attn_v": "attn.add_v_proj",
        "img_attn_proj": "attn.to_out.0",
        "txt_attn_proj": "attn.to_add_out",
        "img_mlp_in": "ff.net.0.proj",
        "img_mlp_out": "ff.net.2",
        "txt_mlp_in": "ff_context.net.0.proj",
        "txt_mlp_out": "ff_context.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def stable_cascade_key_map(arch) -> Dict[str, Any]:
    """StableCascadeUNet layout (reference helpers/models/stable_cascade)."""
    mapping: Dict[str, Any] = {}
    levels = len(arch.block_out_channels)

    def attn(dst, src):
        mapping[f"{dst}_attn/to_q"] = f"{src}.attention.to_q"
        mapping[f"{dst}_attn/to_k"] = f"{src}.attention.to_k"
        mapping[f"{dst}_attn/to_v"] = f"{src}.attention.to_v"
        mapping[f"{dst}_attn/to_out"] = f"{src}.attention.to_out.0"

    for i in range(levels):
        for j in range(arch.down_num_layers_per_block[i]):
            attn(f"down_{i}_{j}", f"down_blocks.{i}.{j * 3 + 2}")
    for u in range(levels):
        level = levels - 1 - u
        for j in range(arch.up_num_layers_per_block[::-1][level]):
            attn(f"up_{u}_{j}", f"up_blocks.{u}.{j * 3 + 2}")
    return mapping


def longcat_video_key_map(arch) -> Dict[str, Any]:
    """LongCatVideoTransformer3DModel layout (reference helpers/models/longcat_video)."""
    mapping: Dict[str, Any] = {"final_linear": "final_layer.linear"}
    for layer in range(arch.depth):
        mapping[f"block_{layer}/qkv"] = f"blocks.{layer}.attn.qkv"
        mapping[f"block_{layer}/attn_proj"] = f"blocks.{layer}.attn.proj"
        mapping[f"block_{layer}/crs_q"] = f"blocks.{layer}.cross_attn.q_linear"
        mapping[f"block_{layer}/crs_kv"] = f"blocks.{layer}.cross_attn.kv_linear"
        mapping[f"block_{layer}/crs_proj"] = f"blocks.{layer}.cross_attn.proj"
        for p in ("w1", "w2", "w3"):
            mapping[f"block_{layer}/ffn_{p}"] = f"blocks.{layer}.ffn.{p}"
    return mapping


def cosmos1_core_key_map(core, ours_prefix: str = "", theirs_prefix: str = "") -> Dict[str, Any]:
    """Shared Cosmos 1/2 DiT core layout (CosmosTransformer3DModel)."""
    mapping: Dict[str, Any] = {f"{ours_prefix}proj_out": f"{theirs_prefix}proj_out"}
    for layer in range(core.num_layers):
        for attn in ("attn1", "attn2"):
            for p in ("q", "k", "v"):
                mapping[f"{ours_prefix}block_{layer}/{attn}_{p}"] = (
                    f"{theirs_prefix}transformer_blocks.{layer}.{attn}.to_{p}")
            mapping[f"{ours_prefix}block_{layer}/{attn}_out"] = (
                f"{theirs_prefix}transformer_blocks.{layer}.{attn}.to_out.0")
        mapping[f"{ours_prefix}block_{layer}/ff_in"] = (
            f"{theirs_prefix}transformer_blocks.{layer}.ff.net.0.proj")
        mapping[f"{ours_prefix}block_{layer}/ff_out"] = (
            f"{theirs_prefix}transformer_blocks.{layer}.ff.net.2")
    return mapping


def anima_key_map(arch) -> Dict[str, Any]:
    """AnimaTransformerModel layout (adapter + cosmos core)."""
    return cosmos1_core_key_map(arch.core, ours_prefix="core/", theirs_prefix="core.")


def sanavideo_key_map(arch) -> Dict[str, Any]:
    """SanaVideoTransformer3DModel layout (reference helpers/models/sanavideo)."""
    mapping: Dict[str, Any] = {"proj_out": "proj_out"}
    table = {
        "attn1_q": "attn1.to_q", "attn1_k": "attn1.to_k", "attn1_v": "attn1.to_v",
        "attn1_proj": "attn1.to_out.0",
        "attn2_q": "attn2.to_q", "attn2_k": "attn2.to_k", "attn2_v": "attn2.to_v",
        "attn2_proj": "attn2.to_out.0",
    }
    for layer in range(arch.num_layers):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def ernie_key_map(arch) -> Dict[str, Any]:
    """ErnieImageTransformer2DModel layout (reference helpers/models/ernie)."""
    mapping: Dict[str, Any] = {"final_linear": "final_linear"}
    for layer in range(arch.num_layers):
        for ours, theirs in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                             ("to_out", "to_out.0")):
            mapping[f"layer_{layer}/{ours}"] = f"layers.{layer}.self_attention.{theirs}"
        for p in ("gate_proj", "up_proj", "linear_fc2"):
            mapping[f"layer_{layer}/{p}"] = f"layers.{layer}.mlp.{p}"
    return mapping


def ideogram_key_map(arch) -> Dict[str, Any]:
    """Ideogram4Transformer layout (reference helpers/models/ideogram)."""
    mapping: Dict[str, Any] = {"input_proj": "input_proj",
                               "final_linear": "final_layer.linear"}
    for layer in range(arch.num_layers):
        mapping[f"layer_{layer}/qkv"] = f"layers.{layer}.attention.qkv"
        mapping[f"layer_{layer}/o"] = f"layers.{layer}.attention.o"
        for p in ("w1", "w2", "w3"):
            mapping[f"layer_{layer}/{p}"] = f"layers.{layer}.feed_forward.{p}"
    return mapping


def krea2_key_map(arch) -> Dict[str, Any]:
    """Krea2Transformer2DModel layout (reference helpers/models/krea2)."""
    mapping: Dict[str, Any] = {"img_in": "img_in", "final_linear": "final_layer.linear"}
    attn = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
            "to_gate": "to_gate", "to_out": "to_out.0"}
    for layer in range(arch.num_layers):
        for ours, theirs in attn.items():
            mapping[f"block_{layer}/attn/{ours}"] = f"transformer_blocks.{layer}.attn.{theirs}"
        for p in ("gate", "up", "down"):
            mapping[f"block_{layer}/ff/{p}"] = f"transformer_blocks.{layer}.ff.{p}"
    return mapping


def kandinsky5_key_map(arch) -> Dict[str, Any]:
    """Kandinsky5Transformer3DModel layout (reference
    helpers/models/kandinsky5_video/transformer_kandinsky5.py)."""
    mapping: Dict[str, Any] = {"visual_in": "visual_embeddings.in_layer",
                               "out_proj": "out_layer.out_layer"}
    attn = {"to_query": "to_query", "to_key": "to_key", "to_value": "to_value",
            "out_layer": "out_layer"}
    for layer in range(arch.num_text_blocks):
        for ours, theirs in attn.items():
            mapping[f"text_block_{layer}/self_attention/{ours}"] = (
                f"text_transformer_blocks.{layer}.self_attention.{theirs}")
        mapping[f"text_block_{layer}/feed_forward/in_layer"] = (
            f"text_transformer_blocks.{layer}.feed_forward.in_layer")
        mapping[f"text_block_{layer}/feed_forward/out_layer"] = (
            f"text_transformer_blocks.{layer}.feed_forward.out_layer")
    for layer in range(arch.num_visual_blocks):
        for branch in ("self_attention", "cross_attention"):
            for ours, theirs in attn.items():
                mapping[f"visual_block_{layer}/{branch}/{ours}"] = (
                    f"visual_transformer_blocks.{layer}.{branch}.{theirs}")
        mapping[f"visual_block_{layer}/feed_forward/in_layer"] = (
            f"visual_transformer_blocks.{layer}.feed_forward.in_layer")
        mapping[f"visual_block_{layer}/feed_forward/out_layer"] = (
            f"visual_transformer_blocks.{layer}.feed_forward.out_layer")
    return mapping


def wan_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "self_attn_q": "attn1.to_q",
        "self_attn_k": "attn1.to_k",
        "self_attn_v": "attn1.to_v",
        "self_attn_proj": "attn1.to_out.0",
        "cross_attn_q": "attn2.to_q",
        "cross_attn_k": "attn2.to_k",
        "cross_attn_v": "attn2.to_v",
        "cross_attn_proj": "attn2.to_out.0",
        "ffn_in": "ffn.net.0.proj",
        "ffn_out": "ffn.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"blocks.{layer}.{theirs}"
    return mapping


def pixart_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {
        "caption_in_1": "caption_projection.linear_1",
        "caption_in_2": "caption_projection.linear_2",
    }
    table = {
        "attn1_q": "attn1.to_q", "attn1_k": "attn1.to_k", "attn1_v": "attn1.to_v",
        "attn1_proj": "attn1.to_out.0",
        "attn2_q": "attn2.to_q", "attn2_k": "attn2.to_k", "attn2_v": "attn2.to_v",
        "attn2_proj": "attn2.to_out.0",
        "ff_in": "ff.net.0.proj", "ff_out": "ff.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def cosmos3_key_map(arch) -> Dict[str, Any]:
    """Cosmos3 MoT layout (Cosmos3OmniTransformer, flat keys): understanding
    pathway rides ``to_*``, generation pathway ``add_*_proj``/``to_add_out``."""
    mapping: Dict[str, Any] = {"proj_in": "proj_in", "proj_out": "proj_out"}
    table = {
        "attn_und_q": "self_attn.to_q", "attn_und_k": "self_attn.to_k",
        "attn_und_v": "self_attn.to_v", "attn_und_out": "self_attn.to_out",
        "attn_gen_q": "self_attn.add_q_proj", "attn_gen_k": "self_attn.add_k_proj",
        "attn_gen_v": "self_attn.add_v_proj", "attn_gen_out": "self_attn.to_add_out",
        "mlp/gate_proj": "mlp.gate_proj", "mlp/up_proj": "mlp.up_proj",
        "mlp/down_proj": "mlp.down_proj",
        "mlp_moe_gen/gate_proj": "mlp_moe_gen.gate_proj",
        "mlp_moe_gen/up_proj": "mlp_moe_gen.up_proj",
        "mlp_moe_gen/down_proj": "mlp_moe_gen.down_proj",
    }
    for i in range(arch.num_layers):
        for ours, theirs in table.items():
            mapping[f"layer_{i}/{ours}"] = f"layers.{i}.{theirs}"
    return mapping


def ltx2_key_map(arch) -> Dict[str, Any]:
    """LTX-2 layout (LTX2VideoTransformer3DModel): dual-modal blocks with six
    attention modules each plus video/audio FFNs."""
    mapping: Dict[str, Any] = {
        "proj_in": "proj_in",
        "audio_proj_in": "audio_proj_in",
        "proj_out": "proj_out",
        "audio_proj_out": "audio_proj_out",
    }
    attn_mods = ("attn1", "audio_attn1", "attn2", "audio_attn2",
                 "audio_to_video_attn", "video_to_audio_attn")
    for i in range(arch.num_layers):
        for mod in attn_mods:
            for ours, theirs in (("to_q", "to_q"), ("to_k", "to_k"),
                                 ("to_v", "to_v"), ("to_out", "to_out.0")):
                mapping[f"block_{i}/{mod}/{ours}"] = f"transformer_blocks.{i}.{mod}.{theirs}"
        mapping[f"block_{i}/ff/proj_in"] = f"transformer_blocks.{i}.ff.net.0.proj"
        mapping[f"block_{i}/ff/proj_out"] = f"transformer_blocks.{i}.ff.net.2"
        mapping[f"block_{i}/audio_ff/proj_in"] = f"transformer_blocks.{i}.audio_ff.net.0.proj"
        mapping[f"block_{i}/audio_ff/proj_out"] = f"transformer_blocks.{i}.audio_ff.net.2"
    return mapping


def acestep_key_map(arch) -> Dict[str, Any]:
    """ACE-Step layout (ACEStepTransformer2DModel): Lite-LA self-attention +
    cross-attention blocks; ``to_out`` is a ModuleList (``.0``)."""
    mapping: Dict[str, Any] = {
        "speaker_embedder": "speaker_embedder",
        "genre_embedder": "genre_embedder",
        "lyric_proj": "lyric_proj",
        "final_proj": "final_layer.linear",
    }
    table = {
        "attn_q": "attn.to_q", "attn_k": "attn.to_k", "attn_v": "attn.to_v",
        "attn_proj": "attn.to_out.0",
        "cross_q": "cross_attn.to_q", "cross_k": "cross_attn.to_k",
        "cross_v": "cross_attn.to_v", "cross_proj": "cross_attn.to_out.0",
    }
    for i in range(arch.num_layers):
        for ours, theirs in table.items():
            mapping[f"block_{i}/{ours}"] = f"transformer_blocks.{i}.{theirs}"
    return mapping


def flux2_key_map(arch) -> Dict[str, Any]:
    """FLUX.2 layout (Flux2Transformer2DModel): bias-free double blocks plus
    ViT-22B fused single blocks (``to_qkv_mlp_proj`` / ``to_out``)."""
    mapping: Dict[str, Any] = {
        "patch_in": "x_embedder",
        "txt_in": "context_embedder",
        "final_proj": "proj_out",
    }
    double = {
        "attn_q": "attn.to_q", "attn_k": "attn.to_k", "attn_v": "attn.to_v",
        "attn_add_q": "attn.add_q_proj", "attn_add_k": "attn.add_k_proj",
        "attn_add_v": "attn.add_v_proj",
        "attn_proj": "attn.to_out.0", "attn_add_proj": "attn.to_add_out",
        "ff_in": "ff.linear_in", "ff_out": "ff.linear_out",
        "ff_context_in": "ff_context.linear_in", "ff_context_out": "ff_context.linear_out",
    }
    single = {"qkv_mlp": "attn.to_qkv_mlp_proj", "proj_out": "attn.to_out"}
    for i in range(arch.depth_double):
        for ours, theirs in double.items():
            mapping[f"double_{i}/{ours}"] = f"transformer_blocks.{i}.{theirs}"
    for i in range(arch.depth_single):
        for ours, theirs in single.items():
            mapping[f"single_{i}/{ours}"] = f"single_transformer_blocks.{i}.{theirs}"
    return mapping


def hidream_key_map(arch) -> Dict[str, Any]:
    """HiDream-I1 layout (HiDreamImageTransformer2DModel): double/single stream
    blocks under ``.block``, plain-Linear ``to_out`` (no ``.0``)."""
    mapping: Dict[str, Any] = {"patch_in": "x_embedder.proj"}
    attn = {
        "attn_q": "attn1.to_q", "attn_k": "attn1.to_k", "attn_v": "attn1.to_v",
        "attn_proj": "attn1.to_out",
    }
    attn_t = {
        "attn_q_t": "attn1.to_q_t", "attn_k_t": "attn1.to_k_t",
        "attn_v_t": "attn1.to_v_t", "attn_proj_t": "attn1.to_out_t",
    }
    shared = {f"ff_i/shared_experts/w{j}": f"ff_i.shared_experts.w{j}" for j in (1, 2, 3)}
    ff_t = {f"ff_t/w{j}": f"ff_t.w{j}" for j in (1, 2, 3)}
    for i in range(arch.depth_double):
        for ours, theirs in {**attn, **attn_t, **shared, **ff_t}.items():
            mapping[f"double_{i}/{ours}"] = f"double_stream_blocks.{i}.block.{theirs}"
    for i in range(arch.depth_single):
        for ours, theirs in {**attn, **shared}.items():
            mapping[f"single_{i}/{ours}"] = f"single_stream_blocks.{i}.block.{theirs}"
    return mapping


def lumina2_key_map(arch) -> Dict[str, Any]:
    """Next-DiT layout (diffusers Lumina2Transformer2DModel): joint ``layers``
    plus context/noise refiner blocks, bias-free GQA attention + SwiGLU FFN."""
    mapping: Dict[str, Any] = {
        "cap_in": "time_caption_embed.caption_embedder.1",
        "patch_in": "x_embedder",
        "final_proj": "norm_out.linear_2",
    }
    table = {
        "attn_q": "attn.to_q", "attn_k": "attn.to_k", "attn_v": "attn.to_v",
        "attn_proj": "attn.to_out.0",
        "feed_forward/linear_1": "feed_forward.linear_1",
        "feed_forward/linear_2": "feed_forward.linear_2",
        "feed_forward/linear_3": "feed_forward.linear_3",
    }
    groups = [(f"layer_{i}", f"layers.{i}") for i in range(arch.depth)]
    groups += [(f"noise_refiner_{i}", f"noise_refiner.{i}") for i in range(arch.refiner_depth)]
    groups += [(f"context_refiner_{i}", f"context_refiner.{i}") for i in range(arch.refiner_depth)]
    for ours_prefix, theirs_prefix in groups:
        for ours, theirs in table.items():
            mapping[f"{ours_prefix}/{ours}"] = f"{theirs_prefix}.{theirs}"
    return mapping


def z_image_omni_key_map(arch) -> Dict[str, Any]:
    """Z-Image Omni layout (reference helpers/models/z_image_omni/transformer.py
    ZImageOmniTransformer2DModel): diffusers Attention naming inside
    ``attention``, SwiGLU ``feed_forward.w1/w2/w3``, per-patch ModuleDict
    embedders keyed "patch-fpatch" (:608-618)."""
    patch_key = f"{arch.patch_size}-1"
    mapping: Dict[str, Any] = {
        "x_embedder": f"all_x_embedder.{patch_key}",
        "cap_embedder": "cap_embedder.1",
        "siglip_embedder": "siglip_embedder.1",
        "final_linear": f"all_final_layer.{patch_key}.linear",
    }
    table = {
        "attn_q": "attention.to_q", "attn_k": "attention.to_k",
        "attn_v": "attention.to_v", "attn_proj": "attention.to_out.0",
        "feed_forward/w1": "feed_forward.w1",
        "feed_forward/w2": "feed_forward.w2",
        "feed_forward/w3": "feed_forward.w3",
    }
    groups = [(f"layer_{i}", f"layers.{i}") for i in range(arch.depth)]
    groups += [(f"noise_refiner_{i}", f"noise_refiner.{i}") for i in range(arch.refiner_depth)]
    groups += [(f"context_refiner_{i}", f"context_refiner.{i}") for i in range(arch.refiner_depth)]
    groups += [(f"siglip_refiner_{i}", f"siglip_refiner.{i}") for i in range(arch.refiner_depth)]
    for ours_prefix, theirs_prefix in groups:
        for ours, theirs in table.items():
            mapping[f"{ours_prefix}/{ours}"] = f"{theirs_prefix}.{theirs}"
    return mapping


def zlab_i1_key_map(arch) -> Dict[str, Any]:
    """Zlab i1 U-ViT layout (reference helpers/models/zlab_i1/transformer.py):
    in_blocks/mid_block/out_blocks with fused per-modality qkv, SwiGLU w12/w3,
    skip linears on out blocks; DEFAULT_LORA_TARGET model.py:47-55."""
    mapping: Dict[str, Any] = {
        "final_linear": "final_layer.linear",
        "text_adapter/connector_in": "text_encoder_adapter.connector_in",
    }
    table = {
        "qkv_image": "attn.qkv_image", "qkv_text": "attn.qkv_text",
        "proj_image": "attn.proj_image", "proj_text": "attn.proj_text",
        "mlp_image/w12": "mlp_image.w12", "mlp_image/w3": "mlp_image.w3",
        "mlp_text/w12": "mlp_text.w12", "mlp_text/w3": "mlp_text.w3",
    }
    groups = [("mid", "mid_block")]
    groups += [(f"in_{i}", f"in_blocks.{i}") for i in range(arch.num_in_blocks)]
    groups += [(f"out_{i}", f"out_blocks.{i}") for i in range(arch.num_in_blocks)]
    for ours_prefix, theirs_prefix in groups:
        for ours, theirs in table.items():
            mapping[f"{ours_prefix}/{ours}"] = f"{theirs_prefix}.{theirs}"
        if ours_prefix.startswith("out_"):
            mapping[f"{ours_prefix}/skip_image"] = f"{theirs_prefix}.skip_linear_image"
            mapping[f"{ours_prefix}/skip_text"] = f"{theirs_prefix}.skip_linear_text"
    return mapping


def sana_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "attn1_q": "attn1.to_q", "attn1_k": "attn1.to_k", "attn1_v": "attn1.to_v",
        "attn1_proj": "attn1.to_out.0",
        "attn2_q": "attn2.to_q", "attn2_k": "attn2.to_k", "attn2_v": "attn2.to_v",
        "attn2_proj": "attn2.to_out.0",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def auraflow_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    joint = {
        "attn_q": "attn.to_q", "attn_k": "attn.to_k", "attn_v": "attn.to_v",
        "attn_add_q": "attn.add_q_proj", "attn_add_k": "attn.add_k_proj",
        "attn_add_v": "attn.add_v_proj",
        "attn_proj": "attn.to_out.0", "attn_add_proj": "attn.to_add_out",
        "ff/linear_1": "ff.linear_1", "ff/linear_2": "ff.linear_2",
        "ff/out_projection": "ff.out_projection",
        "ff_context/linear_1": "ff_context.linear_1",
        "ff_context/linear_2": "ff_context.linear_2",
        "ff_context/out_projection": "ff_context.out_projection",
    }
    for layer in range(arch.depth_double):
        for ours, theirs in joint.items():
            mapping[f"double_{layer}/{ours}"] = f"joint_transformer_blocks.{layer}.{theirs}"
    single = {
        "attn_q": "attn.to_q", "attn_k": "attn.to_k", "attn_v": "attn.to_v",
        "attn_proj": "attn.to_out.0",
        "ff/linear_1": "ff.linear_1", "ff/linear_2": "ff.linear_2",
        "ff/out_projection": "ff.out_projection",
    }
    for layer in range(arch.depth_single):
        for ours, theirs in single.items():
            mapping[f"single_{layer}/{ours}"] = f"single_transformer_blocks.{layer}.{theirs}"
    return mapping


def ltx_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "attn1_q": "attn1.to_q", "attn1_k": "attn1.to_k", "attn1_v": "attn1.to_v",
        "attn1_proj": "attn1.to_out.0",
        "attn2_q": "attn2.to_q", "attn2_k": "attn2.to_k", "attn2_v": "attn2.to_v",
        "attn2_proj": "attn2.to_out.0",
        "ff_in": "ff.net.0.proj", "ff_out": "ff.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def qwen_image_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "img_attn_q": "attn.to_q", "img_attn_k": "attn.to_k", "img_attn_v": "attn.to_v",
        "txt_attn_q": "attn.add_q_proj", "txt_attn_k": "attn.add_k_proj",
        "txt_attn_v": "attn.add_v_proj",
        "img_attn_proj": "attn.to_out.0", "txt_attn_proj": "attn.to_add_out",
        "img_mlp_in": "img_mlp.net.0.proj", "img_mlp_out": "img_mlp.net.2",
        "txt_mlp_in": "txt_mlp.net.0.proj", "txt_mlp_out": "txt_mlp.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


def hunyuanvideo_key_map(arch) -> Dict[str, Any]:
    mapping: Dict[str, Any] = {}
    table = {
        "img_attn_q": "attn.to_q", "img_attn_k": "attn.to_k", "img_attn_v": "attn.to_v",
        "txt_attn_q": "attn.add_q_proj", "txt_attn_k": "attn.add_k_proj",
        "txt_attn_v": "attn.add_v_proj",
        "img_attn_proj": "attn.to_out.0", "txt_attn_proj": "attn.to_add_out",
        "img_mlp_in": "ff.net.0.proj", "img_mlp_out": "ff.net.2",
        "txt_mlp_in": "ff_context.net.0.proj", "txt_mlp_out": "ff_context.net.2",
    }
    for layer in range(arch.depth):
        for ours, theirs in table.items():
            mapping[f"block_{layer}/{ours}"] = f"transformer_blocks.{layer}.{theirs}"
    return mapping


# family name -> key map builder; families riding another family's architecture
# reuse its map (reference lora_format.py resolves by module names the same way)
_KEY_MAPS = {
    "flux": lambda m: flux_key_map(m.arch),
    "flux2": lambda m: flux2_key_map(m.arch),
    "ace_step": lambda m: acestep_key_map(m.arch),
    "ltxvideo2": lambda m: ltx2_key_map(m.arch),
    "cosmos3": lambda m: cosmos3_key_map(m.arch),
    "krea2": lambda m: krea2_key_map(m.arch),
    "mageflow": lambda m: qwen_image_key_map(m.arch),
    "z_image": lambda m: qwen_image_key_map(m.arch),
    "z_image_omni": lambda m: z_image_omni_key_map(m.arch),
    "zlab_i1": lambda m: zlab_i1_key_map(m.arch),
    "longcat_image": lambda m: flux_key_map(m.arch),
    "boogu_image": lambda m: lumina2_key_map(m.arch),
    "chroma": lambda m: flux_key_map(m.arch),
    "sd1x": lambda m: unet_key_map(m.arch),
    "sd2x": lambda m: unet_key_map(m.arch),
    "sdxl": lambda m: unet_key_map(m.arch),
    "kolors": lambda m: unet_key_map(m.arch),
    "deepfloyd": lambda m: unet_key_map(m.arch),
    "sd3": lambda m: sd3_key_map(m.arch),
    "wan": lambda m: wan_key_map(m.arch),
    "wan_s2v": lambda m: wan_key_map(m.arch),
    "kandinsky5_video": lambda m: kandinsky5_key_map(m.arch),
    "longcat_video": lambda m: longcat_video_key_map(m.arch),
    "pixart_sigma": lambda m: pixart_key_map(m.arch),
    "anima": lambda m: anima_key_map(m.arch),
    "cosmos": lambda m: cosmos1_core_key_map(m.arch),
    "ideogram": lambda m: ideogram_key_map(m.arch),
    "kandinsky5_image": lambda m: kandinsky5_key_map(m.arch),
    "ernie": lambda m: ernie_key_map(m.arch),
    "stable_cascade": lambda m: stable_cascade_key_map(m.arch),
    "lumina2": lambda m: lumina2_key_map(m.arch),
    "hidream": lambda m: hidream_key_map(m.arch),
    "sana": lambda m: sana_key_map(m.arch),
    "sanavideo": lambda m: sanavideo_key_map(m.arch),
    "auraflow": lambda m: auraflow_key_map(m.arch),
    "ltxvideo": lambda m: ltx_key_map(m.arch),
    "qwen_image": lambda m: qwen_image_key_map(m.arch),
    "hunyuanvideo": lambda m: hunyuanvideo_key_map(m.arch),
}


def _key_map_for(model) -> Dict[str, Any]:
    builder = _KEY_MAPS.get(model.NAME)
    if builder is not None:
        return builder(model)
    # generic: keep flax path with slashes -> dots
    return {}


# ---------------------------------------------------------------------------------
# Export
# ---------------------------------------------------------------------------------


def lora_state_dict(
    model,
    lora_params: Dict[str, Any],
    format: str = "diffusers",
    alpha: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Build the torch-layout state dict for safetensors serialization."""
    flat = flatten_lora(lora_params)
    key_map = _key_map_for(model)
    prefix = "transformer." if model.MODEL_TYPE == "transformer" else "unet."
    alpha = alpha if alpha is not None else float(model.lora_alpha or model.lora_rank)

    tensors: Dict[str, np.ndarray] = {}
    for path, leaves in flat.items():
        target = key_map.get(path, path.replace("/", "."))
        if "lokr_w1" in leaves:
            # LyCORIS LoKr layout: lycoris_<module>.lokr_w1/.lokr_w2/.alpha.
            # No transformer./unet. prefix: lycoris wraps the transformer itself,
            # so module names start at the block path (reference
            # scripts/extract_lycoris_adapter.py lycoris_module_name).
            module = (target if isinstance(target, str) else target[0][0]).replace(".", "_")
            tensors[f"lycoris_{module}.lokr_w1"] = np.ascontiguousarray(leaves["lokr_w1"].T)
            tensors[f"lycoris_{module}.lokr_w2"] = np.ascontiguousarray(leaves["lokr_w2"].T)
            tensors[f"lycoris_{module}.alpha"] = np.asarray(alpha, np.float32)
            continue
        if "loha_w1_a" in leaves:
            # LyCORIS LoHa layout: hada_w1_a (out,r) / hada_w1_b (r,in) in
            # torch orientation — ΔW_torch = ΔW_flaxᵀ means (A·B)ᵀ = Bᵀ·Aᵀ,
            # so torch w_a := our Bᵀ and torch w_b := our Aᵀ
            module = (target if isinstance(target, str) else target[0][0]).replace(".", "_")
            tensors[f"lycoris_{module}.hada_w1_a"] = np.ascontiguousarray(leaves["loha_w1_b"].T)
            tensors[f"lycoris_{module}.hada_w1_b"] = np.ascontiguousarray(leaves["loha_w1_a"].T)
            tensors[f"lycoris_{module}.hada_w2_a"] = np.ascontiguousarray(leaves["loha_w2_b"].T)
            tensors[f"lycoris_{module}.hada_w2_b"] = np.ascontiguousarray(leaves["loha_w2_a"].T)
            tensors[f"lycoris_{module}.alpha"] = np.asarray(alpha, np.float32)
            continue
        if "ia3_scale" in leaves:
            # LyCORIS (IA)³ layout: per-module weight vector (output channels)
            module = (target if isinstance(target, str) else target[0][0]).replace(".", "_")
            tensors[f"lycoris_{module}.w"] = np.ascontiguousarray(leaves["ia3_scale"])
            continue
        a = leaves["lora_A"]  # (in, r)
        b = leaves["lora_B"]  # (r, out)
        dora_m = leaves.get("dora_m")  # (out,) DoRA magnitude (PEFT use_dora)
        if isinstance(target, list):  # fused projection: shared A, sliced B
            for name, start, end in target:
                _emit(tensors, prefix + name, a, b[:, start:end], alpha, format)
                if dora_m is not None:
                    tensors[f"{prefix}{name}.lora_magnitude_vector.weight"] = (
                        np.ascontiguousarray(dora_m[start:end]))
        else:
            _emit(tensors, prefix + target, a, b, alpha, format)
            if dora_m is not None:
                tensors[f"{prefix}{target}.lora_magnitude_vector.weight"] = (
                    np.ascontiguousarray(dora_m))
    return tensors


def _emit(tensors, module, a, b, alpha, format):
    if format == "diffusers":
        tensors[f"{module}.lora_A.weight"] = np.ascontiguousarray(a.T)  # (r, in)
        tensors[f"{module}.lora_B.weight"] = np.ascontiguousarray(b.T)  # (out, r)
    elif format == "comfyui":
        key = "diffusion_model." + module.removeprefix("transformer.").removeprefix("unet.")
        tensors[f"{key}.lora_down.weight"] = np.ascontiguousarray(a.T)
        tensors[f"{key}.lora_up.weight"] = np.ascontiguousarray(b.T)
        tensors[f"{key}.alpha"] = np.asarray(alpha, np.float32)
    else:
        raise ValueError(f"unknown lora export format {format!r}")


def save_lora_safetensors(
    model,
    lora_params: Dict[str, Any],
    path: str,
    format: str = "diffusers",
    metadata: Optional[Dict[str, str]] = None,
    extra_tensors: Optional[Dict[str, Any]] = None,
) -> None:
    from safetensors.numpy import save_file

    tensors = lora_state_dict(model, lora_params, format=format)
    if extra_tensors:
        # text-encoder LoRA layers ride the same file under "text_encoder."
        # prefixes (reference save_hooks text_encoder_lora_layers)
        tensors.update({k: np.asarray(v) for k, v in extra_tensors.items()})
    meta = {"format": "pt"}
    if metadata:
        meta.update({k: str(v) for k, v in metadata.items()})
    save_file(tensors, path, metadata=meta)


# ---------------------------------------------------------------------------------
# Import
# ---------------------------------------------------------------------------------


def load_lora_safetensors(model, path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load a diffusers- or ComfyUI-layout LoRA file into our lora pytree.

    ``template``: an initialized lora collection providing the expected
    structure/shapes (e.g. from ``model.init_params``).
    """
    from safetensors.numpy import load_file

    raw = load_file(path)
    # normalize ComfyUI naming to diffusers
    normalized: Dict[str, np.ndarray] = {}
    for key, value in raw.items():
        key = key.replace("diffusion_model.", "transformer.")
        key = key.replace(".lora_down.weight", ".lora_A.weight")
        key = key.replace(".lora_up.weight", ".lora_B.weight")
        key = key.replace(".lora.down.weight", ".lora_A.weight")
        key = key.replace(".lora.up.weight", ".lora_B.weight")
        normalized[key] = value

    key_map = _key_map_for(model)
    prefix = "transformer." if model.MODEL_TYPE == "transformer" else "unet."
    flat_template = flatten_lora(template)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    missing: List[str] = []
    for path_key, leaves in flat_template.items():
        target = key_map.get(path_key, path_key.replace("/", "."))
        module = "lycoris_" + (
            target if isinstance(target, str) else target[0][0]
        ).replace(".", "_")
        if "lokr_w1" in leaves:
            if f"{module}.lokr_w1" in normalized:
                out[path_key] = {
                    "lokr_w1": normalized[f"{module}.lokr_w1"].T.astype(np.float32),
                    "lokr_w2": normalized[f"{module}.lokr_w2"].T.astype(np.float32),
                }
            else:
                missing.append(path_key)
                out[path_key] = leaves
            continue
        if "loha_w1_a" in leaves:
            if f"{module}.hada_w1_a" in normalized:
                out[path_key] = {
                    "loha_w1_a": normalized[f"{module}.hada_w1_b"].T.astype(np.float32),
                    "loha_w1_b": normalized[f"{module}.hada_w1_a"].T.astype(np.float32),
                    "loha_w2_a": normalized[f"{module}.hada_w2_b"].T.astype(np.float32),
                    "loha_w2_b": normalized[f"{module}.hada_w2_a"].T.astype(np.float32),
                }
            else:
                missing.append(path_key)
                out[path_key] = leaves
            continue
        if "ia3_scale" in leaves:
            if f"{module}.w" in normalized:
                out[path_key] = {"ia3_scale": normalized[f"{module}.w"].astype(np.float32)}
            else:
                missing.append(path_key)
                out[path_key] = leaves
            continue
        if isinstance(target, list):
            # fused projection: rebuild shared-A + sliced-B; if the file's parts
            # have differing A matrices, concatenate ranks (block-diagonal B)
            parts = []
            for name, start, end in target:
                a_key = f"{prefix}{name}.lora_A.weight"
                b_key = f"{prefix}{name}.lora_B.weight"
                if a_key not in normalized:
                    parts = None
                    break
                parts.append((normalized[a_key], normalized[b_key], start, end))
            if not parts:
                missing.append(path_key)
                out[path_key] = leaves
                continue
            a_first = parts[0][0]
            same_a = all(p[0].shape == a_first.shape and np.allclose(p[0], a_first) for p in parts)
            total_out = leaves["lora_B"].shape[1]
            if same_a:
                a = a_first.T  # (in, r)
                b = np.zeros((a.shape[1], total_out), np.float32)
                for _, b_part, start, end in parts:
                    b[:, start:end] = b_part.T
            else:
                a = np.concatenate([p[0].T for p in parts], axis=1)  # (in, sum_r)
                b = np.zeros((a.shape[1], total_out), np.float32)
                offset = 0
                for a_part, b_part, start, end in parts:
                    r = a_part.shape[0]
                    b[offset: offset + r, start:end] = b_part.T
                    offset += r
            out[path_key] = {"lora_A": a.astype(np.float32), "lora_B": b.astype(np.float32)}
            if "dora_m" in leaves:
                m = np.array(leaves["dora_m"], np.float32, copy=True)
                for name, start, end in target:
                    m_key = f"{prefix}{name}.lora_magnitude_vector.weight"
                    if m_key in normalized:
                        m[start:end] = normalized[m_key]
                out[path_key]["dora_m"] = m
        else:
            a_key = f"{prefix}{target}.lora_A.weight"
            b_key = f"{prefix}{target}.lora_B.weight"
            if a_key in normalized:
                out[path_key] = {
                    "lora_A": normalized[a_key].T.astype(np.float32),
                    "lora_B": normalized[b_key].T.astype(np.float32),
                }
                if "dora_m" in leaves:
                    m_key = f"{prefix}{target}.lora_magnitude_vector.weight"
                    out[path_key]["dora_m"] = (
                        normalized[m_key].astype(np.float32)
                        if m_key in normalized
                        else np.asarray(leaves["dora_m"], np.float32)
                    )
            else:
                missing.append(path_key)
                out[path_key] = leaves
    return unflatten_lora(out)


def merge_lora_into_params(params, lora_params, scale: float = 1.0):
    """Fold B·A into the base kernels (for full-model export of a LoRA run)."""
    import jax

    flat = flatten_lora(lora_params)

    def walk(node, lora_node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, value in node.items():
            sub_lora = lora_node.get(key, {}) if isinstance(lora_node, dict) else {}
            if (
                isinstance(value, dict)
                and "kernel" in value
                and isinstance(sub_lora, dict)
                and "lora_A" in sub_lora
            ):
                a = np.asarray(sub_lora["lora_A"], np.float32)
                b = np.asarray(sub_lora["lora_B"], np.float32)
                kernel = np.asarray(value["kernel"], np.float32) + scale * (a @ b)
                out[key] = dict(value, kernel=kernel.astype(np.asarray(value["kernel"]).dtype))
            else:
                out[key] = walk(value, sub_lora)
        return out

    return walk(params, lora_params)


def merge_lora_into_variables(variables, lora_params, scale: float = 1.0):
    """Fold ``scale * (A @ B)`` into base kernels, including quantized ones.

    Unquantized runs defer to :func:`merge_lora_into_params`.  When the base
    was quantized after the original merge (``qscales`` collection present —
    trainer order: assistant merge, then ``quantize_params``), an adapter
    re-scale has to go through dequant -> add -> requant per touched kernel,
    refreshing the per-output-channel scale so the delta is not clipped by the
    stale absmax.  Used by the assistant-LoRA inference-strength path
    (reference: configure_assistant_lora_for_inference reweights the frozen
    assistant adapter for validation, helpers/models/common.py:722-760).
    """
    if variables.get("qscales") is None:
        return dict(variables, params=merge_lora_into_params(variables["params"], lora_params, scale))

    qscales_out: dict = {}

    def walk(node, lora_node, qnode):
        if not isinstance(node, dict):
            return node, qnode
        out = {}
        q_out = {}
        for key, value in node.items():
            sub_lora = lora_node.get(key, {}) if isinstance(lora_node, dict) else {}
            sub_q = qnode.get(key, {}) if isinstance(qnode, dict) else {}
            has_delta = isinstance(sub_lora, dict) and "lora_A" in sub_lora
            if isinstance(value, dict) and "kernel" in value and has_delta:
                kernel = np.asarray(value["kernel"])
                a = np.asarray(sub_lora["lora_A"], np.float32)
                b = np.asarray(sub_lora["lora_B"], np.float32)
                kscale = sub_q.get("kernel_scale") if isinstance(sub_q, dict) else None
                if kernel.dtype == np.int8 and kscale is not None:
                    s = np.asarray(kscale, np.float32)
                    dense = kernel.astype(np.float32) * s[None, :] + scale * (a @ b)
                    new_s = np.maximum(np.abs(dense).max(axis=0) / 127.0, 1e-12)
                    out[key] = dict(
                        value,
                        kernel=np.clip(np.round(dense / new_s[None, :]), -127, 127).astype(np.int8),
                    )
                    q_out[key] = dict(sub_q, kernel_scale=new_s.astype(np.float32))
                elif str(kernel.dtype) == "float8_e4m3fn" and kscale is not None:
                    s = np.asarray(kscale, np.float32)
                    dense = kernel.astype(np.float32) * s[None, :] + scale * (a @ b)
                    new_s = np.maximum(np.abs(dense).max(axis=0) / 448.0, 1e-12)
                    import jax.numpy as jnp

                    out[key] = dict(
                        value,
                        kernel=np.asarray(
                            jnp.asarray(dense / new_s[None, :]).astype(jnp.float8_e4m3fn)
                        ),
                    )
                    q_out[key] = dict(sub_q, kernel_scale=new_s.astype(np.float32))
                else:
                    dense = kernel.astype(np.float32) + scale * (a @ b)
                    out[key] = dict(value, kernel=dense.astype(kernel.dtype))
                    q_out[key] = sub_q
            elif (
                has_delta
                and isinstance(sub_q, dict)
                and "kernel_packed" in sub_q
            ):
                raise ValueError(
                    "assistant-LoRA inference re-strength is not supported with an "
                    "int4-packed base; set assistant_lora_inference_strength equal "
                    "to assistant_lora_strength or use int8/fp8"
                )
            elif isinstance(value, dict):
                sub_out, sub_q_out = walk(value, sub_lora, sub_q)
                out[key] = sub_out
                q_out[key] = sub_q_out
            else:
                out[key] = value
                if key in (qnode or {}):
                    q_out[key] = qnode[key]
        # keep qscale leaves for kernels this subtree did not touch
        if isinstance(qnode, dict):
            for key, qval in qnode.items():
                if key not in q_out:
                    q_out[key] = qval
        return out, q_out

    params_out, qscales_out = walk(variables["params"], lora_params, variables["qscales"])
    return dict(variables, params=params_out, qscales=qscales_out)
