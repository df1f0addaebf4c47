"""Full-rank / full-pipeline export: flax params → torch-layout safetensors.

Reference: helpers/training/save_hooks.py:271 (SaveHookManager model-type-aware
save) and :44,344 (_FSDP2PipelineExportSpec) — a finished full-rank fine-tune
must leave artifacts diffusers/ComfyUI can load, not just internal (Orbax)
checkpoints (SURVEY.md §5.4 "identical on-disk export formats").

Each ``export_*`` function is the exact inverse of the corresponding importer
in ``weight_import.py`` (diffusers key layout); round-trip tests in
tests/test_weight_export.py prove export→import bitwise identity.  All
transforms here are permutations of elements (transpose / concat / slice /
reorder), so inversion is exact in every dtype.

``save_full_pipeline`` writes the diffusers directory layout::

    out_dir/
      model_index.json                    (class + base-pipeline pointer)
      transformer/ (or unet/, controlnet/)
        config.json                       (arch fields)
        diffusion_pytorch_model.safetensors

The untouched frozen components (VAE, text encoders) are referenced from the
base model repo in model_index.json rather than re-serialized, like the
reference's save hooks do when exporting adapters-free pipelines.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from .weight_import import _flux_pack_permutation

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------------
# primitives (inverses of weight_import._linear/_scale/_conv/_norm)
# ---------------------------------------------------------------------------------


def _np(value) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(value, np.float32))


def _put_linear(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    out[f"{key}.weight"] = _np(node["kernel"]).T.copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def _put_scale(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    out[key] = _np(node["scale"])


def _put_conv(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    # flax (kh, kw, I, O) -> torch (O, I, kh, kw)
    out[f"{key}.weight"] = _np(node["kernel"]).transpose(3, 2, 0, 1).copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def _put_norm(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    out[f"{key}.weight"] = _np(node["scale"])
    out[f"{key}.bias"] = _np(node["bias"])


def _swap_halves_back(node: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of weight_import._swap_halves_linear (a half-swap is an involution)."""
    kernel = _np(node["kernel"])
    half = kernel.shape[1] // 2
    out = {"kernel": np.concatenate([kernel[:, half:], kernel[:, :half]], axis=1)}
    if "bias" in node:
        bias = _np(node["bias"])
        out["bias"] = np.concatenate([bias[half:], bias[:half]])
    return out


# ---------------------------------------------------------------------------------
# Flux (inverse of flux_params_from_diffusers; reference flux/model.py packing)
# ---------------------------------------------------------------------------------


def _flux_unpermute_io(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of weight_import._flux_permute_io: restore the reference
    (c, ph, pw) feature packing on img_in rows / final_proj columns."""
    params = dict(params)
    perm = _flux_pack_permutation(_np(params["img_in"]["kernel"]).shape[0])
    inv = np.argsort(perm)
    img_in = dict(params["img_in"])
    img_in["kernel"] = np.ascontiguousarray(_np(img_in["kernel"])[inv])
    params["img_in"] = img_in
    out_perm = _flux_pack_permutation(_np(params["final_proj"]["kernel"]).shape[1])
    out_inv = np.argsort(out_perm)
    final = dict(params["final_proj"])
    final["kernel"] = np.ascontiguousarray(_np(final["kernel"])[:, out_inv])
    if "bias" in final:
        final["bias"] = np.ascontiguousarray(_np(final["bias"])[out_inv])
    params["final_proj"] = final
    return params


def export_flux_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    """Inverse of weight_import.flux_params_from_diffusers."""
    p = _flux_unpermute_io(params)
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "x_embedder", p["img_in"])
    _put_linear(w, "context_embedder", p["txt_in"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_2", p["time_in"]["out_layer"])
    if "vector_in" in p:
        _put_linear(w, "time_text_embed.text_embedder.linear_1", p["vector_in"]["in_layer"])
        _put_linear(w, "time_text_embed.text_embedder.linear_2", p["vector_in"]["out_layer"])
    if "guidance_in" in p:
        _put_linear(w, "time_text_embed.guidance_embedder.linear_1", p["guidance_in"]["in_layer"])
        _put_linear(w, "time_text_embed.guidance_embedder.linear_2", p["guidance_in"]["out_layer"])
    _put_linear(w, "proj_out", p["final_proj"])
    _put_linear(w, "norm_out.linear", _swap_halves_back(p["final_mod"]["lin"]))

    for i in range(arch.depth_double):
        b = p[f"double_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_linear(w, f"{dst}.norm1.linear", b["img_mod"]["lin"])
        _put_linear(w, f"{dst}.norm1_context.linear", b["txt_mod"]["lin"])
        _put_linear(w, f"{dst}.attn.to_q", b["img_attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["img_attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["img_attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["txt_attn_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["txt_attn_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["txt_attn_v"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["img_attn_norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["img_attn_norm_k"])
        _put_scale(w, f"{dst}.attn.norm_added_q.weight", b["txt_attn_norm_q"])
        _put_scale(w, f"{dst}.attn.norm_added_k.weight", b["txt_attn_norm_k"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["img_attn_proj"])
        _put_linear(w, f"{dst}.attn.to_add_out", b["txt_attn_proj"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["img_mlp"]["proj_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["img_mlp"]["proj_out"])
        _put_linear(w, f"{dst}.ff_context.net.0.proj", b["txt_mlp"]["proj_in"])
        _put_linear(w, f"{dst}.ff_context.net.2", b["txt_mlp"]["proj_out"])

    dim = arch.hidden_size
    for i in range(arch.depth_single):
        b = p[f"single_{i}"]
        dst = f"single_transformer_blocks.{i}"
        rows = _np(b["linear1"]["kernel"]).T  # (3d+mlp, d)
        bias = _np(b["linear1"]["bias"])
        w[f"{dst}.attn.to_q.weight"] = rows[:dim].copy()
        w[f"{dst}.attn.to_k.weight"] = rows[dim: 2 * dim].copy()
        w[f"{dst}.attn.to_v.weight"] = rows[2 * dim: 3 * dim].copy()
        w[f"{dst}.proj_mlp.weight"] = rows[3 * dim:].copy()
        w[f"{dst}.attn.to_q.bias"] = bias[:dim].copy()
        w[f"{dst}.attn.to_k.bias"] = bias[dim: 2 * dim].copy()
        w[f"{dst}.attn.to_v.bias"] = bias[2 * dim: 3 * dim].copy()
        w[f"{dst}.proj_mlp.bias"] = bias[3 * dim:].copy()
        _put_linear(w, f"{dst}.proj_out", b["linear2"])
        _put_linear(w, f"{dst}.norm.linear", b["modulation"]["lin"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["norm_k"])
    return w


def export_flux_controlnet_to_diffusers(params: Dict[str, Any], arch, depth: int) -> Dict[str, np.ndarray]:
    """Flux ControlNet branch → diffusers FluxControlNetModel-style keys.

    The branch is the double-stream stack (exported with the same block key
    map as the host transformer) plus ``controlnet_x_embedder`` (control-token
    zero-init projection) and per-block ``controlnet_blocks.N`` residual
    projections (diffusers FluxControlNetModel layout).
    """
    w: Dict[str, np.ndarray] = {}
    p = dict(params)
    # reuse the double-block exporter by synthesizing a flux-shaped tree
    class _Depths:
        depth_double = depth
        depth_single = 0
        hidden_size = arch.hidden_size

    host_tree = {
        "img_in": p["img_in"],
        "txt_in": p["txt_in"],
        "time_in": p["time_in"],
        "vector_in": p["vector_in"],
        # identity modulation/projection placeholders are NOT exported: the
        # controlnet branch has no final head — strip after export
        "final_proj": {"kernel": np.zeros((arch.hidden_size, 4), np.float32)},
        "final_mod": {"lin": {"kernel": np.zeros((arch.hidden_size, 2), np.float32),
                              "bias": np.zeros((2,), np.float32)}},
    }
    if "guidance_in" in p:
        host_tree["guidance_in"] = p["guidance_in"]
    for i in range(depth):
        host_tree[f"double_{i}"] = p[f"double_{i}"]
    # flux exporter permutes img_in rows back to (c, ph, pw) order — correct
    # here too (same packed-latent input layout)
    exported = export_flux_to_diffusers(host_tree, _Depths)
    for key, value in exported.items():
        if key.startswith("proj_out") or key.startswith("norm_out"):
            continue
        w[key] = value
    # control-token projection: rows follow the same packing permutation as img_in
    control = dict(p["control_in"])
    perm_inv = np.argsort(_flux_pack_permutation(_np(control["kernel"]).shape[0]))
    control["kernel"] = np.ascontiguousarray(_np(control["kernel"])[perm_inv])
    _put_linear(w, "controlnet_x_embedder", control)
    for i in range(depth):
        _put_linear(w, f"controlnet_blocks.{i}", p[f"residual_proj_{i}"])
    return w


def import_flux_controlnet_from_diffusers(weights: Dict[str, np.ndarray], arch, depth: int) -> Dict[str, Any]:
    """Inverse of export_flux_controlnet_to_diffusers (round-trip + loading
    pretrained diffusers Flux ControlNets)."""
    from .weight_import import _linear, flux_params_from_diffusers

    class _Depths:
        depth_double = depth
        depth_single = 0
        hidden_size = arch.hidden_size

    # satisfy the host importer's mandatory head keys with placeholders
    dim = arch.hidden_size
    aug = dict(weights)
    aug.setdefault("proj_out.weight", np.zeros((4, dim), np.float32))
    aug.setdefault("proj_out.bias", np.zeros((4,), np.float32))
    aug.setdefault("norm_out.linear.weight", np.zeros((2, dim), np.float32))
    aug.setdefault("norm_out.linear.bias", np.zeros((2,), np.float32))
    host = flux_params_from_diffusers(aug, depth, 0)
    params: Dict[str, Any] = {
        "img_in": host["img_in"],
        "txt_in": host["txt_in"],
        "time_in": host["time_in"],
        "vector_in": host["vector_in"],
    }
    if "guidance_in" in host:
        params["guidance_in"] = host["guidance_in"]
    for i in range(depth):
        params[f"double_{i}"] = host[f"double_{i}"]
    control = _linear(weights, "controlnet_x_embedder")
    perm = _flux_pack_permutation(control["kernel"].shape[0])
    control["kernel"] = np.ascontiguousarray(control["kernel"][perm])
    params["control_in"] = control
    for i in range(depth):
        params[f"residual_proj_{i}"] = _linear(weights, f"controlnet_blocks.{i}")
    return params


def export_sd3_controlnet_to_diffusers(params: Dict[str, Any], arch, depth: int) -> Dict[str, np.ndarray]:
    """SD3 ControlNet branch → diffusers SD3ControlNetModel-style keys:
    host embedders + pos_embed_input (zero control projection, conv layout) +
    transformer_blocks.N (all context_pre_only=False) + controlnet_blocks.N."""
    p = params
    w: Dict[str, np.ndarray] = {}
    patch, dim = arch.patch_size, arch.hidden_size

    def put_patch_conv(dst: str, node: Dict[str, Any]) -> None:
        kernel = _np(node["kernel"])  # ((p·p·C), dim)
        channels = kernel.shape[0] // (patch * patch)
        w[f"{dst}.weight"] = kernel.reshape(patch, patch, channels, dim).transpose(3, 2, 0, 1).copy()
        if "bias" in node:
            w[f"{dst}.bias"] = _np(node["bias"])

    put_patch_conv("pos_embed.proj", p["patch_in"])
    put_patch_conv("pos_embed_input.proj", p["control_in"])
    if "pos_embed" in p:
        w["pos_embed.pos_embed"] = _np(p["pos_embed"]).reshape(1, -1, dim).copy()
    _put_linear(w, "context_embedder", p["context_in"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "time_text_embed.text_embedder.linear_1", p["pooled_in"]["in_layer"])
    _put_linear(w, "time_text_embed.text_embedder.linear_2", p["pooled_in"]["out_layer"])
    for i in range(depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_linear(w, f"{dst}.norm1.linear", b["img_mod"]["lin"])
        _put_linear(w, f"{dst}.norm1_context.linear", b["txt_mod"]["lin"])
        _put_linear(w, f"{dst}.attn.to_q", b["img_attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["img_attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["img_attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["txt_attn_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["txt_attn_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["txt_attn_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["img_attn_proj"])
        _put_linear(w, f"{dst}.attn.to_add_out", b["txt_attn_proj"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["img_mlp_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["img_mlp_out"])
        _put_linear(w, f"{dst}.ff_context.net.0.proj", b["txt_mlp_in"])
        _put_linear(w, f"{dst}.ff_context.net.2", b["txt_mlp_out"])
        if "img_attn_norm_q" in b:
            _put_scale(w, f"{dst}.attn.norm_q.weight", b["img_attn_norm_q"])
            _put_scale(w, f"{dst}.attn.norm_k.weight", b["img_attn_norm_k"])
            _put_scale(w, f"{dst}.attn.norm_added_q.weight", b["txt_attn_norm_q"])
            _put_scale(w, f"{dst}.attn.norm_added_k.weight", b["txt_attn_norm_k"])
        _put_linear(w, f"controlnet_blocks.{i}", p[f"residual_proj_{i}"])
    return w


def import_sd3_controlnet_from_diffusers(weights: Dict[str, np.ndarray], arch, depth: int) -> Dict[str, Any]:
    """Inverse of export_sd3_controlnet_to_diffusers."""
    from .weight_import import _linear, _scale, _to_f32

    w = weights
    patch, dim = arch.patch_size, arch.hidden_size

    def patch_conv(src: str) -> Dict[str, Any]:
        conv = _to_f32(w[f"{src}.weight"])
        node = {"kernel": np.ascontiguousarray(conv.transpose(2, 3, 1, 0).reshape(-1, dim))}
        if f"{src}.bias" in w:
            node["bias"] = _to_f32(w[f"{src}.bias"])
        return node

    params: Dict[str, Any] = {
        "patch_in": patch_conv("pos_embed.proj"),
        "control_in": patch_conv("pos_embed_input.proj"),
        "context_in": _linear(w, "context_embedder"),
        "time_in": {
            "in_layer": _linear(w, "time_text_embed.timestep_embedder.linear_1"),
            "out_layer": _linear(w, "time_text_embed.timestep_embedder.linear_2"),
        },
        "pooled_in": {
            "in_layer": _linear(w, "time_text_embed.text_embedder.linear_1"),
            "out_layer": _linear(w, "time_text_embed.text_embedder.linear_2"),
        },
    }
    if "pos_embed.pos_embed" in w:
        side = arch.pos_embed_max_size
        params["pos_embed"] = _to_f32(w["pos_embed.pos_embed"]).reshape(side, side, dim)
    for i in range(depth):
        src = f"transformer_blocks.{i}"
        block: Dict[str, Any] = {
            "img_mod": {"lin": _linear(w, f"{src}.norm1.linear")},
            "txt_mod": {"lin": _linear(w, f"{src}.norm1_context.linear")},
            "img_attn_q": _linear(w, f"{src}.attn.to_q"),
            "img_attn_k": _linear(w, f"{src}.attn.to_k"),
            "img_attn_v": _linear(w, f"{src}.attn.to_v"),
            "txt_attn_q": _linear(w, f"{src}.attn.add_q_proj"),
            "txt_attn_k": _linear(w, f"{src}.attn.add_k_proj"),
            "txt_attn_v": _linear(w, f"{src}.attn.add_v_proj"),
            "img_attn_proj": _linear(w, f"{src}.attn.to_out.0"),
            "txt_attn_proj": _linear(w, f"{src}.attn.to_add_out"),
            "img_mlp_in": _linear(w, f"{src}.ff.net.0.proj"),
            "img_mlp_out": _linear(w, f"{src}.ff.net.2"),
            "txt_mlp_in": _linear(w, f"{src}.ff_context.net.0.proj"),
            "txt_mlp_out": _linear(w, f"{src}.ff_context.net.2"),
        }
        if f"{src}.attn.norm_q.weight" in w:
            block["img_attn_norm_q"] = _scale(w, f"{src}.attn.norm_q.weight")
            block["img_attn_norm_k"] = _scale(w, f"{src}.attn.norm_k.weight")
            block["txt_attn_norm_q"] = _scale(w, f"{src}.attn.norm_added_q.weight")
            block["txt_attn_norm_k"] = _scale(w, f"{src}.attn.norm_added_k.weight")
        params[f"block_{i}"] = block
        params[f"residual_proj_{i}"] = _linear(w, f"controlnet_blocks.{i}")
    return params


def export_pixart_controlnet_to_diffusers(params: Dict[str, Any], arch, depth: int) -> Dict[str, np.ndarray]:
    """PixArt-δ ControlNet branch → host-style keys + pos_embed_input +
    controlnet_blocks.N (reference helpers/models/pixart ControlNet layout)."""
    p = params
    w: Dict[str, np.ndarray] = {}
    patch, dim = arch.patch_size, arch.hidden_size

    def put_patch_conv(dst: str, node: Dict[str, Any]) -> None:
        kernel = _np(node["kernel"])
        channels = kernel.shape[0] // (patch * patch)
        w[f"{dst}.weight"] = kernel.reshape(patch, patch, channels, dim).transpose(3, 2, 0, 1).copy()
        if "bias" in node:
            w[f"{dst}.bias"] = _np(node["bias"])

    put_patch_conv("pos_embed.proj", p["patch_in"])
    put_patch_conv("pos_embed_input.proj", p["control_in"])
    _put_linear(w, "caption_projection.linear_1", p["caption_in_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_in_2"])
    _put_linear(w, "adaln_single.emb.timestep_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "adaln_single.emb.timestep_embedder.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "adaln_single.linear", p["time_proj"])
    for i in range(depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        w[f"{dst}.scale_shift_table"] = _np(b["scale_shift_table"]).reshape(6, dim).copy()
        _put_linear(w, f"{dst}.attn1.to_q", b["attn1_q"])
        _put_linear(w, f"{dst}.attn1.to_k", b["attn1_k"])
        _put_linear(w, f"{dst}.attn1.to_v", b["attn1_v"])
        _put_linear(w, f"{dst}.attn1.to_out.0", b["attn1_proj"])
        _put_linear(w, f"{dst}.attn2.to_q", b["attn2_q"])
        _put_linear(w, f"{dst}.attn2.to_k", b["attn2_k"])
        _put_linear(w, f"{dst}.attn2.to_v", b["attn2_v"])
        _put_linear(w, f"{dst}.attn2.to_out.0", b["attn2_proj"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])
        _put_linear(w, f"controlnet_blocks.{i}", p[f"residual_proj_{i}"])
    return w


def import_pixart_controlnet_from_diffusers(weights: Dict[str, np.ndarray], arch, depth: int) -> Dict[str, Any]:
    """Inverse of export_pixart_controlnet_to_diffusers."""
    from .weight_import import _linear, _to_f32

    w = weights
    dim = arch.hidden_size

    def patch_conv(src: str) -> Dict[str, Any]:
        conv = _to_f32(w[f"{src}.weight"])
        node = {"kernel": np.ascontiguousarray(conv.transpose(2, 3, 1, 0).reshape(-1, dim))}
        if f"{src}.bias" in w:
            node["bias"] = _to_f32(w[f"{src}.bias"])
        return node

    params: Dict[str, Any] = {
        "patch_in": patch_conv("pos_embed.proj"),
        "control_in": patch_conv("pos_embed_input.proj"),
        "caption_in_1": _linear(w, "caption_projection.linear_1"),
        "caption_in_2": _linear(w, "caption_projection.linear_2"),
        "time_in": {
            "in_layer": _linear(w, "adaln_single.emb.timestep_embedder.linear_1"),
            "out_layer": _linear(w, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "time_proj": _linear(w, "adaln_single.linear"),
    }
    for i in range(depth):
        src = f"transformer_blocks.{i}"
        params[f"block_{i}"] = {
            "scale_shift_table": _to_f32(w[f"{src}.scale_shift_table"]).reshape(6, dim),
            "attn1_q": _linear(w, f"{src}.attn1.to_q"),
            "attn1_k": _linear(w, f"{src}.attn1.to_k"),
            "attn1_v": _linear(w, f"{src}.attn1.to_v"),
            "attn1_proj": _linear(w, f"{src}.attn1.to_out.0"),
            "attn2_q": _linear(w, f"{src}.attn2.to_q"),
            "attn2_k": _linear(w, f"{src}.attn2.to_k"),
            "attn2_v": _linear(w, f"{src}.attn2.to_v"),
            "attn2_proj": _linear(w, f"{src}.attn2.to_out.0"),
            "ff_in": _linear(w, f"{src}.ff.net.0.proj"),
            "ff_out": _linear(w, f"{src}.ff.net.2"),
        }
        params[f"residual_proj_{i}"] = _linear(w, f"controlnet_blocks.{i}")
    return params


# ---------------------------------------------------------------------------------
# SD3 (inverse of sd3_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_sd3_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    patch, dim = arch.patch_size, arch.hidden_size
    kernel = _np(p["patch_in"]["kernel"])  # ((p·p·C), dim)
    channels = kernel.shape[0] // (patch * patch)
    w["pos_embed.proj.weight"] = (
        kernel.reshape(patch, patch, channels, dim).transpose(3, 2, 0, 1).copy()
    )
    w["pos_embed.proj.bias"] = _np(p["patch_in"]["bias"])
    _put_linear(w, "context_embedder", p["context_in"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "time_text_embed.text_embedder.linear_1", p["pooled_in"]["in_layer"])
    _put_linear(w, "time_text_embed.text_embedder.linear_2", p["pooled_in"]["out_layer"])
    _put_linear(w, "norm_out.linear", _swap_halves_back(p["final_mod"]["lin"]))
    _put_linear(w, "proj_out", p["final_proj"])
    if "pos_embed" in p:
        table = _np(p["pos_embed"])  # (side, side, dim)
        w["pos_embed.pos_embed"] = table.reshape(1, -1, dim).copy()

    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        last = i == arch.depth - 1
        _put_linear(w, f"{dst}.norm1.linear", b["img_mod"]["lin"])
        if last:
            _put_linear(w, f"{dst}.norm1_context.linear", _swap_halves_back(b["txt_mod"]["lin"]))
        else:
            _put_linear(w, f"{dst}.norm1_context.linear", b["txt_mod"]["lin"])
            _put_linear(w, f"{dst}.attn.to_add_out", b["txt_attn_proj"])
            _put_linear(w, f"{dst}.ff_context.net.0.proj", b["txt_mlp_in"])
            _put_linear(w, f"{dst}.ff_context.net.2", b["txt_mlp_out"])
        _put_linear(w, f"{dst}.attn.to_q", b["img_attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["img_attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["img_attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["txt_attn_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["txt_attn_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["txt_attn_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["img_attn_proj"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["img_mlp_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["img_mlp_out"])
        if "img_attn_norm_q" in b:
            _put_scale(w, f"{dst}.attn.norm_q.weight", b["img_attn_norm_q"])
            _put_scale(w, f"{dst}.attn.norm_k.weight", b["img_attn_norm_k"])
            _put_scale(w, f"{dst}.attn.norm_added_q.weight", b["txt_attn_norm_q"])
            _put_scale(w, f"{dst}.attn.norm_added_k.weight", b["txt_attn_norm_k"])
    return w


# ---------------------------------------------------------------------------------
# Wan (inverse of wan_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_wan_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    dim = arch.hidden_size
    pt, ph, pw = arch.patch
    w: Dict[str, np.ndarray] = {}
    kernel = _np(p["patch_in"]["kernel"])  # ((pt·ph·pw·C), dim)
    channels = kernel.shape[0] // (pt * ph * pw)
    w["patch_embedding.weight"] = (
        kernel.reshape(pt, ph, pw, channels, dim).transpose(4, 3, 0, 1, 2).copy()
    )
    w["patch_embedding.bias"] = _np(p["patch_in"]["bias"])
    _put_linear(w, "condition_embedder.text_embedder.linear_1", p["text_in0"])
    _put_linear(w, "condition_embedder.text_embedder.linear_2", p["text_in2"])
    _put_linear(w, "condition_embedder.time_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "condition_embedder.time_embedder.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "condition_embedder.time_proj", p["time_proj"])
    w["scale_shift_table"] = _np(p["final_scale_shift_table"]).reshape(1, 2, dim).copy()
    _put_linear(w, "proj_out", p["final_proj"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"blocks.{i}"
        w[f"{dst}.scale_shift_table"] = _np(b["scale_shift_table"]).reshape(1, 6, dim).copy()
        _put_linear(w, f"{dst}.attn1.to_q", b["self_attn_q"])
        _put_linear(w, f"{dst}.attn1.to_k", b["self_attn_k"])
        _put_linear(w, f"{dst}.attn1.to_v", b["self_attn_v"])
        _put_linear(w, f"{dst}.attn1.to_out.0", b["self_attn_proj"])
        _put_linear(w, f"{dst}.attn2.to_q", b["cross_attn_q"])
        _put_linear(w, f"{dst}.attn2.to_k", b["cross_attn_k"])
        _put_linear(w, f"{dst}.attn2.to_v", b["cross_attn_v"])
        _put_linear(w, f"{dst}.attn2.to_out.0", b["cross_attn_proj"])
        _put_norm(w, f"{dst}.norm2", b["cross_norm"]["LayerNorm_0"])
        _put_linear(w, f"{dst}.ffn.net.0.proj", b["ffn_in"])
        _put_linear(w, f"{dst}.ffn.net.2", b["ffn_out"])
        if "self_attn_norm_q" in b:
            _put_scale(w, f"{dst}.attn1.norm_q.weight", b["self_attn_norm_q"])
            _put_scale(w, f"{dst}.attn1.norm_k.weight", b["self_attn_norm_k"])
            _put_scale(w, f"{dst}.attn2.norm_q.weight", b["cross_attn_norm_q"])
            _put_scale(w, f"{dst}.attn2.norm_k.weight", b["cross_attn_norm_k"])
    return w


# ---------------------------------------------------------------------------------
# Qwen-Image (inverse of qwen_image_params_from_diffusers; also mageflow/z_image)
# ---------------------------------------------------------------------------------


def export_qwen_image_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "img_in", p["img_in"])
    _put_linear(w, "txt_in", p["txt_in"])
    _put_scale(w, "txt_norm.weight", p["txt_norm"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "time_text_embed.timestep_embedder.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "norm_out.linear", p["final_mod"])
    _put_linear(w, "proj_out", p["final_proj"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_linear(w, f"{dst}.img_mod.1", b["img_mod"])
        _put_linear(w, f"{dst}.txt_mod.1", b["txt_mod"])
        _put_linear(w, f"{dst}.attn.to_q", b["img_attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["img_attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["img_attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["txt_attn_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["txt_attn_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["txt_attn_v"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["img_attn_norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["img_attn_norm_k"])
        _put_scale(w, f"{dst}.attn.norm_added_q.weight", b["txt_attn_norm_q"])
        _put_scale(w, f"{dst}.attn.norm_added_k.weight", b["txt_attn_norm_k"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["img_attn_proj"])
        _put_linear(w, f"{dst}.attn.to_add_out", b["txt_attn_proj"])
        _put_linear(w, f"{dst}.img_mlp.net.0.proj", b["img_mlp_in"])
        _put_linear(w, f"{dst}.img_mlp.net.2", b["img_mlp_out"])
        _put_linear(w, f"{dst}.txt_mlp.net.0.proj", b["txt_mlp_in"])
        _put_linear(w, f"{dst}.txt_mlp.net.2", b["txt_mlp_out"])
    return w


# ---------------------------------------------------------------------------------
# UNet (inverse of unet_params_from_diffusers: SD 1.x / 2.x / SDXL / Kolors)
# ---------------------------------------------------------------------------------


def _put_proj1x1(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any], as_conv: bool) -> None:
    weight = _np(node["kernel"]).T
    if as_conv:  # SD1.x layout stores spatial-transformer proj as 1x1 conv
        weight = weight[:, :, None, None]
    out[f"{key}.weight"] = weight.copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def _put_unet_resnet(w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any]) -> None:
    _put_norm(w, f"{dst}.norm1", b["GroupNorm_0"])
    _put_conv(w, f"{dst}.conv1", b["conv1"])
    _put_linear(w, f"{dst}.time_emb_proj", b["time_emb_proj"])
    _put_norm(w, f"{dst}.norm2", b["GroupNorm_1"])
    _put_conv(w, f"{dst}.conv2", b["conv2"])
    if "conv_shortcut" in b:
        _put_conv(w, f"{dst}.conv_shortcut", b["conv_shortcut"])


def _put_unet_tblock(w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any]) -> None:
    _put_norm(w, f"{dst}.norm1", b["norm1"])
    for attn in ("attn1", "attn2"):
        _put_linear(w, f"{dst}.{attn}.to_q", b[attn]["to_q"])
        _put_linear(w, f"{dst}.{attn}.to_k", b[attn]["to_k"])
        _put_linear(w, f"{dst}.{attn}.to_v", b[attn]["to_v"])
        _put_linear(w, f"{dst}.{attn}.to_out.0", b[attn]["to_out"])
    _put_norm(w, f"{dst}.norm2", b["norm2"])
    _put_norm(w, f"{dst}.norm3", b["norm3"])
    _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_proj"])
    _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])


def _put_unet_spatial(
    w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any], depth: int, proj_as_conv: bool
) -> None:
    _put_norm(w, f"{dst}.norm", b["GroupNorm_0"])
    _put_proj1x1(w, f"{dst}.proj_in", b["proj_in"], proj_as_conv)
    _put_proj1x1(w, f"{dst}.proj_out", b["proj_out"], proj_as_conv)
    for i in range(depth):
        _put_unet_tblock(w, f"{dst}.transformer_blocks.{i}", b[f"blocks_{i}"])


def export_unet_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    levels = len(arch.block_out_channels)
    lpb = arch.layers_per_block
    # SDXL stores spatial-transformer proj_in/out as Linear; SD1.x/2.x as 1x1
    # conv — add_embedding presence distinguishes the generations
    proj_as_conv = "add_embed_0" not in p

    def depth_at(level: int) -> int:
        return arch.transformer_layers[min(level, len(arch.transformer_layers) - 1)]

    _put_conv(w, "conv_in", p["conv_in"])
    _put_linear(w, "time_embedding.linear_1", p["time_embed_0"])
    _put_linear(w, "time_embedding.linear_2", p["time_embed_2"])
    _put_norm(w, "conv_norm_out", p["conv_norm_out"])
    _put_conv(w, "conv_out", p["conv_out"])
    _put_unet_resnet(w, "mid_block.resnets.0", p["mid_res_0"])
    _put_unet_resnet(w, "mid_block.resnets.1", p["mid_res_1"])
    _put_unet_spatial(w, "mid_block.attentions.0", p["mid_attn"], depth_at(levels - 1), proj_as_conv)
    if "add_embed_0" in p:
        _put_linear(w, "add_embedding.linear_1", p["add_embed_0"])
        _put_linear(w, "add_embedding.linear_2", p["add_embed_2"])

    for level in range(levels):
        has_attn = arch.cross_attention_blocks[level]
        for block in range(lpb):
            _put_unet_resnet(w, f"down_blocks.{level}.resnets.{block}", p[f"down_{level}_res_{block}"])
            if has_attn:
                _put_unet_spatial(
                    w, f"down_blocks.{level}.attentions.{block}",
                    p[f"down_{level}_attn_{block}"], depth_at(level), proj_as_conv,
                )
        if level < levels - 1:
            _put_conv(w, f"down_blocks.{level}.downsamplers.0.conv", p[f"down_{level}_downsample"]["conv"])

    for u in range(levels):
        level = levels - 1 - u
        has_attn = arch.cross_attention_blocks[level]
        for block in range(lpb + 1):
            _put_unet_resnet(w, f"up_blocks.{u}.resnets.{block}", p[f"up_{level}_res_{block}"])
            if has_attn:
                _put_unet_spatial(
                    w, f"up_blocks.{u}.attentions.{block}",
                    p[f"up_{level}_attn_{block}"], depth_at(level), proj_as_conv,
                )
        if level > 0:
            _put_conv(w, f"up_blocks.{u}.upsamplers.0.conv", p[f"up_{level}_upsample"]["conv"])
    return w


# ---------------------------------------------------------------------------------
# registry + pipeline writer
# ---------------------------------------------------------------------------------

_EXPORTERS = {
    "flux": export_flux_to_diffusers,
    "sd1x": export_unet_to_diffusers,
    "sd2x": export_unet_to_diffusers,
    "sdxl": export_unet_to_diffusers,
    "kolors": export_unet_to_diffusers,
    "deepfloyd": export_unet_to_diffusers,
    "sd3": export_sd3_to_diffusers,
    "wan": export_wan_to_diffusers,
    "qwen_image": export_qwen_image_to_diffusers,
    "mageflow": export_qwen_image_to_diffusers,
    "z_image": export_qwen_image_to_diffusers,
}

_DIFFUSERS_CLASS = {
    "flux": ("FluxTransformer2DModel", "FluxPipeline", "transformer"),
    "sd1x": ("UNet2DConditionModel", "StableDiffusionPipeline", "unet"),
    "sd2x": ("UNet2DConditionModel", "StableDiffusionPipeline", "unet"),
    "sdxl": ("UNet2DConditionModel", "StableDiffusionXLPipeline", "unet"),
    "kolors": ("UNet2DConditionModel", "KolorsPipeline", "unet"),
    "deepfloyd": ("UNet2DConditionModel", "IFPipeline", "unet"),
    "sd3": ("SD3Transformer2DModel", "StableDiffusion3Pipeline", "transformer"),
    "wan": ("WanTransformer3DModel", "WanPipeline", "transformer"),
    "qwen_image": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
    "mageflow": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
    "z_image": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
}


def get_exporter(family: str):
    return _EXPORTERS.get(family)


def save_torch_safetensors(weights: Dict[str, np.ndarray], path: str, metadata: Optional[Dict[str, str]] = None) -> None:
    """Write a torch-layout state dict via safetensors.numpy (fp32)."""
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in weights.items()}, path, metadata=metadata or {})


def save_full_pipeline(
    model,
    variables: Dict[str, Any],
    out_dir: str,
    metadata: Optional[Dict[str, str]] = None,
) -> str:
    """Export a full-rank fine-tune as a diffusers-layout directory.

    Returns the component directory written.  Raises NotImplementedError for
    families without a registered exporter (fail-loud: an inexportable full
    fine-tune should be surfaced, not silently left Orbax-only).
    """
    exporter = _EXPORTERS.get(model.NAME)
    if exporter is None:
        raise NotImplementedError(
            f"no full-pipeline exporter for family {model.NAME!r}; supported: "
            f"{sorted(_EXPORTERS)}"
        )
    cls, pipeline_cls, component = _DIFFUSERS_CLASS[model.NAME]
    weights = exporter(variables["params"], model.arch)
    component_dir = os.path.join(out_dir, component)
    save_torch_safetensors(
        weights,
        os.path.join(component_dir, "diffusion_pytorch_model.safetensors"),
        metadata=metadata,
    )
    import dataclasses

    arch_config: Dict[str, Any] = {"_class_name": cls}
    if dataclasses.is_dataclass(model.arch):
        arch_config.update(
            {k: (list(v) if isinstance(v, tuple) else v)
             for k, v in dataclasses.asdict(model.arch).items()}
        )
    with open(os.path.join(component_dir, "config.json"), "w") as fh:
        json.dump(arch_config, fh, indent=2)

    base = None
    for key in ("pretrained_model_name_or_path",):
        value = model.config.get(key) if hasattr(model.config, "get") else None
        if value:
            base = str(value)
    index = {
        "_class_name": pipeline_cls,
        "_base_model": base,
        component: ["diffusers", cls],
        "_comment": (
            "trained component exported by simpletuner_tpu; frozen components "
            "(vae/text encoders/scheduler) load from the base model repo"
        ),
    }
    with open(os.path.join(out_dir, "model_index.json"), "w") as fh:
        json.dump(index, fh, indent=2)
    logger.info("exported %s pipeline (%s) to %s", model.NAME, cls, component_dir)

    controlnet_exporters = {
        "flux": (export_flux_controlnet_to_diffusers, "FluxControlNetModel"),
        "sd3": (export_sd3_controlnet_to_diffusers, "SD3ControlNetModel"),
        "pixart_sigma": (export_pixart_controlnet_to_diffusers, "PixArtControlNetModel"),
    }
    if "controlnet" in variables and model.NAME in controlnet_exporters:
        exporter_fn, cn_cls = controlnet_exporters[model.NAME]
        depth = int(model.config.get("controlnet_depth", 2) or 2)
        cn = exporter_fn(variables["controlnet"], model.arch, depth)
        save_torch_safetensors(
            cn, os.path.join(out_dir, "controlnet", "diffusion_pytorch_model.safetensors"),
            metadata=metadata,
        )
        with open(os.path.join(out_dir, "controlnet", "config.json"), "w") as fh:
            json.dump({"_class_name": cn_cls, "num_layers": depth}, fh, indent=2)
    return component_dir
