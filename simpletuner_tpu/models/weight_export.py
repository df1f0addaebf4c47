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
    if "class_embed_0" in p:
        _put_linear(w, "class_embedding.linear_1", p["class_embed_0"])
        _put_linear(w, "class_embedding.linear_2", p["class_embed_2"])

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
# shared inverse helpers (inverses of weight_import's remaining primitives)
# ---------------------------------------------------------------------------------


def _put_ln(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    """Inverse of weight_import._ln ({'LayerNorm_0': {scale, bias}})."""
    _put_norm(out, key, node["LayerNorm_0"])


def _put_conv1d(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    """Inverse of weight_import._conv1d: flax (k, I, O) -> torch (O, I, k)."""
    out[f"{key}.weight"] = _np(node["kernel"]).transpose(2, 1, 0).copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def _put_conv_generic(out: Dict[str, np.ndarray], key: str, node: Dict[str, Any]) -> None:
    """Inverse of weight_import._conv_generic: flax (*s, I, O) -> torch (O, I, *s)."""
    kernel = _np(node["kernel"])
    n = kernel.ndim
    out[f"{key}.weight"] = kernel.transpose((n - 1, n - 2) + tuple(range(n - 2))).copy()
    if "bias" in node:
        out[f"{key}.bias"] = _np(node["bias"])


def _put_raw(out: Dict[str, np.ndarray], key: str, value, shape=None) -> None:
    """Inverse of a raw _to_f32(w[key]) passthrough (optionally un-reshaped)."""
    arr = _np(value)
    out[key] = arr.reshape(shape) if shape is not None else arr


def _put_timestep_mlp(out: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    """Inverse of the {in_layer, out_layer} timestep-embedder import idiom."""
    _put_linear(out, f"{src}.linear_1", node["in_layer"])
    _put_linear(out, f"{src}.linear_2", node["out_layer"])


# ---------------------------------------------------------------------------------
# PixArt (inverse of weight_import.pixart_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_pixart_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    dim = arch.hidden_size
    ps = arch.patch_size
    # flax (p*p*C, dim) dense kernel -> torch (dim, C, p, p) patch conv
    w["pos_embed.proj.weight"] = (
        _np(p["patch_in"]["kernel"]).reshape(ps, ps, arch.in_channels, dim)
        .transpose(3, 2, 0, 1).copy()
    )
    w["pos_embed.proj.bias"] = _np(p["patch_in"]["bias"])
    _put_linear(w, "caption_projection.linear_1", p["caption_in_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_in_2"])
    _put_timestep_mlp(w, "adaln_single.emb.timestep_embedder", p["time_in"])
    _put_linear(w, "adaln_single.linear", p["time_proj"])
    _put_raw(w, "scale_shift_table", p["final_scale_shift_table"], (2, dim))
    _put_linear(w, "proj_out", p["final_proj"])
    if "resolution_in" in p:
        _put_timestep_mlp(w, "adaln_single.emb.resolution_embedder", p["resolution_in"])
        _put_timestep_mlp(w, "adaln_single.emb.aspect_ratio_embedder", p["aspect_in"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"], (6, dim))
        for attn in ("attn1", "attn2"):
            _put_linear(w, f"{dst}.{attn}.to_q", b[f"{attn}_q"])
            _put_linear(w, f"{dst}.{attn}.to_k", b[f"{attn}_k"])
            _put_linear(w, f"{dst}.{attn}.to_v", b[f"{attn}_v"])
            _put_linear(w, f"{dst}.{attn}.to_out.0", b[f"{attn}_proj"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])
    return w


# ---------------------------------------------------------------------------------
# Sana (inverse of weight_import.sana_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_sana_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    dim = arch.hidden_size
    ps = arch.patch_size
    w["patch_embed.proj.weight"] = (
        _np(p["patch_in"]["kernel"]).reshape(ps, ps, arch.in_channels, dim)
        .transpose(3, 2, 0, 1).copy()
    )
    w["patch_embed.proj.bias"] = _np(p["patch_in"]["bias"])
    _put_linear(w, "caption_projection.linear_1", p["caption_in_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_in_2"])
    _put_scale(w, "caption_norm.weight", p["caption_norm"])
    _put_timestep_mlp(w, "time_embed.emb.timestep_embedder", p["time_in"])
    _put_linear(w, "time_embed.linear", p["time_proj"])
    _put_raw(w, "scale_shift_table", p["final_scale_shift_table"], (2, dim))
    _put_linear(w, "proj_out", p["final_proj"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"], (6, dim))
        for attn in ("attn1", "attn2"):
            _put_linear(w, f"{dst}.{attn}.to_q", b[f"{attn}_q"])
            _put_linear(w, f"{dst}.{attn}.to_k", b[f"{attn}_k"])
            _put_linear(w, f"{dst}.{attn}.to_v", b[f"{attn}_v"])
            _put_linear(w, f"{dst}.{attn}.to_out.0", b[f"{attn}_proj"])
        for conv in ("conv_inverted", "conv_depth", "conv_point"):
            _put_conv_generic(w, f"{dst}.ff.{conv}", b["ff"][conv])
    return w


# ---------------------------------------------------------------------------------
# LTX-Video v1 (inverse of weight_import.ltx_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_ltx_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    dim = arch.hidden_size
    _put_linear(w, "proj_in", p["patch_in"])
    _put_linear(w, "caption_projection.linear_1", p["caption_in_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_in_2"])
    _put_timestep_mlp(w, "time_embed.emb.timestep_embedder", p["time_in"])
    _put_linear(w, "time_embed.linear", p["time_proj"])
    _put_raw(w, "scale_shift_table", p["final_scale_shift_table"], (2, dim))
    _put_linear(w, "proj_out", p["final_proj"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"], (6, dim))
        for attn in ("attn1", "attn2"):
            _put_linear(w, f"{dst}.{attn}.to_q", b[f"{attn}_q"])
            _put_linear(w, f"{dst}.{attn}.to_k", b[f"{attn}_k"])
            _put_linear(w, f"{dst}.{attn}.to_v", b[f"{attn}_v"])
            _put_linear(w, f"{dst}.{attn}.to_out.0", b[f"{attn}_proj"])
            _put_scale(w, f"{dst}.{attn}.norm_q.weight", b[f"{attn}_norm_q"])
            _put_scale(w, f"{dst}.{attn}.norm_k.weight", b[f"{attn}_norm_k"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])
    return w


# ---------------------------------------------------------------------------------
# AuraFlow (inverse of weight_import.auraflow_params_from_diffusers)
# ---------------------------------------------------------------------------------


def _put_aura_ff(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.linear_1", node["linear_1"])
    _put_linear(w, f"{src}.linear_2", node["linear_2"])
    _put_linear(w, f"{src}.out_projection", node["out_projection"])


def export_auraflow_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "pos_embed.proj", p["patch_in"])
    # imported via .reshape(-1, hidden); torch carries a leading batch dim
    _put_raw(w, "pos_embed.pos_embed", _np(p["pos_embed"])[None])
    _put_linear(w, "context_embedder", p["context_in"])
    _put_raw(w, "register_tokens", _np(p["register_tokens"])[None])
    _put_linear(w, "time_step_proj.linear_1", p["time_in"]["in_layer"])
    _put_linear(w, "time_step_proj.linear_2", p["time_in"]["out_layer"])
    _put_linear(w, "norm_out.linear", p["final_mod"])
    _put_linear(w, "proj_out", p["final_proj"])
    for i in range(arch.depth_double):
        b = p[f"double_{i}"]
        dst = f"joint_transformer_blocks.{i}"
        _put_linear(w, f"{dst}.norm1.linear", b["norm1_lin"])
        _put_linear(w, f"{dst}.norm1_context.linear", b["norm1_context_lin"])
        _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["attn_add_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["attn_add_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["attn_add_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
        _put_linear(w, f"{dst}.attn.to_add_out", b["attn_add_proj"])
        _put_aura_ff(w, f"{dst}.ff", b["ff"])
        _put_aura_ff(w, f"{dst}.ff_context", b["ff_context"])
    for i in range(arch.depth_single):
        b = p[f"single_{i}"]
        dst = f"single_transformer_blocks.{i}"
        _put_linear(w, f"{dst}.norm1.linear", b["norm1_lin"])
        _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
        _put_aura_ff(w, f"{dst}.ff", b["ff"])
    return w


# ---------------------------------------------------------------------------------
# Chroma (inverse of weight_import.chroma_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_chroma_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    dim = arch.hidden_size
    _put_linear(w, "x_embedder", p["img_in"])
    _put_linear(w, "context_embedder", p["txt_in"])
    _put_linear(w, "proj_out", p["final_proj"])
    approx = p["approximator"]
    _put_linear(w, "distilled_guidance_layer.in_proj", approx["in_proj"])
    _put_linear(w, "distilled_guidance_layer.out_proj", approx["out_proj"])
    for i in range(arch.approximator_layers):
        _put_linear(w, f"distilled_guidance_layer.layers.{i}.linear_1", approx[f"layer_{i}_1"])
        _put_linear(w, f"distilled_guidance_layer.layers.{i}.linear_2", approx[f"layer_{i}_2"])
        _put_scale(w, f"distilled_guidance_layer.norms.{i}.weight", approx[f"norm_{i}"])
    for i in range(arch.depth_double):
        b = p[f"double_{i}"]
        dst = f"transformer_blocks.{i}"
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
    for i in range(arch.depth_single):
        b = p[f"single_{i}"]
        dst = f"single_transformer_blocks.{i}"
        # linear1 kernel (dim, 3*dim+mlp) is the transposed row-concat of
        # [to_q, to_k, to_v, proj_mlp]: split the columns back
        fused = _np(b["linear1"]["kernel"]).T  # (3*dim+mlp, dim)
        bias = _np(b["linear1"]["bias"])
        for j, name in enumerate(("attn.to_q", "attn.to_k", "attn.to_v")):
            w[f"{dst}.{name}.weight"] = fused[j * dim:(j + 1) * dim].copy()
            w[f"{dst}.{name}.bias"] = bias[j * dim:(j + 1) * dim].copy()
        w[f"{dst}.proj_mlp.weight"] = fused[3 * dim:].copy()
        w[f"{dst}.proj_mlp.bias"] = bias[3 * dim:].copy()
        _put_linear(w, f"{dst}.proj_out", b["linear2"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["norm_k"])
    return w


# ---------------------------------------------------------------------------------
# HunyuanVideo 1.5 (inverse of weight_import.hunyuanvideo_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_hunyuanvideo_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    dim = arch.hidden_size
    pt, ph, pw = arch.patch
    w["x_embedder.proj.weight"] = (
        _np(p["patch_in"]["kernel"]).reshape(pt, ph, pw, arch.in_channels, dim)
        .transpose(4, 3, 0, 1, 2).copy()
    )
    w["x_embedder.proj.bias"] = _np(p["patch_in"]["bias"])
    _put_timestep_mlp(w, "time_embed.timestep_embedder", p["time_in"])
    _put_raw(w, "cond_type_embed.weight", p["cond_type_embed"])
    _put_ln(w, "context_embedder_2.norm", p["byt5_norm"])
    _put_linear(w, "context_embedder_2.linear_1", p["byt5_in_1"])
    _put_linear(w, "context_embedder_2.linear_2", p["byt5_in_2"])
    _put_linear(w, "context_embedder_2.linear_3", p["byt5_in_3"])
    _put_ln(w, "image_embedder.norm_in", p["img_embed_norm_in"])
    _put_linear(w, "image_embedder.linear_1", p["img_embed_in_1"])
    _put_linear(w, "image_embedder.linear_2", p["img_embed_in_2"])
    _put_ln(w, "image_embedder.norm_out", p["img_embed_norm_out"])
    _put_linear(w, "norm_out.linear", p["final_mod"])
    _put_linear(w, "proj_out", p["final_proj"])
    refiner = p["refiner"]
    _put_timestep_mlp(w, "context_embedder.time_text_embed.timestep_embedder", refiner["time_in"])
    _put_timestep_mlp(w, "context_embedder.time_text_embed.text_embedder", refiner["text_in"])
    _put_linear(w, "context_embedder.proj_in", refiner["proj_in"])
    for i in range(arch.refiner_depth):
        b = refiner[f"block_{i}"]
        dst = f"context_embedder.token_refiner.refiner_blocks.{i}"
        _put_ln(w, f"{dst}.norm1", b["norm1"])
        _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
        _put_ln(w, f"{dst}.norm2", b["norm2"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])
        _put_linear(w, f"{dst}.norm_out.linear", b["adanorm_lin"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_linear(w, f"{dst}.norm1.linear", b["norm1_lin"])
        _put_linear(w, f"{dst}.norm1_context.linear", b["norm1_context_lin"])
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
        _put_linear(w, f"{dst}.ff.net.0.proj", b["img_mlp_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["img_mlp_out"])
        _put_linear(w, f"{dst}.ff_context.net.0.proj", b["txt_mlp_in"])
        _put_linear(w, f"{dst}.ff_context.net.2", b["txt_mlp_out"])
    return w


# ---------------------------------------------------------------------------------
# Lumina2 / boogu_image (inverse of weight_import.lumina2_params_from_diffusers)
# ---------------------------------------------------------------------------------


def _put_lumina2_block(w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any], modulated: bool) -> None:
    _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
    _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
    _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
    _put_scale(w, f"{dst}.attn.norm_q.weight", b["norm_q"])
    _put_scale(w, f"{dst}.attn.norm_k.weight", b["norm_k"])
    _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
    _put_linear(w, f"{dst}.feed_forward.linear_1", b["feed_forward"]["linear_1"])
    _put_linear(w, f"{dst}.feed_forward.linear_2", b["feed_forward"]["linear_2"])
    _put_linear(w, f"{dst}.feed_forward.linear_3", b["feed_forward"]["linear_3"])
    _put_scale(w, f"{dst}.norm2.weight", b["norm2"])
    _put_scale(w, f"{dst}.ffn_norm1.weight", b["ffn_norm1"])
    _put_scale(w, f"{dst}.ffn_norm2.weight", b["ffn_norm2"])
    if modulated:
        _put_linear(w, f"{dst}.norm1.linear", b["norm1_linear"])
        _put_scale(w, f"{dst}.norm1.norm.weight", b["norm1_norm"])
    else:
        _put_scale(w, f"{dst}.norm1.weight", b["norm1_norm"])


def export_lumina2_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "x_embedder", p["patch_in"])
    _put_timestep_mlp(w, "time_caption_embed.timestep_embedder", p["time_in"])
    _put_scale(w, "time_caption_embed.caption_embedder.0.weight", p["cap_norm"])
    _put_linear(w, "time_caption_embed.caption_embedder.1", p["cap_in"])
    _put_linear(w, "norm_out.linear_1", p["final_mod"])
    _put_linear(w, "norm_out.linear_2", p["final_proj"])
    for i in range(arch.refiner_depth):
        _put_lumina2_block(w, f"context_refiner.{i}", p[f"context_refiner_{i}"], modulated=False)
        _put_lumina2_block(w, f"noise_refiner.{i}", p[f"noise_refiner_{i}"], modulated=True)
    for i in range(arch.depth):
        _put_lumina2_block(w, f"layers.{i}", p[f"layer_{i}"], modulated=True)
    return w


# ---------------------------------------------------------------------------------
# HiDream-I1 (inverse of weight_import.hidream_params_from_diffusers)
# ---------------------------------------------------------------------------------


def _put_hidream_ffn(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.w1", node["w1"])
    _put_linear(w, f"{src}.w2", node["w2"])
    _put_linear(w, f"{src}.w3", node["w3"])


def _put_hidream_moe(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any], num_experts: int) -> None:
    _put_raw(w, f"{src}.gate.weight", node["gate"])
    for name in ("w1", "w2", "w3"):
        stacked = _np(node[f"experts_{name}"])  # (E, in, out)
        for e in range(num_experts):
            w[f"{src}.experts.{e}.{name}.weight"] = stacked[e].T.copy()
    _put_hidream_ffn(w, f"{src}.shared_experts", node["shared_experts"])


def _put_hidream_attn(w: Dict[str, np.ndarray], src: str, b: Dict[str, Any], text_branch: bool) -> None:
    _put_linear(w, f"{src}.to_q", b["attn_q"])
    _put_linear(w, f"{src}.to_k", b["attn_k"])
    _put_linear(w, f"{src}.to_v", b["attn_v"])
    _put_linear(w, f"{src}.to_out", b["attn_proj"])
    _put_raw(w, f"{src}.q_rms_norm.weight", b["q_rms"])
    _put_raw(w, f"{src}.k_rms_norm.weight", b["k_rms"])
    if text_branch:
        _put_linear(w, f"{src}.to_q_t", b["attn_q_t"])
        _put_linear(w, f"{src}.to_k_t", b["attn_k_t"])
        _put_linear(w, f"{src}.to_v_t", b["attn_v_t"])
        _put_linear(w, f"{src}.to_out_t", b["attn_proj_t"])
        _put_raw(w, f"{src}.q_rms_norm_t.weight", b["q_rms_t"])
        _put_raw(w, f"{src}.k_rms_norm_t.weight", b["k_rms_t"])


def export_hidream_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    n_blocks = arch.depth_double + arch.depth_single
    _put_linear(w, "x_embedder.proj", p["patch_in"])
    _put_timestep_mlp(w, "t_embedder.timestep_embedder", p["time_in"])
    _put_timestep_mlp(w, "p_embedder.pooled_embedder", p["pooled_in"])
    _put_linear(w, f"caption_projection.{n_blocks}.linear", p["caption_proj_t5"])
    _put_linear(w, "final_layer.adaLN_modulation.1", p["final_mod"])
    _put_linear(w, "final_layer.linear", p["final_proj"])
    for i in range(n_blocks):
        _put_linear(w, f"caption_projection.{i}.linear", p[f"caption_proj_{i}"])
    for i in range(arch.depth_double):
        b = p[f"double_{i}"]
        dst = f"double_stream_blocks.{i}.block"
        _put_linear(w, f"{dst}.adaLN_modulation.1", b["ada"])
        _put_hidream_attn(w, f"{dst}.attn1", b, text_branch=True)
        _put_hidream_moe(w, f"{dst}.ff_i", b["ff_i"], arch.num_experts)
        _put_hidream_ffn(w, f"{dst}.ff_t", b["ff_t"])
    for i in range(arch.depth_single):
        b = p[f"single_{i}"]
        dst = f"single_stream_blocks.{i}.block"
        _put_linear(w, f"{dst}.adaLN_modulation.1", b["ada"])
        _put_hidream_attn(w, f"{dst}.attn1", b, text_branch=False)
        _put_hidream_moe(w, f"{dst}.ff_i", b["ff_i"], arch.num_experts)
    return w


# ---------------------------------------------------------------------------------
# FLUX.2 (inverse of weight_import.flux2_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_flux2_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "x_embedder", p["patch_in"])
    _put_linear(w, "context_embedder", p["txt_in"])
    _put_linear(w, "time_guidance_embed.timestep_embedder.linear_1", p["time_in_1"])
    _put_linear(w, "time_guidance_embed.timestep_embedder.linear_2", p["time_in_2"])
    _put_linear(w, "double_stream_modulation_img.linear", p["mod_double_img"])
    _put_linear(w, "double_stream_modulation_txt.linear", p["mod_double_txt"])
    _put_linear(w, "single_stream_modulation.linear", p["mod_single"])
    _put_linear(w, "norm_out.linear", p["final_mod"])
    _put_linear(w, "proj_out", p["final_proj"])
    if arch.guidance_embed:
        _put_linear(w, "time_guidance_embed.guidance_embedder.linear_1", p["guidance_in_1"])
        _put_linear(w, "time_guidance_embed.guidance_embedder.linear_2", p["guidance_in_2"])
    for i in range(arch.depth_double):
        b = p[f"double_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
        _put_linear(w, f"{dst}.attn.add_q_proj", b["attn_add_q"])
        _put_linear(w, f"{dst}.attn.add_k_proj", b["attn_add_k"])
        _put_linear(w, f"{dst}.attn.add_v_proj", b["attn_add_v"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["norm_k"])
        _put_scale(w, f"{dst}.attn.norm_added_q.weight", b["norm_added_q"])
        _put_scale(w, f"{dst}.attn.norm_added_k.weight", b["norm_added_k"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
        _put_linear(w, f"{dst}.attn.to_add_out", b["attn_add_proj"])
        _put_linear(w, f"{dst}.ff.linear_in", b["ff_in"])
        _put_linear(w, f"{dst}.ff.linear_out", b["ff_out"])
        _put_linear(w, f"{dst}.ff_context.linear_in", b["ff_context_in"])
        _put_linear(w, f"{dst}.ff_context.linear_out", b["ff_context_out"])
    for i in range(arch.depth_single):
        b = p[f"single_{i}"]
        dst = f"single_transformer_blocks.{i}"
        _put_linear(w, f"{dst}.attn.to_qkv_mlp_proj", b["qkv_mlp"])
        _put_scale(w, f"{dst}.attn.norm_q.weight", b["norm_q"])
        _put_scale(w, f"{dst}.attn.norm_k.weight", b["norm_k"])
        _put_linear(w, f"{dst}.attn.to_out", b["proj_out"])
    return w


# ---------------------------------------------------------------------------------
# ACE-Step (inverse of weight_import.acestep_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_acestep_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    lyric = p["lyric_encoder"]
    _put_raw(w, "lyric_embs.weight", lyric["lyric_embs"])
    _put_linear(w, "lyric_encoder.embed.out.0", lyric["embed_out"])
    _put_ln(w, "lyric_encoder.embed.out.1", lyric["embed_norm"])
    _put_ln(w, "lyric_encoder.after_norm", lyric["after_norm"])
    for i in range(arch.lyric_depth):
        b = lyric[f"layer_{i}"]
        dst = f"lyric_encoder.encoders.{i}"
        _put_ln(w, f"{dst}.norm_mha", b["norm_mha"])
        _put_linear(w, f"{dst}.self_attn.linear_q", b["attn_q"])
        _put_linear(w, f"{dst}.self_attn.linear_k", b["attn_k"])
        _put_linear(w, f"{dst}.self_attn.linear_v", b["attn_v"])
        _put_linear(w, f"{dst}.self_attn.linear_out", b["attn_out"])
        _put_linear(w, f"{dst}.self_attn.linear_pos", b["linear_pos"])
        _put_raw(w, f"{dst}.self_attn.pos_bias_u", b["pos_bias_u"])
        _put_raw(w, f"{dst}.self_attn.pos_bias_v", b["pos_bias_v"])
        _put_ln(w, f"{dst}.norm_ff", b["norm_ff"])
        _put_linear(w, f"{dst}.feed_forward.w_1", b["ff_1"])
        _put_linear(w, f"{dst}.feed_forward.w_2", b["ff_2"])
    _put_conv(w, "proj_in.early_conv_layers.0", p["patch_conv"])
    _put_norm(w, "proj_in.early_conv_layers.1", p["patch_norm"])
    _put_conv(w, "proj_in.early_conv_layers.2", p["patch_proj"])
    _put_timestep_mlp(w, "timestep_embedder", p["time_in"])
    _put_linear(w, "t_block.1", p["t_block"])
    _put_linear(w, "speaker_embedder", p["speaker_embedder"])
    _put_linear(w, "genre_embedder", p["genre_embedder"])
    _put_linear(w, "lyric_proj", p["lyric_proj"])
    _put_linear(w, "final_layer.linear", p["final_proj"])
    _put_raw(w, "final_layer.scale_shift_table", p["final_scale_shift_table"])
    for i in range(arch.num_layers):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"])
        _put_linear(w, f"{dst}.attn.to_q", b["attn_q"])
        _put_linear(w, f"{dst}.attn.to_k", b["attn_k"])
        _put_linear(w, f"{dst}.attn.to_v", b["attn_v"])
        _put_linear(w, f"{dst}.attn.to_out.0", b["attn_proj"])
        _put_linear(w, f"{dst}.cross_attn.to_q", b["cross_q"])
        _put_linear(w, f"{dst}.cross_attn.to_k", b["cross_k"])
        _put_linear(w, f"{dst}.cross_attn.to_v", b["cross_v"])
        _put_linear(w, f"{dst}.cross_attn.to_out.0", b["cross_proj"])
        _put_conv1d(w, f"{dst}.ff.inverted_conv.conv", b["ff"]["inverted"])
        _put_conv1d(w, f"{dst}.ff.depth_conv.conv", b["ff"]["depth"])
        _put_conv1d(w, f"{dst}.ff.point_conv.conv", b["ff"]["point"])
    for head in range(len(arch.ssl_dims)):
        for j, torch_idx in enumerate((0, 2, 4)):
            _put_linear(w, f"projectors.{head}.{torch_idx}", p[f"projector_{head}_{j}"])
    return w


# ---------------------------------------------------------------------------------
# LTX-2 (inverse of weight_import.ltx2_params_from_diffusers)
# ---------------------------------------------------------------------------------


def _put_ltx2_adaln(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.emb.timestep_embedder.linear_1", node["in_layer"])
    _put_linear(w, f"{src}.emb.timestep_embedder.linear_2", node["out_layer"])
    _put_linear(w, f"{src}.linear", node["mod"])


def _put_ltx2_attn(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any], gated: bool) -> None:
    _put_linear(w, f"{src}.to_q", node["to_q"])
    _put_linear(w, f"{src}.to_k", node["to_k"])
    _put_linear(w, f"{src}.to_v", node["to_v"])
    _put_raw(w, f"{src}.norm_q.weight", node["norm_q"])
    _put_raw(w, f"{src}.norm_k.weight", node["norm_k"])
    _put_linear(w, f"{src}.to_out.0", node["to_out"])
    if gated:
        _put_linear(w, f"{src}.to_gate_logits", node["to_gate_logits"])


def export_ltx2_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "proj_in", p["proj_in"])
    _put_linear(w, "audio_proj_in", p["audio_proj_in"])
    _put_linear(w, "caption_projection.linear_1", p["caption_proj_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_proj_2"])
    _put_linear(w, "audio_caption_projection.linear_1", p["audio_caption_proj_1"])
    _put_linear(w, "audio_caption_projection.linear_2", p["audio_caption_proj_2"])
    _put_ltx2_adaln(w, "time_embed", p["time_embed"])
    _put_ltx2_adaln(w, "audio_time_embed", p["audio_time_embed"])
    _put_ltx2_adaln(w, "av_cross_attn_video_scale_shift", p["av_ca_video_scale_shift"])
    _put_ltx2_adaln(w, "av_cross_attn_video_a2v_gate", p["av_ca_video_a2v_gate"])
    _put_ltx2_adaln(w, "av_cross_attn_audio_scale_shift", p["av_ca_audio_scale_shift"])
    _put_ltx2_adaln(w, "av_cross_attn_audio_v2a_gate", p["av_ca_audio_v2a_gate"])
    _put_raw(w, "scale_shift_table", p["scale_shift_table"])
    _put_raw(w, "audio_scale_shift_table", p["audio_scale_shift_table"])
    _put_linear(w, "proj_out", p["proj_out"])
    _put_linear(w, "audio_proj_out", p["audio_proj_out"])
    for i in range(arch.num_layers):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"])
        _put_raw(w, f"{dst}.audio_scale_shift_table", b["audio_scale_shift_table"])
        _put_raw(w, f"{dst}.video_a2v_cross_attn_scale_shift_table", b["video_ca_scale_shift_table"])
        _put_raw(w, f"{dst}.audio_a2v_cross_attn_scale_shift_table", b["audio_ca_scale_shift_table"])
        _put_ltx2_attn(w, f"{dst}.attn1", b["attn1"], arch.gated_attn)
        _put_ltx2_attn(w, f"{dst}.audio_attn1", b["audio_attn1"], arch.audio_gated_attn)
        _put_ltx2_attn(w, f"{dst}.attn2", b["attn2"], arch.gated_attn)
        _put_ltx2_attn(w, f"{dst}.audio_attn2", b["audio_attn2"], arch.audio_gated_attn)
        _put_ltx2_attn(w, f"{dst}.audio_to_video_attn", b["audio_to_video_attn"], arch.gated_attn)
        _put_ltx2_attn(w, f"{dst}.video_to_audio_attn", b["video_to_audio_attn"], arch.audio_gated_attn)
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff"]["proj_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff"]["proj_out"])
        _put_linear(w, f"{dst}.audio_ff.net.0.proj", b["audio_ff"]["proj_in"])
        _put_linear(w, f"{dst}.audio_ff.net.2", b["audio_ff"]["proj_out"])
    return w


# ---------------------------------------------------------------------------------
# Cosmos3 (inverse of weight_import.cosmos3_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_cosmos3_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_raw(w, "embed_tokens.weight", p["embed_tokens"])
    _put_raw(w, "norm.weight", p["norm"])
    _put_raw(w, "norm_moe_gen.weight", p["norm_moe_gen"])
    _put_linear(w, "lm_head", p["lm_head"])
    _put_linear(w, "proj_in", p["proj_in"])
    _put_linear(w, "proj_out", p["proj_out"])
    _put_linear(w, "time_embedder.linear_1", p["time_in_1"])
    _put_linear(w, "time_embedder.linear_2", p["time_in_2"])
    for i in range(arch.num_layers):
        b = p[f"layer_{i}"]
        dst = f"layers.{i}"
        _put_linear(w, f"{dst}.self_attn.to_q", b["attn_und_q"])
        _put_linear(w, f"{dst}.self_attn.to_k", b["attn_und_k"])
        _put_linear(w, f"{dst}.self_attn.to_v", b["attn_und_v"])
        _put_linear(w, f"{dst}.self_attn.to_out", b["attn_und_out"])
        _put_linear(w, f"{dst}.self_attn.add_q_proj", b["attn_gen_q"])
        _put_linear(w, f"{dst}.self_attn.add_k_proj", b["attn_gen_k"])
        _put_linear(w, f"{dst}.self_attn.add_v_proj", b["attn_gen_v"])
        _put_linear(w, f"{dst}.self_attn.to_add_out", b["attn_gen_out"])
        _put_raw(w, f"{dst}.self_attn.norm_q.weight", b["norm_q"])
        _put_raw(w, f"{dst}.self_attn.norm_k.weight", b["norm_k"])
        _put_raw(w, f"{dst}.self_attn.norm_added_q.weight", b["norm_added_q"])
        _put_raw(w, f"{dst}.self_attn.norm_added_k.weight", b["norm_added_k"])
        _put_raw(w, f"{dst}.input_layernorm.weight", b["input_layernorm"])
        _put_raw(w, f"{dst}.post_attention_layernorm.weight", b["post_attention_layernorm"])
        _put_raw(w, f"{dst}.input_layernorm_moe_gen.weight", b["input_layernorm_moe_gen"])
        _put_raw(w, f"{dst}.post_attention_layernorm_moe_gen.weight", b["post_attention_layernorm_moe_gen"])
        for mlp_name, node in (("mlp", b["mlp"]), ("mlp_moe_gen", b["mlp_moe_gen"])):
            _put_linear(w, f"{dst}.{mlp_name}.gate_proj", node["gate_proj"])
            _put_linear(w, f"{dst}.{mlp_name}.up_proj", node["up_proj"])
            _put_linear(w, f"{dst}.{mlp_name}.down_proj", node["down_proj"])
    return w


# ---------------------------------------------------------------------------------
# Kandinsky 5.0 (inverse of weight_import.kandinsky5_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def _put_k5_attention(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.to_query", node["to_query"])
    _put_linear(w, f"{src}.to_key", node["to_key"])
    _put_linear(w, f"{src}.to_value", node["to_value"])
    _put_linear(w, f"{src}.out_layer", node["out_layer"])
    _put_raw(w, f"{src}.query_norm.weight", node["query_norm"])
    _put_raw(w, f"{src}.key_norm.weight", node["key_norm"])


def _put_k5_ff(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.in_layer", node["in_layer"])
    _put_linear(w, f"{src}.out_layer", node["out_layer"])


def export_kandinsky5_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "time_embeddings.in_layer", p["time_in"])
    _put_linear(w, "time_embeddings.out_layer", p["time_out"])
    _put_linear(w, "text_embeddings.in_layer", p["text_in"])
    _put_norm(w, "text_embeddings.norm", p["text_norm"])
    _put_linear(w, "pooled_text_embeddings.in_layer", p["pooled_in"])
    _put_norm(w, "pooled_text_embeddings.norm", p["pooled_norm"])
    _put_linear(w, "visual_embeddings.in_layer", p["visual_in"])
    _put_linear(w, "out_layer.modulation.out_layer", p["out_modulation"]["out_layer"])
    _put_linear(w, "out_layer.out_layer", p["out_proj"])
    for i in range(arch.num_text_blocks):
        b = p[f"text_block_{i}"]
        dst = f"text_transformer_blocks.{i}"
        _put_linear(w, f"{dst}.text_modulation.out_layer", b["text_modulation"]["out_layer"])
        _put_k5_attention(w, f"{dst}.self_attention", b["self_attention"])
        _put_k5_ff(w, f"{dst}.feed_forward", b["feed_forward"])
    for i in range(arch.num_visual_blocks):
        b = p[f"visual_block_{i}"]
        dst = f"visual_transformer_blocks.{i}"
        _put_linear(w, f"{dst}.visual_modulation.out_layer", b["visual_modulation"]["out_layer"])
        _put_k5_attention(w, f"{dst}.self_attention", b["self_attention"])
        _put_k5_attention(w, f"{dst}.cross_attention", b["cross_attention"])
        _put_k5_ff(w, f"{dst}.feed_forward", b["feed_forward"])
    return w


# ---------------------------------------------------------------------------------
# Krea 2 (inverse of weight_import.krea2_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def _put_krea2_attn(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.to_q", node["to_q"])
    _put_linear(w, f"{src}.to_k", node["to_k"])
    _put_linear(w, f"{src}.to_v", node["to_v"])
    _put_linear(w, f"{src}.to_gate", node["to_gate"])
    _put_linear(w, f"{src}.to_out.0", node["to_out"])
    _put_raw(w, f"{src}.norm_q.weight", node["norm_q"])
    _put_raw(w, f"{src}.norm_k.weight", node["norm_k"])


def _put_krea2_ff(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.gate", node["gate"])
    _put_linear(w, f"{src}.up", node["up"])
    _put_linear(w, f"{src}.down", node["down"])


def _put_krea2_fusion(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_raw(w, f"{src}.norm1.weight", node["norm1"])
    _put_raw(w, f"{src}.norm2.weight", node["norm2"])
    _put_krea2_attn(w, f"{src}.attn", node["attn"])
    _put_krea2_ff(w, f"{src}.ff", node["ff"])


def export_krea2_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = dict(params)
    w: Dict[str, np.ndarray] = {}
    # undo the (ph, pw, c) <-> (c, ph, pw) pack-order permutation the importer
    # applied to img_in rows / final_linear columns+bias
    img_in = dict(p["img_in"])
    perm = _flux_pack_permutation(int(np.asarray(img_in["kernel"]).shape[0]))
    inv = np.argsort(perm)
    img_in["kernel"] = np.ascontiguousarray(_np(img_in["kernel"])[inv])
    final_linear = dict(p["final_linear"])
    out_perm = _flux_pack_permutation(int(np.asarray(final_linear["kernel"]).shape[1]))
    out_inv = np.argsort(out_perm)
    final_linear["kernel"] = np.ascontiguousarray(_np(final_linear["kernel"])[:, out_inv])
    if "bias" in final_linear:
        final_linear["bias"] = np.ascontiguousarray(_np(final_linear["bias"])[out_inv])
    _put_linear(w, "img_in", img_in)
    _put_linear(w, "time_embed.linear_1", p["time_in_1"])
    _put_linear(w, "time_embed.linear_2", p["time_in_2"])
    _put_linear(w, "time_mod_proj", p["time_mod_proj"])
    _put_raw(w, "text_fusion.projector.weight", _np(p["text_projector"]).T.copy())
    _put_raw(w, "txt_in.norm.weight", p["txt_norm"])
    _put_linear(w, "txt_in.linear_1", p["txt_in_1"])
    _put_linear(w, "txt_in.linear_2", p["txt_in_2"])
    _put_raw(w, "final_layer.scale_shift_table", p["final_scale_shift_table"])
    _put_raw(w, "final_layer.norm.weight", p["final_norm"])
    _put_linear(w, "final_layer.linear", final_linear)
    for i in range(arch.num_layerwise_text_blocks):
        _put_krea2_fusion(w, f"text_fusion.layerwise_blocks.{i}", p[f"text_layerwise_{i}"])
    for i in range(arch.num_refiner_text_blocks):
        _put_krea2_fusion(w, f"text_fusion.refiner_blocks.{i}", p[f"text_refiner_{i}"])
    for i in range(arch.num_layers):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"])
        _put_raw(w, f"{dst}.norm1.weight", b["norm1"])
        _put_raw(w, f"{dst}.norm2.weight", b["norm2"])
        _put_krea2_attn(w, f"{dst}.attn", b["attn"])
        _put_krea2_ff(w, f"{dst}.ff", b["ff"])
    return w


# ---------------------------------------------------------------------------------
# Ideogram 4 (inverse of weight_import.ideogram_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_ideogram_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "input_proj", p["input_proj"])
    _put_raw(w, "llm_cond_norm.weight", p["llm_cond_norm"])
    _put_linear(w, "llm_cond_proj", p["llm_cond_proj"])
    _put_linear(w, "t_embedding.mlp_in", p["t_in"])
    _put_linear(w, "t_embedding.mlp_out", p["t_out"])
    _put_linear(w, "adaln_proj", p["adaln_proj"])
    _put_raw(w, "embed_image_indicator.weight", p["embed_image_indicator"])
    _put_linear(w, "final_layer.linear", p["final_linear"])
    _put_linear(w, "final_layer.adaln_modulation", p["final_adaln"])
    for i in range(arch.num_layers):
        b = p[f"layer_{i}"]
        dst = f"layers.{i}"
        _put_linear(w, f"{dst}.attention.qkv", b["qkv"])
        _put_linear(w, f"{dst}.attention.o", b["o"])
        _put_raw(w, f"{dst}.attention.norm_q.weight", b["norm_q"])
        _put_raw(w, f"{dst}.attention.norm_k.weight", b["norm_k"])
        _put_linear(w, f"{dst}.feed_forward.w1", b["w1"])
        _put_linear(w, f"{dst}.feed_forward.w2", b["w2"])
        _put_linear(w, f"{dst}.feed_forward.w3", b["w3"])
        _put_raw(w, f"{dst}.attention_norm1.weight", b["attention_norm1"])
        _put_raw(w, f"{dst}.attention_norm2.weight", b["attention_norm2"])
        _put_raw(w, f"{dst}.ffn_norm1.weight", b["ffn_norm1"])
        _put_raw(w, f"{dst}.ffn_norm2.weight", b["ffn_norm2"])
        _put_linear(w, f"{dst}.adaln_modulation", b["adaln_modulation"])
    return w


# ---------------------------------------------------------------------------------
# ERNIE (inverse of weight_import.ernie_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_ernie_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    # dense kernel (C, H) -> k=1 Conv2d weight (H, C, 1, 1)
    w["x_embedder.proj.weight"] = _np(p["x_embedder"]["kernel"]).T[:, :, None, None].copy()
    w["x_embedder.proj.bias"] = _np(p["x_embedder"]["bias"])
    _put_linear(w, "time_embedding.linear_1", p["time_in"])
    _put_linear(w, "time_embedding.linear_2", p["time_out"])
    _put_linear(w, "adaLN_modulation.1", p["adaLN_modulation"])
    _put_linear(w, "final_norm.linear", p["final_adaLN"])
    _put_linear(w, "final_linear", p["final_linear"])
    if "text_proj" in p:
        _put_linear(w, "text_proj", p["text_proj"])
    for i in range(arch.num_layers):
        b = p[f"layer_{i}"]
        dst = f"layers.{i}"
        _put_raw(w, f"{dst}.adaLN_sa_ln.weight", b["adaLN_sa_ln"])
        _put_raw(w, f"{dst}.adaLN_mlp_ln.weight", b["adaLN_mlp_ln"])
        _put_linear(w, f"{dst}.self_attention.to_q", b["to_q"])
        _put_linear(w, f"{dst}.self_attention.to_k", b["to_k"])
        _put_linear(w, f"{dst}.self_attention.to_v", b["to_v"])
        _put_linear(w, f"{dst}.self_attention.to_out.0", b["to_out"])
        _put_raw(w, f"{dst}.self_attention.norm_q.weight", b["norm_q"])
        _put_raw(w, f"{dst}.self_attention.norm_k.weight", b["norm_k"])
        _put_linear(w, f"{dst}.mlp.gate_proj", b["gate_proj"])
        _put_linear(w, f"{dst}.mlp.up_proj", b["up_proj"])
        _put_linear(w, f"{dst}.mlp.linear_fc2", b["linear_fc2"])
    return w


# ---------------------------------------------------------------------------------
# Sana-Video (inverse of weight_import.sanavideo_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_sanavideo_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_conv_generic(w, "patch_embedding", p["patch_embedding"])
    _put_linear(w, "time_embed.emb.timestep_embedder.linear_1", p["time_in"])
    _put_linear(w, "time_embed.emb.timestep_embedder.linear_2", p["time_out"])
    _put_linear(w, "time_embed.linear", p["time_mod"])
    _put_linear(w, "caption_projection.linear_1", p["caption_in_1"])
    _put_linear(w, "caption_projection.linear_2", p["caption_in_2"])
    _put_raw(w, "caption_norm.weight", p["caption_norm"])
    _put_raw(w, "scale_shift_table", p["scale_shift_table"])
    _put_linear(w, "proj_out", p["proj_out"])
    for i in range(arch.num_layers):
        b = p[f"block_{i}"]
        dst = f"transformer_blocks.{i}"
        _put_raw(w, f"{dst}.scale_shift_table", b["scale_shift_table"])
        for attn in ("attn1", "attn2"):
            _put_linear(w, f"{dst}.{attn}.to_q", b[f"{attn}_q"])
            _put_linear(w, f"{dst}.{attn}.to_k", b[f"{attn}_k"])
            _put_linear(w, f"{dst}.{attn}.to_v", b[f"{attn}_v"])
            _put_linear(w, f"{dst}.{attn}.to_out.0", b[f"{attn}_proj"])
            _put_raw(w, f"{dst}.{attn}.norm_q.weight", b[f"{attn}_norm_q"])
            _put_raw(w, f"{dst}.{attn}.norm_k.weight", b[f"{attn}_norm_k"])
        for conv in ("conv_inverted", "conv_depth", "conv_point", "conv_temp"):
            _put_conv_generic(w, f"{dst}.ff.{conv}", b["ff"][conv])
    return w


# ---------------------------------------------------------------------------------
# Cosmos 1/2 DiT core + Anima (inverses of cosmos1/anima_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_cosmos1_to_checkpoint(params: Dict[str, Any], arch, prefix: str = "") -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    pre = prefix
    _put_linear(w, f"{pre}patch_embed.proj", p["patch_embed"])
    _put_linear(w, f"{pre}time_embed.t_embedder.linear_1", p["t_embedder_1"])
    _put_linear(w, f"{pre}time_embed.t_embedder.linear_2", p["t_embedder_2"])
    _put_raw(w, f"{pre}time_embed.norm.weight", p["t_norm"])
    _put_linear(w, f"{pre}norm_out.linear_1", p["norm_out_1"])
    _put_linear(w, f"{pre}norm_out.linear_2", p["norm_out_2"])
    _put_linear(w, f"{pre}proj_out", p["proj_out"])
    if arch.learnable_pos_embed:
        _put_raw(w, f"{pre}learnable_pos_embed.pos_emb_t", p["pos_emb_t"])
        _put_raw(w, f"{pre}learnable_pos_embed.pos_emb_h", p["pos_emb_h"])
        _put_raw(w, f"{pre}learnable_pos_embed.pos_emb_w", p["pos_emb_w"])
    for i in range(arch.num_layers):
        b = p[f"block_{i}"]
        dst = f"{pre}transformer_blocks.{i}"
        for norm, attn in (("norm1", "attn1"), ("norm2", "attn2")):
            _put_linear(w, f"{dst}.{norm}.linear_1", b[norm]["linear_1"])
            _put_linear(w, f"{dst}.{norm}.linear_2", b[norm]["linear_2"])
            _put_linear(w, f"{dst}.{attn}.to_q", b[f"{attn}_q"])
            _put_linear(w, f"{dst}.{attn}.to_k", b[f"{attn}_k"])
            _put_linear(w, f"{dst}.{attn}.to_v", b[f"{attn}_v"])
            _put_linear(w, f"{dst}.{attn}.to_out.0", b[f"{attn}_out"])
            _put_raw(w, f"{dst}.{attn}.norm_q.weight", b[f"{attn}_norm_q"])
            _put_raw(w, f"{dst}.{attn}.norm_k.weight", b[f"{attn}_norm_k"])
        _put_linear(w, f"{dst}.norm3.linear_1", b["norm3"]["linear_1"])
        _put_linear(w, f"{dst}.norm3.linear_2", b["norm3"]["linear_2"])
        _put_linear(w, f"{dst}.ff.net.0.proj", b["ff_in"])
        _put_linear(w, f"{dst}.ff.net.2", b["ff_out"])
    return w


def export_anima_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    adapter = p["llm_adapter"]
    w: Dict[str, np.ndarray] = {}
    _put_raw(w, "llm_adapter.embed.weight", adapter["embed"])
    _put_linear(w, "llm_adapter.out_proj", adapter["out_proj"])
    _put_raw(w, "llm_adapter.norm.weight", adapter["norm"])
    for i in range(arch.adapter_layers):
        dst = f"llm_adapter.blocks.{i}"
        _put_raw(w, f"{dst}.norm_self_attn.weight", adapter[f"block_{i}_norm_self"])
        _put_raw(w, f"{dst}.norm_cross_attn.weight", adapter[f"block_{i}_norm_cross"])
        _put_raw(w, f"{dst}.norm_mlp.weight", adapter[f"block_{i}_norm_mlp"])
        for ours, theirs in (("self", "self_attn"), ("cross", "cross_attn")):
            node = adapter[f"block_{i}_{ours}"]
            _put_linear(w, f"{dst}.{theirs}.q_proj", node["q_proj"])
            _put_linear(w, f"{dst}.{theirs}.k_proj", node["k_proj"])
            _put_linear(w, f"{dst}.{theirs}.v_proj", node["v_proj"])
            _put_linear(w, f"{dst}.{theirs}.o_proj", node["o_proj"])
            _put_raw(w, f"{dst}.{theirs}.q_norm.weight", node["q_norm"])
            _put_raw(w, f"{dst}.{theirs}.k_norm.weight", node["k_norm"])
        _put_linear(w, f"{dst}.mlp.0", adapter[f"block_{i}_mlp_in"])
        _put_linear(w, f"{dst}.mlp.2", adapter[f"block_{i}_mlp_out"])
    w.update(export_cosmos1_to_checkpoint(p["core"], arch.core, prefix="core."))
    return w


# ---------------------------------------------------------------------------------
# LongCat-Video (inverse of weight_import.longcat_video_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_longcat_video_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_conv_generic(w, "x_embedder.proj", p["x_embedder"])
    _put_linear(w, "t_embedder.mlp.0", p["t_in"])
    _put_linear(w, "t_embedder.mlp.2", p["t_out"])
    _put_linear(w, "y_embedder.y_proj.0", p["y_in_1"])
    _put_linear(w, "y_embedder.y_proj.2", p["y_in_2"])
    _put_linear(w, "final_layer.adaLN_modulation.1", p["final_adaLN"])
    _put_linear(w, "final_layer.linear", p["final_linear"])
    for i in range(arch.depth):
        b = p[f"block_{i}"]
        dst = f"blocks.{i}"
        _put_linear(w, f"{dst}.adaLN_modulation.1", b["adaLN"])
        _put_linear(w, f"{dst}.attn.qkv", b["qkv"])
        _put_linear(w, f"{dst}.attn.proj", b["attn_proj"])
        _put_raw(w, f"{dst}.attn.q_norm.weight", b["q_norm"])
        _put_raw(w, f"{dst}.attn.k_norm.weight", b["k_norm"])
        _put_raw(w, f"{dst}.pre_crs_attn_norm.weight", b["pre_crs_scale"])
        _put_raw(w, f"{dst}.pre_crs_attn_norm.bias", b["pre_crs_bias"])
        _put_linear(w, f"{dst}.cross_attn.q_linear", b["crs_q"])
        _put_linear(w, f"{dst}.cross_attn.kv_linear", b["crs_kv"])
        _put_linear(w, f"{dst}.cross_attn.proj", b["crs_proj"])
        _put_raw(w, f"{dst}.cross_attn.q_norm.weight", b["crs_q_norm"])
        _put_raw(w, f"{dst}.cross_attn.k_norm.weight", b["crs_k_norm"])
        _put_linear(w, f"{dst}.ffn.w1", b["ffn_w1"])
        _put_linear(w, f"{dst}.ffn.w2", b["ffn_w2"])
        _put_linear(w, f"{dst}.ffn.w3", b["ffn_w3"])
    return w


def export_longcat_image_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    """LongCat-Image: the Flux body exported, with the bare time_embed prefix
    restored (inverse of load_longcat_image_params's key rename)."""
    weights = export_flux_to_diffusers(params, arch)
    out: Dict[str, np.ndarray] = {}
    for key, value in weights.items():
        if key.startswith("time_text_embed."):
            key = "time_embed." + key[len("time_text_embed."):]
        out[key] = value
    return out


# ---------------------------------------------------------------------------------
# Stable Cascade Stage C (inverse of stable_cascade_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def export_stable_cascade_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_linear(w, "clip_txt_pooled_mapper", p["clip_txt_pooled_mapper"])
    _put_conv(w, "embedding.1", p["embedding_conv"])
    _put_conv(w, "clf.1", p["clf_conv"])
    if "clip_txt_mapper" in p:
        _put_linear(w, "clip_txt_mapper", p["clip_txt_mapper"])

    def put_layer(src_key: str, res_dst: str, time_dst: str, attn_dst: str) -> None:
        res = p[f"{src_key}_res"]
        _put_conv(w, f"{res_dst}.depthwise", res["depthwise"])
        _put_linear(w, f"{res_dst}.channelwise.0", res["channelwise_0"])
        _put_linear(w, f"{res_dst}.channelwise.4", res["channelwise_1"])
        _put_raw(w, f"{res_dst}.channelwise.2.gamma", res["grn_gamma"], (1, 1, 1, -1))
        _put_raw(w, f"{res_dst}.channelwise.2.beta", res["grn_beta"], (1, 1, 1, -1))
        tnode = p[f"{src_key}_time"]
        _put_linear(w, f"{time_dst}.mapper", tnode["mapper"])
        for cond in arch.timestep_conditioning_type:
            _put_linear(w, f"{time_dst}.mapper_{cond}", tnode[f"mapper_{cond}"])
        anode = p[f"{src_key}_attn"]
        _put_linear(w, f"{attn_dst}.kv_mapper.1", anode["kv_mapper"])
        _put_linear(w, f"{attn_dst}.attention.to_q", anode["to_q"])
        _put_linear(w, f"{attn_dst}.attention.to_k", anode["to_k"])
        _put_linear(w, f"{attn_dst}.attention.to_v", anode["to_v"])
        _put_linear(w, f"{attn_dst}.attention.to_out.0", anode["to_out"])

    levels = len(arch.block_out_channels)
    for i in range(levels):
        if i > 0:
            _put_conv(w, f"down_downscalers.{i}.1", p[f"down_scaler_{i}"])
        for j in range(arch.down_num_layers_per_block[i]):
            base = j * 3
            put_layer(f"down_{i}_{j}", f"down_blocks.{i}.{base}",
                      f"down_blocks.{i}.{base + 1}", f"down_blocks.{i}.{base + 2}")
    for u in range(levels):
        level = levels - 1 - u
        for j in range(arch.up_num_layers_per_block[::-1][level]):
            base = j * 3
            put_layer(f"up_{u}_{j}", f"up_blocks.{u}.{base}",
                      f"up_blocks.{u}.{base + 1}", f"up_blocks.{u}.{base + 2}")
        if level > 0:
            # flax (2, 2, in, out) -> ConvTranspose2d weight (in, out, 2, 2)
            w[f"up_upscalers.{u}.1.weight"] = _np(p[f"up_scaler_{u}_kernel"]).transpose(2, 3, 0, 1).copy()
            w[f"up_upscalers.{u}.1.bias"] = _np(p[f"up_scaler_{u}_bias"])
    return w


# ---------------------------------------------------------------------------------
# Z-Image Omni (inverse of z_image_omni_params_from_diffusers)
# ---------------------------------------------------------------------------------


def _put_z_omni_block(w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any], modulated: bool) -> None:
    _put_linear(w, f"{dst}.attention.to_q", b["attn_q"])
    _put_linear(w, f"{dst}.attention.to_k", b["attn_k"])
    _put_linear(w, f"{dst}.attention.to_v", b["attn_v"])
    _put_linear(w, f"{dst}.attention.to_out.0", b["attn_proj"])
    _put_scale(w, f"{dst}.attention.norm_q.weight", b["norm_q"])
    _put_scale(w, f"{dst}.attention.norm_k.weight", b["norm_k"])
    _put_linear(w, f"{dst}.feed_forward.w1", b["feed_forward"]["w1"])
    _put_linear(w, f"{dst}.feed_forward.w2", b["feed_forward"]["w2"])
    _put_linear(w, f"{dst}.feed_forward.w3", b["feed_forward"]["w3"])
    _put_scale(w, f"{dst}.attention_norm1.weight", b["attention_norm1"])
    _put_scale(w, f"{dst}.attention_norm2.weight", b["attention_norm2"])
    _put_scale(w, f"{dst}.ffn_norm1.weight", b["ffn_norm1"])
    _put_scale(w, f"{dst}.ffn_norm2.weight", b["ffn_norm2"])
    if modulated:
        _put_linear(w, f"{dst}.adaLN_modulation.0", b["adaLN_modulation"])


def export_z_image_omni_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    patch_key = f"{arch.patch_size}-1"
    _put_linear(w, "t_embedder.mlp.0", p["t_in"])
    _put_linear(w, "t_embedder.mlp.2", p["t_out"])
    _put_linear(w, f"all_x_embedder.{patch_key}", p["x_embedder"])
    _put_scale(w, "cap_embedder.0.weight", p["cap_norm"])
    _put_linear(w, "cap_embedder.1", p["cap_embedder"])
    _put_raw(w, "cap_pad_token", p["cap_pad_token"])
    _put_linear(w, f"all_final_layer.{patch_key}.adaLN_modulation.1", p["final_adaLN"])
    _put_linear(w, f"all_final_layer.{patch_key}.linear", p["final_linear"])
    if "siglip_embedder" in p:
        _put_scale(w, "siglip_embedder.0.weight", p["siglip_norm"])
        _put_linear(w, "siglip_embedder.1", p["siglip_embedder"])
    for i in range(arch.refiner_depth):
        _put_z_omni_block(w, f"noise_refiner.{i}", p[f"noise_refiner_{i}"], modulated=True)
        _put_z_omni_block(w, f"context_refiner.{i}", p[f"context_refiner_{i}"], modulated=False)
        if f"siglip_refiner_{i}" in p:
            _put_z_omni_block(w, f"siglip_refiner.{i}", p[f"siglip_refiner_{i}"], modulated=False)
    for i in range(arch.depth):
        _put_z_omni_block(w, f"layers.{i}", p[f"layer_{i}"], modulated=True)
    return w


# ---------------------------------------------------------------------------------
# Zlab i1 (inverse of zlab_i1_params_from_checkpoint)
# ---------------------------------------------------------------------------------


def _put_zlab_swiglu(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.w12", node["w12"])
    _put_linear(w, f"{src}.w3", node["w3"])


def _put_zlab_block(w: Dict[str, np.ndarray], dst: str, b: Dict[str, Any], use_skip: bool) -> None:
    for n in ("norm1", "norm2", "norm3", "norm4"):
        _put_scale(w, f"{dst}.{n}.scale", b[n])
    _put_linear(w, f"{dst}.attn.qkv_image", b["qkv_image"])
    _put_linear(w, f"{dst}.attn.qkv_text", b["qkv_text"])
    _put_scale(w, f"{dst}.attn.q_norm.scale", b["q_norm"])
    _put_scale(w, f"{dst}.attn.k_norm.scale", b["k_norm"])
    _put_linear(w, f"{dst}.attn.proj_image", b["proj_image"])
    _put_linear(w, f"{dst}.attn.proj_text", b["proj_text"])
    _put_zlab_swiglu(w, f"{dst}.mlp_image", b["mlp_image"])
    _put_zlab_swiglu(w, f"{dst}.mlp_text", b["mlp_text"])
    if use_skip:
        _put_linear(w, f"{dst}.skip_linear_image", b["skip_image"])
        _put_linear(w, f"{dst}.skip_linear_text", b["skip_text"])


def _put_zlab_connector_attn(w: Dict[str, np.ndarray], src: str, node: Dict[str, Any]) -> None:
    _put_linear(w, f"{src}.qkv", node["qkv"])
    _put_scale(w, f"{src}.q_norm.scale", node["q_norm"])
    _put_scale(w, f"{src}.k_norm.scale", node["k_norm"])
    _put_linear(w, f"{src}.proj", node["proj"])


def export_zlab_i1_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    d = arch.hidden_size
    ps = arch.patch_size
    # dense kernel (C*p*p, d) (c,ph,pw-major) -> conv weight (d, C, p, p)
    w["x_embedder.proj.weight"] = (
        _np(p["x_embedder"]["kernel"]).T.reshape(d, arch.in_channels, ps, ps).copy()
    )
    w["x_embedder.proj.bias"] = _np(p["x_embedder"]["bias"])
    _put_raw(w, "pos_embed", p["pos_embed"])
    adapter = p["text_adapter"]
    _put_raw(w, "text_encoder_adapter.learnable_null_caption", adapter["null_caption"])
    _put_linear(w, "text_encoder_adapter.connector_in", adapter["connector_in"])
    for n in ("connector_norm1", "connector_norm2", "connector_norm3", "connector_norm4"):
        _put_scale(w, f"text_encoder_adapter.{n}.scale", adapter[n])
    _put_zlab_connector_attn(w, "text_encoder_adapter.connector_attn", adapter["connector_attn"])
    _put_zlab_connector_attn(w, "text_encoder_adapter.connector_attn2", adapter["connector_attn2"])
    _put_zlab_swiglu(w, "text_encoder_adapter.connector_mlp", adapter["connector_mlp"])
    _put_zlab_swiglu(w, "text_encoder_adapter.connector_mlp2", adapter["connector_mlp2"])
    _put_zlab_block(w, "mid_block", p["mid"], use_skip=False)
    _put_scale(w, "final_layer.norm_final.scale", p["final_norm"])
    _put_linear(w, "final_layer.linear", p["final_linear"])
    for i in range(arch.num_in_blocks):
        _put_zlab_block(w, f"in_blocks.{i}", p[f"in_{i}"], use_skip=False)
        _put_zlab_block(w, f"out_blocks.{i}", p[f"out_{i}"], use_skip=True)
    return w


# ---------------------------------------------------------------------------------
# HeartMuLa (inverse of models/heartmula/weight_import.heartmula_params)
# ---------------------------------------------------------------------------------


def _put_llama_stack(w: Dict[str, np.ndarray], prefix: str, stack: Dict[str, Any], num_layers: int) -> None:
    _put_raw(w, f"{prefix}.norm.scale", stack["norm"]["scale"])
    for i in range(num_layers):
        b = stack[f"layers_{i}"]
        dst = f"{prefix}.layers.{i}"
        _put_raw(w, f"{dst}.sa_norm.scale", b["sa_norm"]["scale"])
        _put_raw(w, f"{dst}.mlp_norm.scale", b["mlp_norm"]["scale"])
        _put_linear(w, f"{dst}.attn.q_proj", b["q_proj"])
        _put_linear(w, f"{dst}.attn.k_proj", b["k_proj"])
        _put_linear(w, f"{dst}.attn.v_proj", b["v_proj"])
        _put_linear(w, f"{dst}.attn.output_proj", b["o_proj"])
        _put_linear(w, f"{dst}.mlp.w1", b["w1"])
        _put_linear(w, f"{dst}.mlp.w2", b["w2"])
        _put_linear(w, f"{dst}.mlp.w3", b["w3"])


def export_heartmula_to_checkpoint(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    _put_raw(w, "text_embeddings.weight", p["text_embeddings"]["embedding"])
    _put_raw(w, "audio_embeddings.weight", p["audio_embeddings"]["embedding"])
    _put_raw(w, "unconditional_text_embedding.weight",
             p["unconditional_text_embedding"]["embedding"])
    _put_linear(w, "projection", p["projection"])
    _put_linear(w, "codebook0_head", p["codebook0_head"])
    _put_raw(w, "audio_head", p["audio_head"])
    _put_llama_stack(w, "backbone", p["backbone"], arch["backbone"].num_layers)
    _put_llama_stack(w, "decoder", p["decoder"], arch["decoder"].num_layers)
    return w


# ---------------------------------------------------------------------------------
# OmniGen (inverse of models/omnigen/weight_import.omnigen_params_from_diffusers)
# ---------------------------------------------------------------------------------


def export_omnigen_to_diffusers(params: Dict[str, Any], arch) -> Dict[str, np.ndarray]:
    p = params
    w: Dict[str, np.ndarray] = {}
    # dense kernel ((kh*kw*in), out) -> patch conv weight (out, in, kh, kw)
    kernel = _np(p["output_image_proj"]["kernel"])
    out_ch = kernel.shape[1]
    ps = arch.patch_size
    in_ch = kernel.shape[0] // (ps * ps)
    w["patch_embedding.output_image_proj.weight"] = (
        kernel.reshape(ps, ps, in_ch, out_ch).transpose(3, 2, 0, 1).copy()
    )
    if "bias" in p["output_image_proj"]:
        w["patch_embedding.output_image_proj.bias"] = _np(p["output_image_proj"]["bias"])
    _put_raw(w, "embed_tokens.weight", p["embed_tokens"]["embedding"])
    _put_linear(w, "t_embedder.linear_1", p["t_embedder"]["linear_1"])
    _put_linear(w, "t_embedder.linear_2", p["t_embedder"]["linear_2"])
    _put_linear(w, "time_token.linear_1", p["time_token"]["linear_1"])
    _put_linear(w, "time_token.linear_2", p["time_token"]["linear_2"])
    _put_raw(w, "norm.weight", p["norm"]["weight"])
    _put_linear(w, "norm_out.linear", p["norm_out_linear"])
    _put_linear(w, "proj_out", p["proj_out"])
    for i in range(arch.num_layers):
        b = p[f"layers_{i}"]
        dst = f"layers.{i}"
        _put_raw(w, f"{dst}.input_layernorm.weight", b["input_layernorm"]["weight"])
        _put_raw(w, f"{dst}.post_attention_layernorm.weight", b["post_attention_layernorm"]["weight"])
        _put_linear(w, f"{dst}.self_attn.to_q", b["to_q"])
        _put_linear(w, f"{dst}.self_attn.to_k", b["to_k"])
        _put_linear(w, f"{dst}.self_attn.to_v", b["to_v"])
        _put_linear(w, f"{dst}.self_attn.to_out.0", b["to_out"])
        _put_linear(w, f"{dst}.mlp.gate_up_proj", b["gate_up_proj"])
        _put_linear(w, f"{dst}.mlp.down_proj", b["down_proj"])
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
    # wan_s2v is the Wan DiT (audio conditioning is parameter-free context
    # concatenation), mirroring the importer delegation
    "wan_s2v": export_wan_to_diffusers,
    "qwen_image": export_qwen_image_to_diffusers,
    "mageflow": export_qwen_image_to_diffusers,
    "z_image": export_qwen_image_to_diffusers,
    "pixart_sigma": export_pixart_to_diffusers,
    "sana": export_sana_to_diffusers,
    "ltxvideo": export_ltx_to_diffusers,
    "auraflow": export_auraflow_to_diffusers,
    "chroma": export_chroma_to_diffusers,
    "hunyuanvideo": export_hunyuanvideo_to_diffusers,
    "lumina2": export_lumina2_to_diffusers,
    "boogu_image": export_lumina2_to_diffusers,  # Lumina2 (Next-DiT) body
    "hidream": export_hidream_to_diffusers,
    "flux2": export_flux2_to_diffusers,
    "ace_step": export_acestep_to_diffusers,
    "ltxvideo2": export_ltx2_to_diffusers,
    "cosmos3": export_cosmos3_to_checkpoint,
    "cosmos": export_cosmos1_to_checkpoint,
    "kandinsky5_video": export_kandinsky5_to_checkpoint,
    "kandinsky5_image": export_kandinsky5_to_checkpoint,
    "krea2": export_krea2_to_checkpoint,
    "ideogram": export_ideogram_to_checkpoint,
    "ernie": export_ernie_to_checkpoint,
    "sanavideo": export_sanavideo_to_checkpoint,
    "anima": export_anima_to_checkpoint,
    "longcat_video": export_longcat_video_to_checkpoint,
    "longcat_image": export_longcat_image_to_checkpoint,
    "stable_cascade": export_stable_cascade_to_checkpoint,
    "z_image_omni": export_z_image_omni_to_diffusers,
    "zlab_i1": export_zlab_i1_to_checkpoint,
    "heartmula": export_heartmula_to_checkpoint,
    "omnigen": export_omnigen_to_diffusers,
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
    "wan_s2v": ("WanTransformer3DModel", "WanPipeline", "transformer"),
    "qwen_image": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
    "mageflow": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
    "z_image": ("QwenImageTransformer2DModel", "QwenImagePipeline", "transformer"),
    "pixart_sigma": ("PixArtTransformer2DModel", "PixArtSigmaPipeline", "transformer"),
    "sana": ("SanaTransformer2DModel", "SanaPipeline", "transformer"),
    "ltxvideo": ("LTXVideoTransformer3DModel", "LTXPipeline", "transformer"),
    "auraflow": ("AuraFlowTransformer2DModel", "AuraFlowPipeline", "transformer"),
    "chroma": ("ChromaTransformer2DModel", "ChromaPipeline", "transformer"),
    "hunyuanvideo": ("HunyuanVideo15Transformer3DModel", "HunyuanVideo15Pipeline", "transformer"),
    "lumina2": ("Lumina2Transformer2DModel", "Lumina2Pipeline", "transformer"),
    "boogu_image": ("Lumina2Transformer2DModel", "Lumina2Pipeline", "transformer"),
    "hidream": ("HiDreamImageTransformer2DModel", "HiDreamImagePipeline", "transformer"),
    "flux2": ("Flux2Transformer2DModel", "Flux2Pipeline", "transformer"),
    "ace_step": ("ACEStepTransformer2DModel", "ACEStepPipeline", "transformer"),
    "ltxvideo2": ("LTX2VideoTransformer3DModel", "LTX2Pipeline", "transformer"),
    "cosmos3": ("Cosmos3OmniTransformer", "Cosmos3Pipeline", "transformer"),
    "cosmos": ("CosmosTransformer3DModel", "Cosmos2TextToImagePipeline", "transformer"),
    "kandinsky5_video": ("Kandinsky5Transformer3DModel", "Kandinsky5T2VPipeline", "transformer"),
    "kandinsky5_image": ("Kandinsky5Transformer3DModel", "Kandinsky5T2IPipeline", "transformer"),
    "krea2": ("Krea2Transformer2DModel", "Krea2Pipeline", "transformer"),
    "ideogram": ("Ideogram4Transformer", "IdeogramPipeline", "transformer"),
    "ernie": ("ErnieImageTransformer2DModel", "ErniePipeline", "transformer"),
    "sanavideo": ("SanaVideoTransformer3DModel", "SanaVideoPipeline", "transformer"),
    "anima": ("AnimaTransformer3DModel", "AnimaPipeline", "transformer"),
    "longcat_video": ("LongCatVideoTransformer3DModel", "LongCatVideoPipeline", "transformer"),
    "longcat_image": ("LongCatImageTransformer2DModel", "LongCatImagePipeline", "transformer"),
    "stable_cascade": ("StableCascadeUNet", "StableCascadePriorPipeline", "prior"),
    "z_image_omni": ("ZImageOmniTransformer2DModel", "ZImageOmniPipeline", "transformer"),
    "zlab_i1": ("ZlabI1Transformer2DModel", "ZlabI1Pipeline", "transformer"),
    "heartmula": ("HeartMuLaModel", "HeartMuLaPipeline", "transformer"),
    "omnigen": ("OmniGenTransformer2DModel", "OmniGenPipeline", "transformer"),
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
