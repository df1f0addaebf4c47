"""Base-weight-aware LoRA initialization (--lora_init_type pissa/olora/loftq).

Reference surface: cmd_args.py:1141 maps --lora_init_type to PEFT's
``init_lora_weights``; PiSSA (Meng et al. 2024) and OLoRA (Büyükakyüz 2024)
carve the principal subspace of the frozen kernel into the adapter and leave
the residual in the base, so training starts from the directions that matter;
LoftQ (Li et al. 2023) initializes the adapter to the top-r SVD of the
*quantization residual* so `quant(W) + (α/r)·A·B ≈ W` at step 0.

TPU-native placement: these are one-time host-side numpy decompositions run
between weight import and ``create_train_state`` — never traced, never on
device — so a 12B import stays on host RAM and the chip only ever sees the
final (possibly quantized) kernels.  The forward at step 0 is exactly the
pretrained function for pissa/olora (pinned by test) and the best rank-r
correction of the quantization error for loftq.

Notes vs the reference:
* the reference *refuses* LoftQ with quantized bases (cmd_args.py:1144)
  because PEFT's implementation needs bitsandbytes CUDA kernels; here LoftQ
  runs against our own int8/int4/fp8 quantizers, which is the configuration
  the method was designed for.  LoftQ *without* base quantization is the
  configuration that errors here (the residual would be zero).
* fused projections (e.g. flux single-block linear1) decompose fine — the
  SVD simply spans the concatenated output space.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

logger = logging.getLogger(__name__)

_POST_INIT_TYPES = ("pissa", "olora", "loftq")


def apply_lora_init_type(model, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Rewrite lora_A/lora_B (and for pissa/olora the base kernels) in-place
    per --lora_init_type.  Returns ``variables`` (same dict, updated trees)."""
    init_type = (getattr(model.config, "lora_init_type", None) or "default").lower()
    if init_type in ("default", "gaussian"):
        return variables
    if init_type not in _POST_INIT_TYPES:
        raise ValueError(
            f"unknown lora_init_type {init_type!r}; available: default, "
            f"gaussian, {', '.join(_POST_INIT_TYPES)}"
        )
    if model.lora_rank <= 0 or "lora" not in variables:
        raise ValueError(f"lora_init_type={init_type} requires model_type=lora")
    if model.lora_algo != "lora":
        raise ValueError(
            f"lora_init_type={init_type} only applies to the standard two-matrix "
            f"LoRA (got lora_algo={model.lora_algo!r})"
        )
    quant_mode = None
    if init_type == "loftq":
        from .quantization import resolve_precision

        quant_mode = resolve_precision(model.config)
        if not quant_mode:
            raise ValueError(
                "lora_init_type=loftq approximates the quantization residual; "
                "set base_model_precision (int8/int4/fp8) or use pissa/olora"
            )

    alpha = float(model.lora_alpha or model.lora_rank)
    rank = int(model.lora_rank)
    scale = alpha / rank
    params = variables.get("params", {})
    n_done = 0

    def walk(lora_node: Dict[str, Any], param_node: Any, path: str) -> None:
        nonlocal n_done
        if not isinstance(lora_node, dict):
            return
        if "lora_A" in lora_node and "lora_B" in lora_node:
            kernel = None if not isinstance(param_node, dict) else param_node.get("kernel")
            if kernel is None:
                raise ValueError(
                    f"lora_init_type={init_type}: no base kernel found for "
                    f"adapter at {path!r}"
                )
            a, b, residual = _decompose(
                np.asarray(kernel, dtype=np.float32), rank, scale, init_type, quant_mode
            )
            lora_node["lora_A"] = a.astype(np.asarray(lora_node["lora_A"]).dtype)
            lora_node["lora_B"] = b.astype(np.asarray(lora_node["lora_B"]).dtype)
            if residual is not None:
                param_node["kernel"] = residual.astype(np.asarray(kernel).dtype)
            n_done += 1
            return
        for key, child in lora_node.items():
            walk(child, param_node.get(key) if isinstance(param_node, dict) else None,
                 f"{path}/{key}" if path else key)

    import jax

    lora_tree = jax.tree_util.tree_map(np.asarray, variables["lora"])
    param_tree = jax.tree_util.tree_map(np.asarray, params)
    walk(lora_tree, param_tree, "")
    if n_done == 0:
        raise ValueError(f"lora_init_type={init_type}: no lora_A/lora_B pairs found")
    variables = dict(variables)
    variables["lora"] = lora_tree
    variables["params"] = param_tree
    logger.info("lora_init_type=%s applied to %d adapter sites", init_type, n_done)
    return variables


def _decompose(w: np.ndarray, rank: int, scale: float, init_type: str, quant_mode):
    """Return (A (in,r), B (r,out), residual kernel or None) such that the
    step-0 forward  x·W_res + scale·x·A·B  reproduces the target function."""
    # distribute the 1/scale correction as sqrt so A and B stay balanced
    inv = 1.0 / np.sqrt(scale)
    if init_type == "pissa":
        u, s, vt = np.linalg.svd(w, full_matrices=False)
        sq = np.sqrt(s[:rank])
        a = u[:, :rank] * sq[None, :] * inv
        b = sq[:, None] * vt[:rank] * inv
        return a, b, w - (u[:, :rank] * s[None, :rank]) @ vt[:rank]
    if init_type == "olora":
        # QR over the torch-layout (out,in) weight: W.T = Q R; ΔW.T = Q_r R_r
        q, r_mat = np.linalg.qr(w.T)
        q_r, r_r = q[:, :rank], r_mat[:rank, :]
        a = r_r.T * inv          # (in, r)
        b = q_r.T * inv          # (r, out)
        return a, b, w - (q_r @ r_r).T
    # loftq: top-r SVD of (W - dequant(quant(W))); base stays W and is
    # quantized later by create_train_state with the SAME quantizer
    from .quantization import quantize_dequantize

    residual = w - quantize_dequantize(w, quant_mode)
    u, s, vt = np.linalg.svd(residual, full_matrices=False)
    sq = np.sqrt(s[:rank])
    return u[:, :rank] * sq[None, :] * inv, sq[:, None] * vt[:rank] * inv, None
