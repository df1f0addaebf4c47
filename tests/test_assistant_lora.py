"""Assistant LoRA: merged-into-base equals adapter-applied forward."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.models.flux.model import Flux
from simpletuner_tpu.models.flux.transformer import FluxConfig
from simpletuner_tpu.training.lora import (
    load_lora_safetensors,
    merge_lora_into_params,
    save_lora_safetensors,
)


def test_merge_equals_adapter_forward(tmp_path):
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "lora_alpha": 4,  # alpha == rank → apply scale 1, merge scale 1
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    # flux is AdaLN-ZERO: at raw init every gate is 0 and adapters cannot
    # reach the output (the comparison would be vacuous) — perturb the base
    # like pretrained weights would
    pl, ptreedef = jax.tree_util.tree_flatten(variables["params"])
    pkeys = jax.random.split(jax.random.PRNGKey(5), len(pl))
    variables = {
        **variables,
        "params": jax.tree_util.tree_unflatten(
            ptreedef,
            [p + 0.05 * jax.random.normal(k, p.shape, p.dtype) for p, k in zip(pl, pkeys)],
        ),
    }

    # give the adapter non-trivial weights
    leaves, treedef = jax.tree_util.tree_flatten(variables["lora"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [0.1 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    lora = jax.tree_util.tree_unflatten(treedef, leaves)

    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    with_adapter = np.asarray(
        model.model_predict({**variables, "lora": lora}, prepared)
    )
    base_only = np.asarray(model.model_predict(variables, prepared))
    # the adapter must actually matter, or the equality below proves nothing
    assert float(np.abs(with_adapter - base_only).max()) > 1e-3

    # export -> reload -> merge into base, run with zero adapters
    path = str(tmp_path / "assistant.safetensors")
    save_lora_safetensors(model, jax.device_get(lora), path)
    reloaded = load_lora_safetensors(model, path, jax.device_get(variables["lora"]))
    merged = merge_lora_into_params(jax.device_get(variables["params"]), reloaded, scale=1.0)
    zero_lora = jax.tree_util.tree_map(jnp.zeros_like, variables["lora"])
    merged_vars = {
        "params": jax.tree_util.tree_map(jnp.asarray, merged),
        "lora": zero_lora,
    }
    with_merge = np.asarray(model.model_predict(merged_vars, prepared))
    # bf16 compute: merged-kernel vs low-rank-branch roundoff
    np.testing.assert_allclose(with_merge, with_adapter, atol=5e-2, rtol=1e-2)

def _random_lora(variables, seed=1, scale=0.1):
    leaves, treedef = jax.tree_util.tree_flatten(variables["lora"])
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_inference_strength_reweights_merged_adapter():
    """merge(s_train) then merge(s_inf - s_train) == merge(s_inf) (fp path)."""
    from simpletuner_tpu.training.lora import merge_lora_into_variables

    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    lora = jax.device_get(_random_lora(variables))
    params = jax.device_get(variables["params"])

    merged_train = merge_lora_into_variables(
        {"params": params}, lora, scale=0.8
    )
    reweighted = merge_lora_into_variables(merged_train, lora, scale=0.25 - 0.8)
    direct = merge_lora_into_variables({"params": params}, lora, scale=0.25)
    for got, want in zip(
        jax.tree_util.tree_leaves(reweighted["params"]),
        jax.tree_util.tree_leaves(direct["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-5
        )


def test_inference_strength_quantized_base():
    """Reweighting through an int8 base: dequant->add->requant refreshes the
    per-channel scale; result matches quantize(merge(s_inf)) within one
    quantization step."""
    from simpletuner_tpu.training.lora import merge_lora_into_variables
    from simpletuner_tpu.training.quantization import quantize_params

    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 4,
            "optimizer": "adamw",
            "learning_rate": 1e-3,
            "max_train_steps": 10,
        }
    )
    model = Flux(cfg, arch=FluxConfig.tiny())
    batch = model.example_batch(batch_size=1, resolution=32)
    variables = model.init_params(jax.random.PRNGKey(0), batch)
    lora = jax.device_get(_random_lora(variables))
    params = jax.device_get(variables["params"])

    # trainer order: merge at train strength, then quantize
    merged = merge_lora_into_params(params, lora, scale=1.0)
    quantized = jax.device_get(
        quantize_params({"params": jax.tree_util.tree_map(jnp.asarray, merged)}, "int8")
    )
    # validation: shift to inference strength 0 (unmerge)
    unmerged = merge_lora_into_variables(quantized, lora, scale=-1.0)

    # oracle: quantize the bare base directly
    oracle = jax.device_get(
        quantize_params({"params": jax.tree_util.tree_map(jnp.asarray, params)}, "int8")
    )

    def dense(tree):
        out = {}

        def walk(p, q, prefix):
            for k, v in p.items():
                if isinstance(v, dict):
                    walk(v, q.get(k, {}) if isinstance(q, dict) else {}, prefix + (k,))
                elif k == "kernel" and np.asarray(v).dtype == np.int8:
                    s = np.asarray(q["kernel_scale"], np.float32)
                    out[prefix + (k,)] = np.asarray(v, np.float32) * s[None, :]
                else:
                    out[prefix + (k,)] = np.asarray(v, np.float32)

        walk(tree["params"], tree["qscales"], ())
        return out

    got, want = dense(unmerged), dense(oracle)
    assert set(got) == set(want)
    for key in want:
        # two requant round-trips: tolerance = a couple of quant steps
        np.testing.assert_allclose(got[key], want[key], atol=0.08, rtol=0.05)
