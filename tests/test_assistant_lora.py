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

    # give the adapter non-trivial weights
    leaves, treedef = jax.tree_util.tree_flatten(variables["lora"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [0.1 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    lora = jax.tree_util.tree_unflatten(treedef, leaves)

    prepared = model.prepare_batch(jax.random.PRNGKey(2), batch)
    with_adapter = np.asarray(
        model.model_predict({**variables, "lora": lora}, prepared)
    )

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
