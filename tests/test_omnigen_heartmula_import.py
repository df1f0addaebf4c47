"""Weight import round-trips for OmniGen and HeartMuLa: synthesize a torch-style

checkpoint from the flax template, import it back, and verify exact recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpletuner_tpu.configuration import TrainingConfig

pytestmark = pytest.mark.slow

def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree)

class TestHeartMuLaImport:
    def test_round_trip(self):
        from simpletuner_tpu.models.heartmula.model import HeartMuLa
        from simpletuner_tpu.models.heartmula.weight_import import heartmula_params

        model = HeartMuLa(
            TrainingConfig({"model_family": "heartmula", "model_type": "full",
                            "model_arch_preset": "tiny", "optimizer": "adamw",
                            "learning_rate": 1e-4, "max_train_steps": 1})
        )
        template = model.init_params(jax.random.PRNGKey(0))["params"]

        # synthesize the torchtune-style checkpoint from the template
        weights = {}
        for path, value in _flatten(template):
            name = ".".join(path)
            if path[0] in ("backbone", "decoder"):
                stack = path[0]
                if path[1] == "norm":
                    weights[f"{stack}.norm.scale"] = value
                    continue
                layer = path[1].replace("layers_", "layers.")
                mod, leaf = path[2], path[3]
                if mod in ("sa_norm", "mlp_norm"):
                    weights[f"{stack}.{layer}.{mod}.scale"] = value
                elif mod in ("w1", "w2", "w3"):
                    weights[f"{stack}.{layer}.mlp.{mod}.weight"] = value.T
                else:
                    src = "output_proj" if mod == "o_proj" else mod
                    weights[f"{stack}.{layer}.attn.{src}.weight"] = value.T
            elif path[-1] == "embedding":
                weights[f"{path[0]}.weight"] = value
            elif path[0] == "audio_head":
                weights["audio_head"] = value
            else:  # projection / codebook0_head kernels
                weights[f"{path[0]}.weight"] = value.T

        imported = heartmula_params(weights, model.arch)
        for (p1, a), (p2, b) in zip(sorted(_flatten(template)), sorted(_flatten(imported))):
            assert p1 == p2
            np.testing.assert_allclose(a, b, atol=0, err_msg=str(p1))

class TestOmniGenImport:
    def test_round_trip_and_forward(self):
        from simpletuner_tpu.models.omnigen.model import OmniGen
        from simpletuner_tpu.models.omnigen.weight_import import omnigen_params_from_diffusers

        model = OmniGen(
            TrainingConfig({"model_family": "omnigen", "model_type": "full",
                            "model_arch_preset": "tiny", "optimizer": "adamw",
                            "learning_rate": 1e-4, "max_train_steps": 1})
        )
        batch = model.example_batch(batch_size=1, resolution=32)
        template = model.init_params(jax.random.PRNGKey(0))["params"]

        p = model.arch.patch_size
        c = model.arch.in_channels
        weights = {}
        for path, value in _flatten(template):
            if path[0].startswith("layers_"):
                layer = path[0].replace("layers_", "layers.")
                mod, leaf = path[1], path[2]
                if mod in ("input_layernorm", "post_attention_layernorm"):
                    weights[f"{layer}.{mod}.weight"] = value
                elif mod in ("to_q", "to_k", "to_v"):
                    weights[f"{layer}.self_attn.{mod}.weight"] = value.T
                elif mod == "to_out":
                    weights[f"{layer}.self_attn.to_out.0.weight"] = value.T
                else:  # gate_up_proj / down_proj
                    weights[f"{layer}.mlp.{mod}.weight"] = value.T
            elif path[0] == "output_image_proj":
                if path[1] == "kernel":
                    # ((kh·kw·in), out) -> (out, in, kh, kw)
                    weights["patch_embedding.output_image_proj.weight"] = (
                        value.reshape(p, p, c, -1).transpose(3, 2, 0, 1)
                    )
                else:
                    weights["patch_embedding.output_image_proj.bias"] = value
            elif path[0] in ("t_embedder", "time_token"):
                leafname = "weight" if path[2] == "kernel" else "bias"
                w = value.T if path[2] == "kernel" else value
                weights[f"{path[0]}.{path[1]}.{leafname}"] = w
            elif path[0] == "embed_tokens":
                weights["embed_tokens.weight"] = value
            elif path[0] == "norm":
                weights["norm.weight"] = value
            elif path[0] == "norm_out_linear":
                weights[f"norm_out.linear.{'weight' if path[1] == 'kernel' else 'bias'}"] = (
                    value.T if path[1] == "kernel" else value
                )
            elif path[0] == "proj_out":
                weights[f"proj_out.{'weight' if path[1] == 'kernel' else 'bias'}"] = (
                    value.T if path[1] == "kernel" else value
                )
            else:
                raise AssertionError(f"unmapped template key {path}")

        imported = omnigen_params_from_diffusers(weights, model.arch)
        for (p1, a), (p2, b) in zip(sorted(_flatten(template)), sorted(_flatten(imported))):
            assert p1 == p2
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=str(p1))

        # imported params drive a finite forward
        prepared = model.prepare_batch(jax.random.PRNGKey(1), batch)
        pred = model.model_predict({"params": jax.tree_util.tree_map(jnp.asarray, imported)}, prepared)
        assert np.isfinite(np.asarray(pred)).all()