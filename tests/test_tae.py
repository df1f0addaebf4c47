"""TAESD-architecture preview autoencoder: shapes + decoder import round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from simpletuner_tpu.models.tae import TAEConfig, TAEDecoder, TAEEncoder, load_taesd_decoder

import pytest

pytestmark = pytest.mark.slow

def test_encoder_decoder_shapes():
    config = TAEConfig.tiny()
    enc = TAEEncoder(config)
    dec = TAEDecoder(config)
    x = jnp.zeros((1, 32, 32, 3))
    enc_params = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(enc_params, x)
    assert z.shape == (1, 8, 8, config.latent_channels)  # 4x for 2 stages
    dec_params = dec.init(jax.random.PRNGKey(1), z)
    out = dec.apply(dec_params, z)
    assert out.shape == (1, 32, 32, 3)

def test_decoder_import_roundtrip(tmp_path):
    """Build a torch-layout taesd decoder dict from our params, import, compare."""
    from safetensors.numpy import save_file

    config = TAEConfig.tiny()
    dec = TAEDecoder(config)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, config.latent_channels))
    variables = dec.init(jax.random.PRNGKey(3), z)
    ref = np.asarray(dec.apply(variables, z))

    # inverse mapping: our pytree -> sequential torch keys
    params = jax.device_get(variables["params"])
    w = {}

    def put(key, node):
        w[f"{key}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in node:
            w[f"{key}.bias"] = np.asarray(node["bias"])

    put("1", params["conv_in"])
    index, layer = 3, 0
    for stage in range(config.num_stages):
        for _ in range(3):
            block = params[f"block_{layer}"]
            put(f"{index}.conv.0", block["conv_0"])
            put(f"{index}.conv.2", block["conv_2"])
            put(f"{index}.conv.4", block["conv_4"])
            layer += 1
            index += 1
        index += 1
        put(str(index), params[f"upconv_{stage}"])
        index += 1
    block = params[f"block_{layer}"]
    put(f"{index}.conv.0", block["conv_0"])
    put(f"{index}.conv.2", block["conv_2"])
    put(f"{index}.conv.4", block["conv_4"])
    index += 1
    put(str(index), params["conv_out"])

    path = str(tmp_path / "taesd_decoder.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in w.items()}, path)
    imported = load_taesd_decoder(config, path)
    got = np.asarray(dec.apply(jax.tree_util.tree_map(jnp.asarray, imported), z))
    np.testing.assert_allclose(got, ref, atol=1e-5)