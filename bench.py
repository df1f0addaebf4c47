"""Benchmark: Flux-architecture LoRA training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is model FLOPs utilization (MFU) of the full LoRA train step
(prepare → forward → backward → optimizer → EMA) on a Flux-architecture DiT at
512px-equivalent sequence lengths, bf16 base weights.  Baseline = the driver
north star of 40% MFU (BASELINE.json); vs_baseline = MFU / 0.40.

Measured on one v5e chip: 75.6% MFU at 512px bs4 without remat (the default
here); 71.7% at 1024px bs1 (3.0 samples/s/chip); 60.4% at 512px bs8 with
single-stream-only remat; 55.6% at bs8 full remat.  Flagship (11.9B, 1024px,
int8 base, attn remat): 66.6% MFU with int8 MXU matmuls (quantized_matmul=full,
the default) vs 53.3% with bf16 dequant matmuls; keeping activations on the
last 4 single blocks (skip_last) OOMs 16G at this scale.
Extra context (samples/sec, step time, config) goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: bench reruns (and the driver's repeat runs) skip
# the multi-minute XLA compile of the fused k-step program
jax.config.update("jax_compilation_cache_dir", os.environ.get(
    "JAX_COMPILE_CACHE", "/tmp/jax_bench_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# v5e bf16 peak per chip
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for name, flops in PEAK_FLOPS.items():
        if kind.startswith(name) or name in kind:
            return flops
    log(f"unknown device kind {kind!r}; assuming v5e peak")
    return 197e12


def flux_step_flops(arch, batch: int, s_img: int, s_txt: int, remat: bool) -> float:
    """Analytic *model* matmul FLOPs for one train step (fwd + 2x bwd).

    MFU convention: remat recompute is NOT counted as useful flops (the extra
    forward is hardware work, not model work).
    """
    h = arch.hidden_size
    s = s_img + s_txt
    mlp = arch.mlp_ratio
    # per-token dense flops (2*in*out per matmul); a token passes one stream of a
    # double block: qkv (6h²) + proj (2h²) + mlp in/out (2·2·mlp·h²)
    double = 2 * h * h * (3 + 1 + 2 * mlp)
    single = 2 * h * h * (3 + mlp) + 2 * h * h * (1 + mlp)  # linear1 + linear2
    attn = 4 * s * h  # QK^T + PV per token
    fwd = batch * s * (
        arch.depth_double * (double + attn) + arch.depth_single * (single + attn)
    )
    # io projections
    fwd += batch * (s_img * 2 * arch.in_channels * h * 2 + s_txt * 2 * arch.txt_in_features * h)
    del remat
    return fwd * 3.0


def flagship() -> dict:
    """Flux.1-scale flagship: FULL 19+38 depth (11.9B params), int8 frozen base
    + bf16 rank-16 LoRA, remat with single-stream attention outputs saved
    ("attn" policy: 53.1% MFU vs 52.1% full remat; "attn_all" OOMs 16G by
    ~140MB), 1024px bs1 — the BASELINE.md rows-1-4 regime on a single 16G
    v5e chip (VERDICT r1 Next #3).

    Weights are materialized directly in the quantized on-device layout
    (int8 kernels + qscales; training/quantization.py) — MFU is independent of
    weight values, and a 12B fp32 init would not fit either HBM or the tunnel.
    """
    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.quantization import resolve_quantized_matmul
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import TrainState, build_train_step

    batch_size = int(os.environ.get("BENCH_FLAGSHIP_BATCH", 1))
    resolution = int(os.environ.get("BENCH_FLAGSHIP_RES", 1024))
    steps = int(os.environ.get("BENCH_FLAGSHIP_STEPS", 8))
    quant = os.environ.get("BENCH_FLAGSHIP_QUANT", "int8")  # int8 | int4

    arch = FluxConfig()  # full Flux.1: 19 double + 38 single, 3072 x 24 heads
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 16,
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 1000,
            "gradient_checkpointing": True,
            "gradient_checkpointing_policy": os.environ.get("BENCH_REMAT_POLICY", "attn"),
            # mixed remat: keep activations on the last N single-stream blocks
            # (BENCH_SKIP_LAST sweep; 0 = remat everything)
            "gradient_checkpointing_skip_last": int(os.environ.get("BENCH_SKIP_LAST", 0)),
            # int8 MXU matmuls (off | forward | full): s8xs8->s32 contraction at
            # 2x bf16 peak for the frozen base.  Measured on one v5e chip:
            # off=53.3% MFU (2124ms) / forward=61.3% (1849ms) / full=66.6%
            # (1700ms), loss curves tracking within int8 noise
            # (tests/test_quantization.py::TestInt8MXUMatmul) -> full is the
            # default; BENCH_QMATMUL overrides for sweeps
            "quantized_matmul": os.environ.get("BENCH_QMATMUL", "full"),
            "base_model_precision": f"{quant}-quanto",
        }
    )
    model = Flux(cfg, arch=arch)

    latent = resolution // 8
    s_img = (latent // 2) * (latent // 2)
    s_txt = 512
    batch = {
        "latents": jnp.zeros((batch_size, latent, latent, 16), jnp.float32),
        "t5_embeds": jnp.zeros((batch_size, s_txt, arch.txt_in_features), jnp.bfloat16),
        "pooled_embeds": jnp.zeros((batch_size, arch.vec_in_features), jnp.bfloat16),
    }

    log("flagship: eval_shape init (no compute)...")
    init_batch = {k: v[:1] for k, v in batch.items()}
    shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.PRNGKey(0), init_batch)
    )

    import jax.tree_util as jtu

    param_shapes = jtu.tree_flatten_with_path(shapes["params"])[0]
    params_def = jtu.tree_structure(shapes["params"])
    n_params = sum(int(np.prod(s.shape)) for _, s in param_shapes)
    log(f"flagship params: {n_params/1e9:.2f}B (int8 on device)")

    def build_frozen():
        # materialize directly in the quantized on-device layout
        # (training/quantization.py): int8 = int8 kernels in params + scales;
        # int4 = packed-nibble kernels in qscales, kernel leaf absent
        if quant == "int4":
            def walk(tree):
                params, scales = {}, {}
                for name, s in tree.items():
                    if isinstance(s, dict):
                        p, sc = walk(s)
                        params[name] = p
                        if sc:
                            scales[name] = sc
                        continue
                    if name == "kernel" and len(s.shape) == 2 and s.shape[0] % 2 == 0:
                        scales["kernel_packed"] = jnp.full(
                            (s.shape[0] // 2, s.shape[1]), 0x88, jnp.uint8  # zeros
                        )
                        scales["kernel_scale"] = jnp.full((s.shape[1],), 1e-3, jnp.float32)
                    else:
                        params[name] = jnp.zeros(s.shape, jnp.bfloat16)
                return params, scales

            params, scales = walk(shapes["params"])
            return {"params": params, "qscales": scales}
        leaves = []
        scales: dict = {}
        for path, s in param_shapes:
            names = [getattr(k, "key", str(k)) for k in path]
            if names[-1] == "kernel" and len(s.shape) == 2:
                leaves.append(jnp.zeros(s.shape, jnp.int8))
                node = scales
                for name in names[:-1]:
                    node = node.setdefault(name, {})
                node["kernel_scale"] = jnp.full((s.shape[1],), 1e-3, jnp.float32)
            else:
                leaves.append(jnp.zeros(s.shape, jnp.bfloat16))
        return {"params": jtu.tree_unflatten(params_def, leaves), "qscales": scales}

    def build_lora():
        return jtu.tree_map(
            lambda s: jnp.full(s.shape, 0.01, jnp.float32), shapes["lora"]
        )

    log("flagship: materializing weights on device...")
    t0 = time.perf_counter()
    frozen = jax.jit(build_frozen)()
    lora = jax.jit(build_lora)()
    jax.block_until_ready(frozen["params"])
    log(f"  took {time.perf_counter()-t0:.1f}s")

    schedule = get_lr_schedule(cfg, 1000)
    tx = get_optimizer(cfg, schedule)
    trainable = {"lora": lora}
    state = TrainState(
        step=jnp.zeros([], jnp.int32),
        frozen=frozen,
        trainable=trainable,
        opt_state=tx.init(trainable),
        ema=None,
    )
    step_fn = build_train_step(model, tx, schedule)

    def k_steps(state, batch, rng, k):
        def body(i, carry):
            st, _ = carry
            st, metrics = step_fn(st, batch, jax.random.fold_in(rng, i))
            return (st, metrics["loss"])
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    # 12B leaves no HBM headroom for a second fused-k program (the k=8 variant
    # OOMs during compilation next to the live k=1 one), so time repeated k=1
    # calls — at multi-second steps the per-call scalar fetch is noise
    step_k = jax.jit(k_steps, static_argnums=(3,), donate_argnums=(0,))
    log("flagship: compiling (full-depth remat)...")
    t0 = time.perf_counter()
    state, loss = step_k(state, batch, jax.random.PRNGKey(1), 1)
    loss_val = float(loss)
    log(f"  compile+first step: {time.perf_counter()-t0:.1f}s  loss={loss_val:.4f}")

    state, loss = step_k(state, batch, jax.random.PRNGKey(2), 1)  # warm
    _ = float(loss)
    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        # capture an xplane trace of 2 steady-state steps for the flagship
        # ms-breakdown (scripts/trace_breakdown.py aggregates it)
        jax.profiler.start_trace(profile_dir)
        for i in range(2):
            state, loss = step_k(state, batch, jax.random.PRNGKey(100 + i), 1)
            _ = float(loss)
        jax.profiler.stop_trace()
        log(f"profile trace written to {profile_dir}")
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step_k(state, batch, jax.random.PRNGKey(3 + i), 1)
        _ = float(loss)
    dt = (time.perf_counter() - t0) / steps

    step_flops = flux_step_flops(arch, batch_size, s_img, s_txt, True)
    mfu = step_flops / dt / peak_flops()
    samples_per_sec = batch_size / dt
    log(
        f"flagship step: {dt*1e3:.1f} ms  samples/s/chip: {samples_per_sec:.3f}  "
        f"model TFLOP/step: {step_flops/1e12:.1f}  MFU: {mfu*100:.1f}%"
    )
    return {
        "mfu": round(mfu, 4),
        "samples_per_sec_per_chip": round(samples_per_sec, 4),
        "step_ms": round(dt * 1e3, 1),
        "params_b": round(n_params / 1e9, 2),
        "batch": batch_size,
        "resolution": resolution,
        "quant": quant,
        "remat": True,
        "skip_last": int(os.environ.get("BENCH_SKIP_LAST", 0)),
        # report the mode the run ACTUALLY used (resolved from the config the
        # model was built with), not the env default — round-3 JSON said "off"
        # for a quantized_matmul=full run
        "quantized_matmul": resolve_quantized_matmul(cfg),
    }


def main() -> None:
    from simpletuner_tpu.configuration import TrainingConfig
    from simpletuner_tpu.models.flux.model import Flux
    from simpletuner_tpu.models.flux.transformer import FluxConfig
    from simpletuner_tpu.training.optimizers import get_optimizer
    from simpletuner_tpu.training.schedules import get_lr_schedule
    from simpletuner_tpu.training.train_state import build_train_step, create_train_state

    batch_size = int(os.environ.get("BENCH_BATCH", 4))
    resolution = int(os.environ.get("BENCH_RES", 512))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    # Flux-architecture model sized to one v5e chip (same h/heads as Flux.1,
    # reduced depth): ~2.3B params in bf16.
    arch = FluxConfig(
        hidden_size=3072,
        num_heads=24,
        head_dim=128,
        depth_double=4,
        depth_single=8,
        txt_in_features=4096,
        vec_in_features=768,
    )
    cfg = TrainingConfig(
        {
            "model_family": "flux",
            "model_type": "lora",
            "lora_rank": 16,
            "optimizer": "adamw",
            "learning_rate": 1e-4,
            "max_train_steps": 1000,
            "gradient_checkpointing": remat,
            "gradient_checkpointing_policy": os.environ.get("BENCH_REMAT_POLICY", "full"),
        }
    )
    model = Flux(cfg, arch=arch)

    latent = resolution // 8
    s_img = (latent // 2) * (latent // 2)
    s_txt = 512
    batch = {
        "latents": jnp.zeros((batch_size, latent, latent, 16), jnp.float32),
        "t5_embeds": jnp.zeros((batch_size, s_txt, arch.txt_in_features), jnp.bfloat16),
        "pooled_embeds": jnp.zeros((batch_size, arch.vec_in_features), jnp.bfloat16),
    }

    log(f"initializing params (bs={batch_size}, res={resolution}, s_img={s_img})...")
    t0 = time.perf_counter()
    init_batch = {k: v[:1] for k, v in batch.items()}
    variables = model.init_params(jax.random.PRNGKey(0), init_batch)
    # bf16 base weights (frozen under LoRA), like the reference's bf16 base training
    variables = {
        "params": jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), variables["params"]),
        "lora": variables["lora"],
    }
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    log(f"params: {n_params/1e9:.2f}B, init took {time.perf_counter()-t0:.1f}s")

    schedule = get_lr_schedule(cfg, 1000)
    tx = get_optimizer(cfg, schedule)
    quant = os.environ.get("BENCH_QUANT") or None  # int8 | fp8
    state = create_train_state(model, variables, tx, quantize_mode=quant)
    if quant:
        log(f"base weights quantized: {quant}")
    step_fn = build_train_step(model, tx, schedule)

    # K steps fused into one program: block_until_ready is unreliable over the
    # remote-device tunnel, so sync via one scalar fetch per K steps instead.
    def k_steps(state, batch, rng, k):
        def body(i, carry):
            st, _ = carry
            st, metrics = step_fn(st, batch, jax.random.fold_in(rng, i))
            return (st, metrics["loss"])
        return jax.lax.fori_loop(0, k, body, (state, jnp.float32(0)))

    step_k = jax.jit(k_steps, static_argnums=(3,), donate_argnums=(0,))

    log("compiling...")
    t0 = time.perf_counter()
    state, loss = step_k(state, batch, jax.random.PRNGKey(1), 1)
    loss_val = float(loss)
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s  loss={loss_val:.4f}")

    # measure scalar-fetch (tunnel) overhead on a ready value
    t0 = time.perf_counter()
    for _ in range(3):
        _ = float(loss)
    fetch_overhead = (time.perf_counter() - t0) / 3
    log(f"scalar fetch overhead: {fetch_overhead*1e3:.1f} ms")

    state, loss = step_k(state, batch, jax.random.PRNGKey(2), steps)  # warm cache for K
    _ = float(loss)
    t0 = time.perf_counter()
    state, loss = step_k(state, batch, jax.random.PRNGKey(3), steps)
    _ = float(loss)
    dt = (time.perf_counter() - t0 - fetch_overhead) / steps

    step_flops = flux_step_flops(arch, batch_size, s_img, s_txt, remat)
    mfu = step_flops / dt / peak_flops()
    samples_per_sec = batch_size / dt
    log(
        f"step: {dt*1e3:.1f} ms  samples/s/chip: {samples_per_sec:.2f}  "
        f"model TFLOP/step: {step_flops/1e12:.1f}  MFU: {mfu*100:.1f}%"
    )

    extra = {
        "samples_per_sec_per_chip": round(samples_per_sec, 3),
        "step_ms": round(dt * 1e3, 1),
        "params_b": round(n_params / 1e9, 2),
        "batch": batch_size,
        "resolution": resolution,
        "remat": remat,
    }

    # Flagship 12B entry (VERDICT r1 Next #3): full-depth Flux.1, int8 base,
    # remat, 1024px.  Runs in a SUBPROCESS — the proxy's 2.56B buffers would
    # otherwise still occupy HBM and the 12B materialization OOMs.  The
    # headline metric is the flagship MFU when it runs; the 2.56B proxy rides
    # along in extra for continuity with round 1.
    metric_name = "flux_lora_train_mfu_v5e"
    value = mfu
    if os.environ.get("BENCH_MODE", "flagship") != "proxy":
        try:
            import subprocess

            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BENCH_MODE": "flagship_only"},
                capture_output=True, text=True, timeout=1500,
            )
            sys.stderr.write(proc.stderr[-4000:])
            fl = json.loads(proc.stdout.strip().splitlines()[-1])
            extra = {"proxy_2p56b": extra, **{f"flagship_{k}": v for k, v in fl.items()}}
            metric_name = "flux12b_int8_lora_train_mfu_v5e"
            value = fl["mfu"]
        except Exception as exc:  # OOM or tunnel hiccup: report the proxy
            log(f"flagship bench failed ({type(exc).__name__}: {exc}); reporting proxy only")
        # int4 flagship row (VERDICT r2 Next #3): packed-nibble base halves
        # frozen HBM (~11.9G int8 -> ~6G), the headroom for ~20B-class bases
        # on a 16G chip (reference FLUX.md 13G/9G int4/NF4 rows)
        if os.environ.get("BENCH_INT4", "1") != "0":
            try:
                import subprocess

                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "BENCH_MODE": "flagship_only",
                         "BENCH_FLAGSHIP_QUANT": "int4"},
                    capture_output=True, text=True, timeout=1500,
                )
                sys.stderr.write(proc.stderr[-4000:])
                fl4 = json.loads(proc.stdout.strip().splitlines()[-1])
                extra["flagship_int4"] = fl4
            except Exception as exc:
                log(f"int4 flagship bench failed ({type(exc).__name__}: {exc})")
        # data-plane caching throughput (VERDICT r3 Next #1 — the second
        # north-star axis: "VAE latent-cache images/sec"): bench_cache.py
        # measures VAECache.process_buckets + TextEmbeddingCache end-to-end
        # and the per-chip device rows, vs a modeled 2x-A100 eager pipeline
        if os.environ.get("BENCH_CACHE", "1") != "0":
            try:
                import subprocess

                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "bench_cache.py")],
                    capture_output=True, text=True, timeout=2400,
                )
                sys.stderr.write(proc.stderr[-4000:])
                cache_row = json.loads(proc.stdout.strip().splitlines()[-1])
                extra["vae_cache_images_per_sec"] = (
                    cache_row["extra"]["vae_cache"]["device_images_per_sec_per_chip"]
                )
                extra["text_embeds_per_sec"] = (
                    cache_row["extra"]["text_embeds"]["device_prompts_per_sec_per_chip"]
                )
                extra["cache_throughput"] = cache_row
            except Exception as exc:
                log(f"cache bench failed ({type(exc).__name__}: {exc})")

    print(
        json.dumps(
            {
                "metric": metric_name,
                "value": round(value, 4),
                "unit": "MFU (fraction of bf16 peak)",
                "vs_baseline": round(value / 0.40, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE") == "flagship_only":
        print(json.dumps(flagship()))
    else:
        main()
