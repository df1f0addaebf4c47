"""Data-backend factory: multidatabackend.json -> live data plane.

Reference: helpers/data_backend/factory.py:5077 ``configure_multi_databackend``
(parse+sort configs, build storage/metadata/sampler per dataset, run text-embed
and VAE caching passes, wire conditioning links).  This is the host-side
composition root; everything it returns is plain python + numpy, feeding the
jitted train step.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..configuration.dataloader import (
    DatasetConfig,
    get_default_text_embed_id,
    load_dataloader_config,
)
from .backends.base import BaseDataBackend
from .backends.local import LocalDataBackend
from .backends.memory import MemoryDataBackend
from .buckets import BucketConfig
from .dataset import DatasetBundle, MultiDatasetIterator
from .metadata import MetadataBackend, ParquetMetadataBackend
from .sampler import MultiAspectSampler


logger = logging.getLogger(__name__)


def _build_nsfw_filter(args, config=None, backend=None):
    """NSFW scan-and-filter for caching passes (reference --enable_nsfw_check,
    factory.py:4177-4185 + vae.py:245-266 backend/sample-type gating)."""
    if not args.get("enable_nsfw_check", False):
        return None
    from .nsfw import DEFAULT_NSFW_CHECK_MODELS, NSFWFilter, csv_option_allows

    if config is not None:
        backend_types = args.get("nsfw_check_backend_types") or "all"
        if not csv_option_allows(backend_types, config.type):
            logger.info(
                "NSFW checks disabled for backend type %r (allowed: %r)",
                config.type, backend_types,
            )
            return None
        sample_types = args.get("nsfw_check_sample_types") or "image,conditioning"
        if config.dataset_type not in ("image", "video", "conditioning"):
            return None
        if not csv_option_allows(sample_types, config.dataset_type):
            logger.info(
                "NSFW checks disabled for dataset_type=%r (allowed: %r)",
                config.dataset_type, sample_types,
            )
            return None
    # per-dataset override of the global delete flag (reference factory.py:4185)
    delete = bool(args.get("delete_nsfw_images", False))
    if config is not None and "delete_nsfw_images" in getattr(config, "extra", {}):
        delete = bool(config.extra["delete_nsfw_images"])
    return NSFWFilter(
        models_csv=args.get("nsfw_check_models") or DEFAULT_NSFW_CHECK_MODELS,
        min_votes=int(args.get("nsfw_check_min_votes", 1) or 1),
        video_frame_count=int(args.get("nsfw_check_video_frame_count", 3) or 3),
        video_frame_selection=args.get("nsfw_check_video_frame_selection") or "uniform",
        video_min_flagged_frames=int(args.get("nsfw_check_video_min_flagged_frames", 1) or 1),
        delete_fn=(backend.delete if (delete and backend is not None) else None),
    )


def build_storage_backend(config: DatasetConfig, compress_cache: bool = False) -> BaseDataBackend:
    if config.type == "local":
        return LocalDataBackend(config.id, config.instance_data_dir, compress_cache)
    if config.type == "memory":
        return MemoryDataBackend(config.id, compress_cache)
    if config.type == "aws":
        from .backends.aws import S3DataBackend

        return S3DataBackend(config, compress_cache)
    if config.type == "csv":
        from .backends.csv_url import CSVDataBackend

        return CSVDataBackend(config, compress_cache)
    if config.type == "huggingface":
        from .backends.huggingface import HuggingfaceDatasetsBackend

        return HuggingfaceDatasetsBackend(config, compress_cache)
    if config.type == "webshart":
        from .backends.webshart import WebshartDataBackend

        return WebshartDataBackend(config, compress_cache)
    raise ValueError(f"unsupported storage backend type {config.type!r}")


def bucket_config_for(config: DatasetConfig, args) -> BucketConfig:
    return BucketConfig(
        resolution=config.resolution or args.get("resolution", 1024),
        resolution_type=config.resolution_type or args.get("resolution_type", "pixel_area"),
        aspect_bucket_rounding=config.aspect_bucket_rounding or args.get("aspect_bucket_rounding", 2) or 2,
        aspect_bucket_alignment=config.aspect_bucket_alignment or args.get("aspect_bucket_alignment", 64) or 64,
        minimum_image_size=config.minimum_image_size,
        maximum_image_size=config.maximum_image_size,
        target_downsample_size=config.target_downsample_size,
        minimum_aspect_ratio=config.minimum_aspect_ratio,
        maximum_aspect_ratio=config.maximum_aspect_ratio,
        crop=bool(config.crop),
        crop_aspect=config.crop_aspect or "square",
        crop_aspect_buckets=config.crop_aspect_buckets,
        square_padding=bool(config.square_padding),
        max_upscale_threshold=(
            config.max_upscale_threshold
            if config.max_upscale_threshold is not None
            else args.get("max_upscale_threshold")
        ),
    )


def _build_streaming_bundle(
    config,
    backend,
    bucket_cfg,
    args,
    model,
    vae_encode_fn,
    text_caches,
    default_text_id,
    global_batch_size,
    process_index,
    num_processes,
):
    """Assemble a DatasetBundle for a streaming backend: per-row bucket scan,
    host-local batches, ephemeral on-demand caches.  All impossible
    configurations fail at config time (reference factory fail-loud contract)."""
    from .streaming import StreamingMetadataBackend, StreamingSampler

    if config.dataset_type != "image":
        raise ValueError(
            f"dataset {config.id}: streaming mode currently supports "
            f"dataset_type=image (got {config.dataset_type!r}); video/audio "
            "streams need per-row frame probing that is not implemented yet"
        )
    strategy = config.caption_strategy or "huggingface"
    if strategy not in ("huggingface", "instanceprompt"):
        raise ValueError(
            f"dataset {config.id}: streaming datasets carry captions in dataset "
            f"columns — set caption_strategy to 'huggingface' (or "
            f"'instanceprompt'), not {strategy!r}; filename/textfile strategies "
            "would caption every sample with its stream position"
        )
    config.caption_strategy = strategy
    if vae_encode_fn is None:
        raise ValueError(
            f"dataset {config.id}: streaming datasets encode latents on the fly "
            "and need a live VAE (no pre-cached latents exist for an unbounded "
            "stream)"
        )
    text_id = config.text_embeds or default_text_id
    text_cache = text_caches.get(text_id)
    needs_text_cache = not (
        getattr(model, "trains_text_encoder", False)
        or (getattr(model, "uses_audio_tokens", None) is not None and model.uses_audio_tokens())
    )
    if needs_text_cache and (text_cache is None or not text_cache.ondemand):
        raise ValueError(
            f"dataset {config.id}: streaming datasets cannot precompute text "
            "embeds (the caption set is unbounded) — set text_cache_ondemand=true "
            f"on the text_embeds dataset ({text_id!r})"
        )

    total_batch = int(global_batch_size or args.get("train_batch_size", 1) or 1)
    if total_batch % max(num_processes, 1) != 0:
        raise ValueError(
            f"dataset {config.id}: streaming emits host-local batches, so the "
            f"global batch ({total_batch}) must divide evenly across "
            f"{num_processes} processes"
        )
    local_batch = total_batch // max(num_processes, 1)

    extra = getattr(config, "extra", {}) or {}
    metadata = StreamingMetadataBackend(
        id=config.id,
        data_backend=backend,
        bucket_config=bucket_cfg,
        metadata_window=getattr(backend, "stream_window", 8192),
    )
    sampler = StreamingSampler(
        id=config.id,
        backend=backend,
        metadata_backend=metadata,
        batch_size=local_batch,
        max_buffered_buckets=int(extra.get("max_buffered_buckets", 64) or 64),
    )
    from ..caching.vae_cache import VAECache

    vae_cache = VAECache(
        id=config.id,
        data_backend=backend,
        metadata_backend=metadata,
        cache_dir=config.cache_dir_vae
        or os.path.join(args.get("cache_dir", "cache"), "vae", config.id),
        encode_fn=vae_encode_fn,
        bucket_config=bucket_cfg,
        batch_size=int(args.get("vae_batch_size", 4) or 4),
        crop_style=config.crop_style if config.crop else "random",
        ondemand=True,
        ephemeral=True,  # stream positions are not stable keys across epochs
        seed=int(args.get("seed", 42) or 42),
        transfer_dtype="uint8" if getattr(vae_encode_fn, "handles_uint8", False) else "float32",
    )
    return DatasetBundle(
        id=config.id,
        config=config,
        data_backend=backend,
        metadata_backend=metadata,
        sampler=sampler,
        vae_cache=vae_cache,
        text_cache=text_cache,
    )


class DataPlane:
    """The assembled data plane: bundles + iterator + caches."""

    def __init__(self, bundles, text_caches, iterator, startup_metrics=None, distillation_caches=None):
        self.bundles: Dict[str, DatasetBundle] = bundles
        self.text_caches = text_caches
        self.iterator: MultiDatasetIterator = iterator
        # per-stage startup durations + RSS (reference factory.py:1415-1451
        # FactoryRegistry performance metrics)
        self.startup_metrics: Dict[str, float] = startup_metrics or {}
        # teacher ODE-pair stores (reference DatasetType.DISTILLATION_CACHE)
        self.distillation_caches: Dict[str, Any] = distillation_caches or {}

    def save_state(self):
        return self.iterator.save_state()

    def load_state(self, state):
        self.iterator.load_state(state)

    def tag_frequency(self, max_files_per_dataset: int = 2000) -> Dict[str, Dict[str, int]]:
        """{dataset_id: {tag: count}} from caption content (reference
        save_hooks.py:593-610 ``ss_tag_frequency`` for ComfyUI trigger-word
        extensions).  Tags split on commas, whitespace-normalized."""
        from .captions import get_caption

        frequency: Dict[str, Dict[str, int]] = {}
        for bundle in self.bundles.values():
            cfg = bundle.config
            if getattr(cfg, "dataset_type", "image") not in ("image", "video", "audio"):
                continue
            counts: Dict[str, int] = {}
            files = []
            for bucket_files in bundle.metadata_backend.aspect_ratio_bucket_indices.values():
                files.extend(bucket_files)
            for path in files[:max_files_per_dataset]:
                try:
                    caption = get_caption(
                        path,
                        bundle.data_backend,
                        strategy=getattr(cfg, "caption_strategy", None) or "textfile",
                        instance_prompt=getattr(cfg, "instance_prompt", None),
                        prepend_instance_prompt=bool(getattr(cfg, "prepend_instance_prompt", False)),
                        only_instance_prompt=bool(getattr(cfg, "only_instance_prompt", False)),
                    )
                except Exception:
                    continue
                for tag in str(caption or "").split(","):
                    tag = tag.strip()
                    if tag:
                        counts[tag] = counts.get(tag, 0) + 1
            if counts:
                frequency[bundle.id] = counts
        return frequency

    def trigger_words(self) -> List[str]:
        """Instance prompts across datasets (reference _collect_trigger_words)."""
        words: List[str] = []
        for bundle in self.bundles.values():
            prompt = getattr(bundle.config, "instance_prompt", None)
            if prompt and str(prompt) not in words:
                words.append(str(prompt))
        return words


def configure_multi_databackend(
    args,
    model,
    vae_encode_fn: Optional[Callable] = None,
    process_index: int = 0,
    num_processes: int = 1,
    run_caching: bool = True,
    global_batch_size: Optional[int] = None,
) -> DataPlane:
    """Build the full data plane from args.data_backend_config.

    ``model`` supplies ``encode_text``/``collate_text_embeds`` and the family name
    for the text-cache hash suffix. ``vae_encode_fn(images_nhwc, count) ->
    latents`` feeds the VAE cache (omit to require fully-precached latents).
    """
    from ..caching.text_embeds import TextEmbeddingCache
    from ..caching.vae_cache import VAECache

    raw = args.get("data_backend_config")
    configs = load_dataloader_config(
        raw,
        # codec-token families (HeartMuLa) tokenize tags/lyrics into the
        # token grid at collate time — no text-embed cache needed
        require_text_embeds=not (
            getattr(model, "uses_audio_tokens", None) is not None
            and model.uses_audio_tokens()
        ),
        global_defaults={
            "resolution": args.get("resolution"),
            "resolution_type": args.get("resolution_type"),
            "caption_strategy": args.get("caption_strategy"),
            "minimum_image_size": args.get("minimum_image_size"),
            "maximum_image_size": args.get("maximum_image_size"),
            "target_downsample_size": args.get("target_downsample_size"),
            "aspect_bucket_rounding": args.get("aspect_bucket_rounding"),
            "aspect_bucket_alignment": args.get("aspect_bucket_alignment"),
        },
    )
    compress = bool(args.get("compress_disk_cache", False))
    import logging
    import time as _time

    _logger = logging.getLogger(__name__)
    metrics: Dict[str, float] = {}
    _t0 = _time.perf_counter()

    def _stage(name: str) -> None:
        nonlocal _t0
        now = _time.perf_counter()
        metrics[name] = round(now - _t0, 3)
        _t0 = now

    storage: Dict[str, BaseDataBackend] = {}
    for config in configs:
        storage[config.id] = build_storage_backend(config, compress)
        # streaming backends consume disjoint per-process shards (map-style
        # datasets shard at the sampler layer instead)
        if hasattr(storage[config.id], "configure_sharding"):
            storage[config.id].configure_sharding(process_index, num_processes)

    # ---- text embed caches ----------------------------------------------------------------
    text_caches: Dict[str, TextEmbeddingCache] = {}
    for config in configs:
        if config.dataset_type != "text_embeds":
            continue
        cache_dir = config.cache_dir or os.path.join(args.get("cache_dir", "cache"), "text", config.id)
        text_caches[config.id] = TextEmbeddingCache(
            id=config.id,
            data_backend=storage[config.id],
            cache_dir=cache_dir,
            model_type=model.NAME,
            encode_fn=(lambda prompts: model.encode_text(prompts)) if hasattr(model, "text_encoders") else None,
            batch_size=config.text_encoder_batch_size or args.get("text_encoder_batch_size", 4) or 4,
            write_batch_size=config.write_batch_size or args.get("write_batch_size", 128) or 128,
            ondemand=bool(config.text_cache_ondemand or args.get("text_cache_ondemand", False)),
            disabled=bool(config.text_cache_disable or args.get("text_cache_disable", False)),
        )
    default_text_id = get_default_text_embed_id(configs)

    # ---- distillation caches (teacher ODE pairs) --------------------------------------------
    distillation_caches: Dict[str, Any] = {}
    for config in configs:
        if config.dataset_type != "distillation_cache":
            continue
        from ..caching.distillation import DistillationCache

        cache_dir = config.cache_dir or os.path.join(
            args.get("cache_dir", "cache"), "distillation", config.id
        )
        distillation_caches[config.id] = DistillationCache(
            id=config.id,
            data_backend=storage[config.id],
            cache_dir=cache_dir,
            distillation_type=config.distillation_type,
        )
    _stage("configure_backends_s")

    # ---- primary datasets -------------------------------------------------------------------
    bundles: Dict[str, DatasetBundle] = {}
    for config in configs:
        if config.dataset_type not in ("image", "video", "audio", "conditioning", "eval", "caption"):
            continue
        backend = storage[config.id]
        bucket_cfg = bucket_config_for(config, args)

        if getattr(backend, "streaming", False):
            bundles[config.id] = _build_streaming_bundle(
                config, backend, bucket_cfg, args, model, vae_encode_fn,
                text_caches, default_text_id, global_batch_size,
                process_index, num_processes,
            )
            continue

        metadata_cls = ParquetMetadataBackend if config.caption_strategy == "parquet" and config.parquet else MetadataBackend
        kwargs = {}
        if metadata_cls is ParquetMetadataBackend:
            kwargs["parquet_config"] = config.parquet
        cache_base = config.instance_data_dir or os.path.join(args.get("cache_dir", "cache"), config.id)
        if metadata_cls is MetadataBackend:
            kwargs["dataset_type"] = config.dataset_type if config.dataset_type != "eval" else "image"
            kwargs["video_config"] = config.audio if config.dataset_type == "audio" else config.video
        metadata = metadata_cls(
            id=config.id,
            data_backend=backend,
            bucket_config=bucket_cfg,
            instance_data_dir=config.instance_data_dir,
            cache_file=os.path.join(cache_base, "aspect_ratio_bucket_indices.json"),
            metadata_file=os.path.join(cache_base, "aspect_ratio_bucket_metadata.json"),
            repeats=config.repeats,
            **kwargs,
        )
        if num_processes > 1:
            metadata.rank_suffix = f".rank{process_index}"
        metadata.refresh(max_workers=int(args.get("max_workers", 16) or 16))

        sampler = MultiAspectSampler(
            id=config.id,
            metadata_backend=metadata,
            # train_batch_size is per-device (reference semantics); the global
            # batch a sampler emits is per-device × batch shards on the mesh
            batch_size=int(global_batch_size or args.get("train_batch_size", 1) or 1),
            seed=int(args.get("seed", 42) or 42),
            repeats=config.repeats,
        )

        vae_cache_dir = config.cache_dir_vae or os.path.join(args.get("cache_dir", "cache"), "vae", config.id)
        image_embed_backend = storage.get(config.image_embeds) if config.image_embeds else backend
        # caption-only datasets (reference data_backend/caption_dataset.py)
        # have no pixels: no VAE cache, latents are synthesized at collate
        vae_cache = None if config.dataset_type == "caption" else VAECache(
            id=config.id,
            data_backend=backend,
            cache_data_backend=image_embed_backend,
            metadata_backend=metadata,
            cache_dir=vae_cache_dir,
            encode_fn=vae_encode_fn,
            bucket_config=bucket_cfg,
            instance_data_dir=config.instance_data_dir,
            batch_size=int(args.get("vae_batch_size", 4) or 4),
            crop_style=config.crop_style if config.crop else "random",
            hash_filenames=bool(config.hash_filenames),
            ondemand=bool(config.vae_cache_ondemand or args.get("vae_cache_ondemand", False)),
            seed=int(args.get("seed", 42) or 42),
            nsfw_filter=_build_nsfw_filter(args, config=config, backend=backend),
            transfer_dtype="uint8" if getattr(vae_encode_fn, "handles_uint8", False) else "float32",
        )

        # image-embed cache (reference conditioning_image_embeds linkage):
        # CLIP-vision features per sample, used as IP-adapter conditioning or
        # CREPA teacher embeds
        image_embed_cache = None
        if config.conditioning_image_embeds:
            from ..caching.image_embed import ImageEmbedCache, build_clip_vision_encode_fn

            tiny = args.get("model_arch_preset") == "tiny"
            encode_fn, image_size = build_clip_vision_encode_fn(
                args.get("image_embed_model"), tiny=tiny
            )
            embed_dir = os.path.join(args.get("cache_dir", "cache"), "image_embeds", config.id)
            image_embed_cache = ImageEmbedCache(
                id=f"{config.id}-image-embeds",
                data_backend=backend,
                cache_dir=embed_dir,
                encode_fn=lambda arrs: encode_fn(arrs),
                image_size=image_size,
            )

        text_id = config.text_embeds or default_text_id
        bundles[config.id] = DatasetBundle(
            id=config.id,
            config=config,
            data_backend=backend,
            metadata_backend=metadata,
            sampler=sampler,
            vae_cache=vae_cache,
            text_cache=text_caches.get(text_id),
            image_embed_cache=image_embed_cache,
        )

    # conditioning links (fail loud on dangling ids: the reference validates
    # conditioning deps at factory time, factory.py:1083 topo-sort)
    for config in configs:
        if config.conditioning_data and config.id in bundles:
            targets = config.conditioning_data if isinstance(config.conditioning_data, list) else [config.conditioning_data]
            missing = [t for t in targets if t not in bundles]
            if missing:
                raise ValueError(
                    f"dataset {config.id!r} references conditioning_data {missing} "
                    f"but no dataset with those ids exists (have: {sorted(bundles)})"
                )
            bundles[config.id].conditioning_bundles = [bundles[t] for t in targets]

    # ---- caching passes -----------------------------------------------------------------------
    if run_caching:
        for bundle in bundles.values():
            if getattr(bundle.metadata_backend, "is_streaming", False):
                # streaming datasets have no enumerable sample set: both
                # caches run on demand per batch (validated at bundle build)
                continue
            if bundle.config.dataset_type == "conditioning":
                # conditioning datasets need latents (for control/edit pairing)
                # but never text embeds; mask conditioning reads raw pixels
                if (bundle.config.conditioning_type or "").lower() == "mask":
                    continue
                if vae_encode_fn is not None and not args.get("vae_cache_disable"):
                    bundle.vae_cache.process_buckets(
                        process_index=process_index, num_processes=num_processes
                    )
                continue
            if (
                bundle.config.dataset_type == "audio"
                and getattr(model, "uses_audio_tokens", None) is not None
                and model.uses_audio_tokens()
            ):
                # pre-tokenised codec training (HeartMuLa): tokens are already
                # on disk, tags/lyrics tokenize into the grid at collate time
                continue
            # text embeds for every caption in the dataset (skipped when the
            # text encoder trains: embeds are recomputed every step from the
            # live TE params, a cache would be stale by construction)
            if (
                bundle.text_cache is not None
                and bundle.text_cache.encode_fn is not None
                and not getattr(model, "trains_text_encoder", False)
            ):
                from .captions import get_caption

                captions = []
                for files in bundle.metadata_backend.aspect_ratio_bucket_indices.values():
                    for path in files:
                        captions.append(
                            get_caption(
                                path,
                                bundle.data_backend,
                                strategy=bundle.config.caption_strategy,
                                instance_prompt=bundle.config.instance_prompt,
                                prepend_instance_prompt=bundle.config.prepend_instance_prompt,
                                only_instance_prompt=bundle.config.only_instance_prompt,
                                metadata_row=bundle.metadata_backend.image_metadata.get(path, {}).get("row"),
                                parquet_config=bundle.config.parquet,
                            )
                        )
                if args.get("caption_dropout_probability"):
                    captions.append("")  # dropout sentinel
                bundle.text_cache.compute_embeddings_for_prompts(
                    captions, process_index=process_index, num_processes=num_processes
                )
            if (
                vae_encode_fn is not None
                and bundle.vae_cache is not None
                and not args.get("vae_cache_disable")
            ):
                bundle.vae_cache.process_buckets(
                    process_index=process_index, num_processes=num_processes
                )
            if bundle.image_embed_cache is not None:
                files = [
                    path
                    for file_list in bundle.metadata_backend.aspect_ratio_bucket_indices.values()
                    for path in file_list
                ]
                bundle.image_embed_cache.process_files(
                    files, process_index=process_index, num_processes=num_processes
                )

    _stage("caching_passes_s" if run_caching else "build_bundles_s")
    try:
        import resource

        metrics["peak_rss_mb"] = round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
        )
    except Exception:
        pass
    _logger.info("data plane ready: %s", metrics)
    # --eval_dataset_id marks regular datasets as held-out eval splits: they
    # are excluded from the train iterator (reference trainer.py:6432-6437)
    # and consumed by EvalLoss instead
    eval_ids = args.get("eval_dataset_id")
    eval_ids = (
        set() if not eval_ids
        else {eval_ids} if isinstance(eval_ids, str)
        else set(eval_ids)
    )
    unknown_eval = eval_ids - set(bundles)
    if unknown_eval:
        raise ValueError(
            f"--eval_dataset_id references unknown dataset(s): {sorted(unknown_eval)} "
            f"(have: {sorted(bundles)}) — reference validation.py:496"
        )
    train_bundles = [
        b for b in bundles.values()
        if b.config.dataset_type in ("image", "video", "audio", "caption")
        and b.id not in eval_ids
    ]
    iterator = MultiDatasetIterator(
        train_bundles,
        model,
        caption_dropout_probability=float(args.get("caption_dropout_probability", 0.0) or 0.0),
        seed=int(args.get("seed", 42) or 42),
        process_index=process_index,
        num_processes=num_processes,
        grad_accum_steps=int(args.get("gradient_accumulation_steps", 1) or 1),
        conditioning_sampling=str(
            # reference field-registry default (sections/data.py:117): random
            args.get("conditioning_multidataset_sampling") or "random"
        ),
    )
    return DataPlane(
        bundles, text_caches, iterator,
        startup_metrics=metrics, distillation_caches=distillation_caches,
    )
