"""Collate + multi-dataset iteration.

Reference: helpers/training/collate.py:572 ``collate_fn`` (threaded cache reads,
size/time-id conditioning, conditioning pairing) and
helpers/data_backend/runtime/dataloader_iterator.py:36,267 (weighted round-robin
over datasets with schedule windows).  Output batches are numpy dicts with
*static shapes per bucket* — the TPU compile-cache key.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .captions import get_caption
from .sampler import MultiAspectSampler


class DatasetBundle:
    """Everything one primary dataset needs at train time."""

    def __init__(
        self,
        id: str,
        config,  # DatasetConfig
        data_backend,
        metadata_backend,
        sampler: MultiAspectSampler,
        vae_cache=None,
        text_cache=None,
        conditioning_bundles: Optional[List["DatasetBundle"]] = None,
        image_embed_cache=None,
    ):
        self.id = id
        self.config = config
        self.data_backend = data_backend
        self.metadata_backend = metadata_backend
        self.sampler = sampler
        self.vae_cache = vae_cache
        self.text_cache = text_cache
        self.conditioning_bundles = conditioning_bundles or []
        self.image_embed_cache = image_embed_cache


_LOGGED_ONCE: set = set()


def _log_once(message: str) -> None:
    if message not in _LOGGED_ONCE:
        _LOGGED_ONCE.add(message)
        import logging

        logging.getLogger(__name__).warning(message)


def collate_batch(
    samples: List[Dict[str, Any]],
    bundle: DatasetBundle,
    model,
    caption_dropout_probability: float = 0.0,
    rng: Optional[random.Random] = None,
    max_workers: int = 8,
    conditioning_sampling: str = "random",
) -> Dict[str, Any]:
    """Fetch cached latents + text embeds for one sampler batch and stack."""
    rng = rng or random
    cfg = bundle.config

    if cfg.dataset_type == "caption":
        # caption-only batches (reference data_backend/caption_dataset.py):
        # prompts + embeds + a latent-shaped placeholder (on-policy distillers
        # like self_forcing generate their own samples; only the shape matters)
        captions = []
        for sample in samples:
            captions.append(
                get_caption(
                    sample["image_path"], bundle.data_backend,
                    strategy=cfg.caption_strategy or "textfile",
                    instance_prompt=cfg.instance_prompt,
                )
            )
        embeds = [bundle.text_cache.get(c) for c in captions]
        res = float(cfg.resolution or 1.0)
        side = int((res * 1_000_000) ** 0.5) if res < 32 else int(res)
        side = max(side // 8, 4)
        channels = getattr(model, "latent_channels", 4)
        batch = {
            "latents": np.zeros((len(samples), side, side, channels), np.float32),
            "captions": captions,
            "caption_only": np.asarray(1.0, np.float32),
            "dataset_id": bundle.id,
            "bucket": "caption",
            "image_paths": [s["image_path"] for s in samples],
        }
        batch.update(model.collate_text_embeds(embeds))
        return batch

    if (
        cfg.dataset_type == "audio"
        and getattr(model, "uses_audio_tokens", None) is not None
        and model.uses_audio_tokens()
    ):
        # pre-tokenised codec training (HeartMuLa; reference
        # heartmula/model.py:401-481 collate_audio_tokens): tags/lyrics ride
        # parquet rows or sidecar files, codec frames come from .npy token
        # matrices — no VAE or text-embed cache in this path
        from .audio import load_token_matrix

        examples = []
        for sample in samples:
            path = sample["image_path"]
            row = (sample.get("metadata") or {}).get("row") or (
                bundle.metadata_backend.image_metadata.get(path, {}) or {}
            ).get("row") or {}
            tags = row.get("tags") or row.get("prompt")
            lyrics = row.get("lyrics")
            stem = path.rsplit(".", 1)[0]
            if tags is None:
                tags_path = stem + ".txt"
                if bundle.data_backend.exists(tags_path):
                    tags = bundle.data_backend.read(tags_path).decode("utf-8")
            if lyrics is None:
                lyrics_path = stem + ".lyrics.txt"
                if bundle.data_backend.exists(lyrics_path):
                    lyrics = bundle.data_backend.read(lyrics_path).decode("utf-8")
            if tags is None:
                raise ValueError(
                    f"{model.NAME} requires 'tags' (or 'prompt') for {path}: provide a "
                    "parquet column or a sidecar .txt file"
                )
            if lyrics is None:
                raise ValueError(
                    f"{model.NAME} requires 'lyrics' for {path}: provide a parquet "
                    "column or a sidecar .lyrics.txt file"
                )
            examples.append(
                {
                    "tags": str(tags),
                    "lyrics": str(lyrics),
                    "audio_tokens": load_token_matrix(bundle.data_backend, path),
                }
            )
        batch = model.collate_token_batch(examples)
        batch.update(
            {
                "captions": [e["tags"] for e in examples],
                "dataset_id": bundle.id,
                "bucket": samples[0]["bucket"],
                "image_paths": [s["image_path"] for s in samples],
            }
        )
        return batch

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        latents = list(pool.map(lambda s: bundle.vae_cache.get(s["image_path"]), samples))

    captions = []
    for sample in samples:
        caption = get_caption(
            sample["image_path"],
            bundle.data_backend,
            strategy=cfg.caption_strategy,
            instance_prompt=cfg.instance_prompt,
            prepend_instance_prompt=cfg.prepend_instance_prompt,
            only_instance_prompt=cfg.only_instance_prompt,
            metadata_row=sample.get("metadata", {}).get("row"),
            parquet_config=cfg.parquet,
        )
        if caption_dropout_probability and rng.random() < caption_dropout_probability:
            caption = ""
        captions.append(caption)

    batch: Dict[str, Any] = {
        "latents": np.stack(latents).astype(np.float32),
        "captions": captions,
        "dataset_id": bundle.id,
        "bucket": samples[0]["bucket"],
        "image_paths": [s["image_path"] for s in samples],
    }
    if getattr(model, "trains_text_encoder", False):
        # text-encoder training: captions ride as fixed-shape token ids and
        # encode inside the train step (reference collate tokenizes when the
        # TE joins the optimizer); the embed cache is bypassed entirely
        batch.update(model.tokenize_captions(captions))
    else:
        embeds = [bundle.text_cache.get(c) for c in captions]
        batch.update(model.collate_text_embeds(embeds))

    # conditioning pairing (ControlNet/edit): fetch the same-named sample's
    # latents from every linked conditioning dataset (reference collate.py:733-994
    # multi-backend conditioning collection; sampler.py connect_conditioning_samples).
    # Mask-type backends become latent-resolution loss masks; reference/untyped
    # backends become control latents.  Unmatched pairs are a hard error
    # (reference collate.py:755-771 "Each conditioning backend must supply one
    # sample per training example") — silently training unconditioned hides a
    # broken dataset.
    if bundle.conditioning_bundles:
        _MASK_TYPES = ("mask", "segmentation")

        def make_cond_path(cond_bundle):
            src_root = bundle.config.instance_data_dir or ""
            dst_root = cond_bundle.config.instance_data_dir or ""

            def cond_path(path: str) -> str:
                if src_root and path.startswith(src_root):
                    return dst_root + path[len(src_root):]
                import os as _os

                return _os.path.join(dst_root, _os.path.basename(path))

            return cond_path

        mask_bundles = [
            b for b in bundle.conditioning_bundles
            if (b.config.conditioning_type or "").lower() in _MASK_TYPES
        ]
        ref_bundles = [
            b for b in bundle.conditioning_bundles
            if (b.config.conditioning_type or "").lower() not in _MASK_TYPES
        ]

        if mask_bundles:
            # pixel masks -> latent-resolution loss masks (reference masked loss;
            # conditioning_type=mask/segmentation datasets).  Multiple mask
            # backends: first by order, like the reference's precedence pick
            # (collate.py:884-894).
            if len(mask_bundles) > 1:
                _log_once(
                    f"dataset {bundle.id}: multiple loss-mask conditioning datasets "
                    f"linked ({[b.id for b in mask_bundles]}); using {mask_bundles[0].id}"
                )
            cond_bundle = mask_bundles[0]
            cond_path = make_cond_path(cond_bundle)
            latent_h, latent_w = batch["latents"].shape[1:3]
            masks = []
            for sample in samples:
                import io as _io

                from PIL import Image as _Image

                path = cond_path(sample["image_path"])
                try:
                    raw = cond_bundle.data_backend.read(path)
                except (OSError, KeyError, FileNotFoundError) as exc:
                    raise ValueError(
                        f"conditioning dataset {cond_bundle.id!r} has no mask for "
                        f"training sample {sample['image_path']!r} (looked for "
                        f"{path!r}): every training sample needs a paired mask"
                    ) from exc
                mask = _Image.open(_io.BytesIO(raw)).convert("L").resize(
                    (latent_w, latent_h), _Image.BILINEAR
                )
                masks.append((np.asarray(mask, np.float32) / 255.0 > 0.5).astype(np.float32))
            # --masked_loss_probability (reference masked-loss training):
            # apply the mask to only a fraction of batches; the rest train on
            # the full frame so the background doesn't collapse. 1.0 = always.
            mask_prob = float(getattr(model.config, "masked_loss_probability", 1.0) or 1.0)
            if mask_prob >= 1.0 or rng.random() < mask_prob:
                batch["loss_mask"] = np.stack(masks)[..., None]

        if ref_bundles:
            if conditioning_sampling == "random" and len(ref_bundles) > 1:
                # one conditioning sample per training example, drawn from a
                # random backend (reference collate.py:744-752 random mode)
                ref_bundles = [rng.choice(ref_bundles)]
            per_backend = []
            for cond_bundle in ref_bundles:
                cond_path = make_cond_path(cond_bundle)

                def fetch(s, _cb=cond_bundle, _cp=cond_path):
                    path = _cp(s["image_path"])
                    try:
                        return _cb.vae_cache.get(path)
                    except (KeyError, OSError, FileNotFoundError) as exc:
                        raise ValueError(
                            f"conditioning dataset {_cb.id!r} has no sample for "
                            f"training sample {s['image_path']!r} (looked for "
                            f"{path!r}): every conditioning backend must supply "
                            "one sample per training example"
                        ) from exc

                with ThreadPoolExecutor(max_workers=max_workers) as pool:
                    control = list(pool.map(fetch, samples))
                per_backend.append(np.stack(control).astype(np.float32))
            if len(per_backend) == 1:
                batch["control_latents"] = per_backend[0]
            elif getattr(model, "supports_multi_reference", lambda: False)():
                # multi-reference edit conditioning (flux kontext et al.):
                # (B, N_refs, H, W, C); the model packs each ref with its own
                # t-index (reference flux/model.py:517 build_kontext_inputs)
                batch["control_latents"] = np.stack(per_backend, axis=1)
            else:
                _log_once(
                    f"dataset {bundle.id}: {len(per_backend)} reference conditioning "
                    f"datasets linked but {model.NAME} consumes one; using "
                    f"{ref_bundles[0].id} (reference collate.py:884-894 precedence)"
                )
                batch["control_latents"] = per_backend[0]

    # S2V audio pairing: same-stem .wav next to each video becomes audio
    # features (reference wan_s2v audio pairing; sampler.py
    # connect_conditioning_samples S2V branch)
    if (getattr(cfg, "audio", None) or {}).get("pair_with_video"):
        import os as _os

        from .audio import load_audio, waveform_features

        audio_cfg = cfg.audio or {}
        sample_rate = int(audio_cfg.get("sample_rate", 16000))
        max_frames = int(audio_cfg.get("max_feature_frames", 128))
        features = []
        for sample in samples:
            wav_path = _os.path.splitext(sample["image_path"])[0] + ".wav"
            wave = load_audio(bundle.data_backend, wav_path, sample_rate=sample_rate)
            if wave is None:
                features = []
                break
            feats = waveform_features(wave, sample_rate=sample_rate)
            if feats.shape[0] >= max_frames:
                feats = feats[:max_frames]
            else:
                feats = np.pad(feats, ((0, max_frames - feats.shape[0]), (0, 0)))
            features.append(feats)
        if features:
            batch["audio_embeds"] = np.stack(features)

    # image-embed conditioning (IP-adapter style / CREPA teacher features;
    # reference collate.py conditioning image embeds)
    if bundle.image_embed_cache is not None:
        # fail loud on a missing entry: silently dropping teacher_embeds would
        # let a CREPA/IP-adapter run train without its conditioning (the exact
        # accept-and-degrade pattern banned elsewhere; reference errors at
        # factory time)
        def _fetch_teacher(sample):
            try:
                return bundle.image_embed_cache.get(sample["image_path"])
            except (KeyError, IOError) as exc:
                raise RuntimeError(
                    "image-embed cache has no entry for "
                    f"{sample['image_path']!r} (dataset {bundle.id!r}); "
                    "re-run the image-embed caching pass — training without "
                    "the conditioning would silently change the objective"
                ) from exc

        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            teacher = list(pool.map(_fetch_teacher, samples))
        batch["teacher_embeds"] = np.stack(teacher).astype(np.float32)

    # size conditioning (SDXL/PixArt time-ids; reference collate.py)
    metas = [s.get("metadata", {}) for s in samples]
    if all("original_size" in m for m in metas):
        batch["original_sizes"] = np.asarray([m["original_size"] for m in metas], np.int32)
    if all("crop_coordinates" in m for m in metas):
        batch["crop_coordinates"] = np.asarray([m["crop_coordinates"] for m in metas], np.int32)
    if all("target_size" in m for m in metas):
        batch["target_sizes"] = np.asarray([m["target_size"] for m in metas], np.int32)
    if getattr(cfg, "is_regularisation_data", False):
        # prior-preservation flag: the train step swaps the target for the
        # parent (adapter-disabled) prediction (reference trainer.py:6565)
        batch["is_regularisation_data"] = np.asarray(1.0, np.float32)
    # family-specific extras (e.g. ACE-Step lyric tokens from parquet rows /
    # sidecar files; reference model.py prepare_batch extracts lyrics from
    # latent metadata at :1656-1664)
    collate_extras = getattr(model, "collate_batch_extras", None)
    if collate_extras is not None:
        collate_extras(samples, bundle, batch)
    return batch


class MultiDatasetIterator:
    """Weighted sampling over multiple datasets with schedule windows and
    epoch-exhaustion tracking (reference dataloader_iterator.py)."""

    def __init__(
        self,
        bundles: Sequence[DatasetBundle],
        model,
        caption_dropout_probability: float = 0.0,
        seed: int = 42,
        process_index: int = 0,
        num_processes: int = 1,
        grad_accum_steps: int = 1,
        conditioning_sampling: str = "combined",
    ):
        if not bundles:
            raise ValueError("no datasets to iterate")
        if conditioning_sampling not in ("combined", "random"):
            raise ValueError(
                f"unknown conditioning_multidataset_sampling mode {conditioning_sampling!r}: "
                "must be 'combined' or 'random' (reference sampler.py:874)"
            )
        self.bundles = list(bundles)
        self.model = model
        self.conditioning_sampling = conditioning_sampling
        self.caption_dropout_probability = caption_dropout_probability
        self.rng = random.Random(seed)
        self._iters: Dict[str, Iterator] = {}
        self._exhausted: set = set()
        self.epoch = 0
        # Multi-host: samplers run deterministically-identically on every
        # process (same seed → same global batch metadata); each host collates
        # only its own slice of the global batch and the trainer reassembles
        # via jax.make_array_from_process_local_data (parallel/distributed.py).
        self.process_index = int(process_index)
        self.num_processes = max(int(num_processes), 1)
        self.grad_accum_steps = max(int(grad_accum_steps), 1)

    def _weight(self, bundle: DatasetBundle) -> float:
        if bundle.config.dataset_weight is not None:
            return float(bundle.config.dataset_weight)
        # --data_backend_sampling (reference get_backend_weight,
        # factory.py:4973): "uniform" ignores dataset size; "auto-weighting"
        # scales selection by sample count so large datasets are not starved
        mode = str(getattr(self.model.config, "data_backend_sampling", "uniform")
                   or "uniform").replace("_", "-")
        if mode == "auto-weighting" and bundle.config.probability is None:
            try:
                size = float(len(bundle.sampler))
            except TypeError:
                size = 1.0
            return max(size, 1.0)
        return float(bundle.config.probability or 1.0)

    def _active_bundles(self, step: int) -> List[DatasetBundle]:
        active = []
        for bundle in self.bundles:
            c = bundle.config
            if c.start_step is not None and step < c.start_step:
                continue
            if c.end_step is not None and step >= c.end_step:
                continue
            if c.start_epoch is not None and self.epoch < c.start_epoch:
                continue
            if c.end_epoch is not None and self.epoch >= c.end_epoch:
                continue
            active.append(bundle)
        return active or list(self.bundles)

    def _next_from(self, bundle: DatasetBundle) -> Optional[List[Dict[str, Any]]]:
        it = self._iters.get(bundle.id)
        if it is None:
            it = iter(bundle.sampler)
            self._iters[bundle.id] = it
        try:
            return next(it)
        except StopIteration:
            self._exhausted.add(bundle.id)
            self._iters[bundle.id] = None
            return None

    def __next__(self) -> Dict[str, Any]:
        return self.next_batch(step=0)

    def next_batch(self, step: int = 0) -> Dict[str, Any]:
        """Returns one collated batch; rolls the epoch when all datasets exhaust."""
        for _ in range(len(self.bundles) * 2 + 2):
            candidates = [b for b in self._active_bundles(step) if b.id not in self._exhausted]
            if not candidates:
                # epoch rollover: all datasets exhausted
                self.epoch += 1
                self._exhausted.clear()
                self._iters.clear()
                candidates = self._active_bundles(step)
            weights = [self._weight(b) for b in candidates]
            bundle = self.rng.choices(candidates, weights=weights, k=1)[0]
            samples = self._next_from(bundle)
            if samples is not None:
                # streaming samplers consume a rank-disjoint shard and emit
                # host-local batches directly; the identical-global-batch +
                # slice contract below applies to map-style samplers only
                if self.num_processes > 1 and not getattr(
                    bundle.sampler, "emits_local_batches", False
                ):
                    from ..parallel.distributed import host_local_indices

                    idx = host_local_indices(
                        len(samples),
                        self.grad_accum_steps,
                        self.process_index,
                        self.num_processes,
                    )
                    samples = [samples[i] for i in idx]
                return collate_batch(
                    samples,
                    bundle,
                    self.model,
                    self.caption_dropout_probability,
                    self.rng,
                    conditioning_sampling=self.conditioning_sampling,
                )
        sizes = {
            b.id: f"{sum(len(v) for v in b.metadata_backend.aspect_ratio_bucket_indices.values())}"
            f" files (batch_size {b.sampler.batch_size}, repeats {b.config.repeats})"
            for b in self.bundles
        }
        raise RuntimeError(
            "no dataset produced a full batch; every bucket must hold at least "
            f"batch_size files per epoch (raise `repeats` or shrink the batch): {sizes}"
        )

    def save_state(self) -> Dict[str, Any]:
        version, internal, gauss = self.rng.getstate()
        return {
            "epoch": self.epoch,
            "exhausted": sorted(self._exhausted),
            "samplers": {b.id: b.sampler.save_state() for b in self.bundles},
            # bundle-selection RNG (JSON-safe form): without it a resume
            # replays a different dataset-interleaving than the original run
            "rng": [version, list(internal), gauss],
        }

    def load_state(self, state: Dict[str, Any]) -> None:
        self.epoch = state.get("epoch", 0)
        self._exhausted = set(state.get("exhausted", []))
        # live generators hold pre-restore cursors; drop them so the next
        # draw re-derives from the restored sampler state (deterministic,
        # keyed on (seed, epoch, draws))
        self._iters.clear()
        rng_state = state.get("rng")
        if rng_state:
            version, internal, gauss = rng_state
            self.rng.setstate((version, tuple(internal), gauss))
        samplers = state.get("samplers", {})
        for bundle in self.bundles:
            if bundle.id in samplers:
                bundle.sampler.load_state(samplers[bundle.id])
