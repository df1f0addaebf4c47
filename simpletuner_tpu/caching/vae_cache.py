"""VAE latent cache.

Disk layout matches the reference (reference: helpers/caching/vae.py:118
``VAECache``; filenames ``sha256(stem).pt`` preserving subfolders, :678-703) so
caches interoperate both ways.  The encode pipeline is restructured TPU-first:
host threads decode+crop/resize (TrainingSample), batches are stacked per bucket
shape and pushed through one jitted ``vae.encode``; writer threads persist .pt
files — decode and encode overlap like the reference's queue pipeline
(vae.py:2037 process_buckets) but with XLA doing the math.
"""

from __future__ import annotations

import hashlib
import io
import os
import queue
import random
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.backends.base import BaseDataBackend
from ..data.buckets import BucketConfig
from ..data.metadata import MetadataBackend
from ..data.training_sample import image_to_array, prepare_image


class VAECache:
    def __init__(
        self,
        id: str,
        data_backend: BaseDataBackend,
        metadata_backend: MetadataBackend,
        cache_dir: str,
        encode_fn: Optional[Callable[[np.ndarray, int], np.ndarray]] = None,
        bucket_config: Optional[BucketConfig] = None,
        cache_data_backend: Optional[BaseDataBackend] = None,
        instance_data_dir: Optional[str] = None,
        batch_size: int = 4,
        crop_style: str = "random",
        hash_filenames: bool = True,
        ondemand: bool = False,
        max_workers: int = 8,
        seed: int = 42,
        nsfw_filter=None,  # data.nsfw.NSFWFilter (reference vae.py:578 scan pass)
        ephemeral: bool = False,
        transfer_dtype: str = "float32",
    ):
        self.nsfw_filter = nsfw_filter
        self.id = id
        self.data_backend = data_backend
        self.cache_data_backend = cache_data_backend or data_backend
        self.metadata_backend = metadata_backend
        self.cache_dir = cache_dir
        self.encode_fn = encode_fn
        self.bucket_config = bucket_config or metadata_backend.bucket_config
        self.instance_data_dir = instance_data_dir or metadata_backend.instance_data_dir
        self.batch_size = batch_size
        self.crop_style = crop_style
        self.hash_filenames = hash_filenames
        self.ondemand = ondemand
        self.max_workers = max_workers
        self.seed = seed
        # streaming datasets address samples by stream position, which is NOT
        # stable across shuffled epochs — persisting latents under that key
        # would serve stale tensors for a different image.  Ephemeral mode
        # encodes on demand and never touches disk.
        self.ephemeral = ephemeral
        # "uint8": ship raw pixels host->device and normalize on-chip — 4x
        # fewer transfer bytes than the reference's fp32 tensors (vae.py:1809
        # moves normalized float batches); encode_fn must advertise
        # handles_uint8.  8-bit sources lose nothing: uint8 -> [-1,1] is exact
        # in bf16/f32 either side of the wire.
        self.transfer_dtype = transfer_dtype

    # ---- filenames (reference vae.py:678-703) ------------------------------------------------
    def generate_vae_cache_filename(self, filepath: str) -> Tuple[str, str]:
        if filepath.endswith(".pt"):
            return filepath, os.path.basename(filepath)
        base = os.path.splitext(os.path.basename(filepath))[0]
        if self.hash_filenames:
            base = hashlib.sha256(base.encode()).hexdigest()
        base = base + ".pt"
        subfolders = ""
        if self.instance_data_dir:
            subfolders = os.path.dirname(filepath).replace(self.instance_data_dir, "").lstrip(os.sep)
        if subfolders:
            return os.path.join(self.cache_dir, subfolders, base), base
        return os.path.join(self.cache_dir, base), base

    def exists(self, filepath: str) -> bool:
        if self.ephemeral:
            return False
        return self.cache_data_backend.exists(self.generate_vae_cache_filename(filepath)[0])

    def load(self, filepath: str) -> np.ndarray:
        latents = self.cache_data_backend.torch_load(self.generate_vae_cache_filename(filepath)[0])
        if isinstance(latents, dict):  # some caches store dicts
            latents = latents.get("latents", latents)
        return np.asarray(latents)

    def save(self, filepath: str, latents: np.ndarray) -> None:
        self.cache_data_backend.torch_save(latents, self.generate_vae_cache_filename(filepath)[0])

    # ---- discovery ---------------------------------------------------------------------------
    def discover_unprocessed_files(self) -> List[str]:
        """Full candidate list in deterministic (bucket-sorted) order.

        Already-cached entries are NOT filtered here: multi-process caching
        splits this list by rank, and the split must be computed identically
        on every process — an exists() filter at this level would race with
        other ranks' in-flight writes (see process_buckets).
        """
        all_files: List[str] = []
        for key in sorted(self.metadata_backend.aspect_ratio_bucket_indices):
            all_files.extend(self.metadata_backend.aspect_ratio_bucket_indices[key])
        return all_files

    # ---- the caching pass --------------------------------------------------------------------
    def _prepare_one(self, path: str) -> Optional[Tuple[str, np.ndarray, Dict[str, Any]]]:
        try:
            rng = random.Random((self.seed, path).__hash__())
            existing = self.metadata_backend.image_metadata.get(path, {})
            if "duration" in existing:  # audio dataset
                from ..data.audio import load_audio

                bucket = existing.get("bucket", "1s")
                duration = float(bucket.rstrip("s"))
                waveform = load_audio(
                    self.data_backend,
                    path,
                    sample_rate=int(existing.get("sample_rate", 44100)),
                    duration_seconds=duration,
                )
                if waveform is None:
                    return None
                return path, waveform, {"duration": duration}
            if "num_frames" in existing:  # video dataset
                from ..data.video import load_video_frames, prepare_video, video_to_array

                frames = load_video_frames(
                    self.data_backend, path, int(existing["num_frames"])
                )
                if frames is None:
                    return None
                prepared, meta = prepare_video(frames, self.bucket_config, self.crop_style, rng)
                return path, video_to_array(prepared), meta

            from PIL import Image, ImageOps

            image = Image.open(io.BytesIO(self.data_backend.read(path)))
            # honor EXIF orientation (reference image_manipulation/load.py)
            image = ImageOps.exif_transpose(image)
            sample = prepare_image(image, self.bucket_config, self.crop_style, rng)
            meta = {
                "original_size": list(sample.original_size),
                "target_size": list(sample.target_size),
                "crop_coordinates": list(sample.crop_coordinates),
                "aspect_ratio": sample.aspect_ratio,
            }
            if self.transfer_dtype == "uint8":
                return path, np.asarray(sample.image, np.uint8), meta
            return path, image_to_array(sample.image), meta
        except Exception:
            return None

    def process_buckets(
        self,
        process_index: int = 0,
        num_processes: int = 1,
        progress_callback: Optional[Callable[[int, int], None]] = None,
    ) -> int:
        """Encode and store all uncached latents. Returns number processed."""
        if self.encode_fn is None:
            raise RuntimeError(f"vae cache {self.id}: no encoder attached")
        all_todo = self.discover_unprocessed_files()
        if all_todo and self.nsfw_filter is not None:
            import io as _io

            from PIL import Image as _Image

            def _read_sample(p):
                # video datasets feed frame lists so the filter can apply
                # per-frame voting (reference nsfw_classifier.py:306-332)
                existing = self.metadata_backend.image_metadata.get(p, {})
                if "num_frames" in existing:
                    from ..data.video import load_video_frames

                    frames = load_video_frames(
                        self.data_backend, p, int(existing["num_frames"])
                    )
                    if frames is None:
                        raise IOError(f"unreadable video {p}")
                    return frames
                return _Image.open(_io.BytesIO(self.data_backend.read(p))).convert("RGB")

            # Scan the FULL list on every process (deterministic classifier), not
            # just this process's slice: metadata/bucket indices must stay
            # identical across hosts or samplers desynchronize.
            rejected_before = set(all_todo)
            all_todo = self.nsfw_filter.filter_files(all_todo, _read_sample)
            for path in rejected_before - set(all_todo):
                self.metadata_backend.remove_image(path)
            if process_index == 0:
                self.nsfw_filter.write_report(self.cache_dir, self.id)
        # Split the full deterministic list FIRST, then drop already-cached
        # entries within this rank's shard.  Filtering before the split would
        # make each process's `all_todo` depend on how far the *other* ranks'
        # concurrent writes have progressed — the interleaved shards then
        # disagree and files fall through uncached.
        todo = [f for f in all_todo[process_index::num_processes] if not self.exists(f)]
        if not todo:
            return 0

        # group by bucket so every encode batch has one shape
        by_bucket: Dict[str, List[str]] = {}
        for path in todo:
            bucket = self.metadata_backend.image_metadata.get(path, {}).get("bucket", "?")
            by_bucket.setdefault(bucket, []).append(path)

        from concurrent.futures import ThreadPoolExecutor

        done = 0
        total = len(todo)
        write_pool = ThreadPoolExecutor(max_workers=self.max_workers)
        # one dispatch thread owns stack+h2d+encode submission so the main
        # loop never blocks on the transfer; writer threads own the d2h fetch.
        # Decode | h2d+encode | fetch+write therefore overlap (reference
        # vae.py:2037 runs the same three stages as queue-linked threads).
        encode_pool = ThreadPoolExecutor(max_workers=1)
        # bounded in-flight windows: an eager map() would buffer every decoded
        # image in the bucket (O(dataset) host RAM); cap decode at 2x reader
        # threads and pending encodes at 2 batches
        decode_window = threading.Semaphore(self.max_workers * 2)
        encode_window = threading.Semaphore(2)
        writes = []
        with ThreadPoolExecutor(max_workers=self.max_workers) as read_pool:
            for bucket, paths in by_bucket.items():
                pending = []
                idx = 0

                def _submit_upto():
                    nonlocal idx
                    while idx < len(paths) and decode_window.acquire(blocking=False):
                        pending.append(read_pool.submit(self._prepare_one, paths[idx]))
                        idx += 1

                _submit_upto()
                batch_paths: List[str] = []
                batch_arrays: List[np.ndarray] = []
                consumed = 0
                while consumed < len(pending) or idx < len(paths):
                    item = pending[consumed].result()
                    consumed += 1
                    decode_window.release()
                    _submit_upto()
                    if item is None:
                        continue
                    path, array, meta = item
                    self.metadata_backend.image_metadata.setdefault(path, {}).update(meta)
                    batch_paths.append(path)
                    batch_arrays.append(array)
                    if len(batch_paths) == self.batch_size:
                        self._flush(batch_paths, batch_arrays, write_pool, writes,
                                    encode_pool, encode_window)
                        done += len(batch_paths)
                        if progress_callback:
                            progress_callback(done, total)
                        batch_paths, batch_arrays = [], []
                if batch_paths:
                    self._flush(batch_paths, batch_arrays, write_pool, writes,
                                encode_pool, encode_window)
                    done += len(batch_paths)
                    if progress_callback:
                        progress_callback(done, total)
        for w in writes:
            w.result()
        encode_pool.shutdown()
        write_pool.shutdown()
        self.metadata_backend.save_cache()
        return done

    def _flush(self, paths: List[str], arrays: List[np.ndarray], pool, writes,
               encode_pool=None, encode_window=None) -> None:
        # The WHOLE batch is fetched as one d2h copy — per-row fetches cost
        # one device-queue round trip each and serialize against the next
        # batch's compute.
        def _fetch_then_write(batch_paths: List[str], batch_latents) -> None:
            rows = np.asarray(batch_latents)
            for p, row in zip(batch_paths, rows):
                writes.append(pool.submit(self.save, p, row))

        def _encode_and_write(batch_paths: List[str], batch_arrays: List[np.ndarray]) -> None:
            try:
                stacked = np.stack(batch_arrays)  # (B, H, W, 3)
                latents = self.encode_fn(stacked, len(batch_paths))
                # encode_fn may return an async jax.Array; the fetch rides a
                # writer thread so the dispatch thread immediately stages the
                # next batch's h2d while XLA computes
                writes.append(pool.submit(_fetch_then_write, batch_paths, latents))
            finally:
                if encode_window is not None:
                    encode_window.release()

        if encode_pool is None:
            _encode_and_write(list(paths), arrays)
        else:
            encode_window.acquire()
            writes.append(encode_pool.submit(_encode_and_write, list(paths), list(arrays)))

    # ---- on-demand ---------------------------------------------------------------------------
    def get(self, filepath: str) -> np.ndarray:
        if self.exists(filepath):
            return self.load(filepath)
        if not self.ondemand or self.encode_fn is None:
            raise KeyError(f"no cached latents for {filepath}")
        item = self._prepare_one(filepath)
        if item is None:
            raise IOError(f"cannot read/prepare {filepath}")
        _, array, meta = item
        self.metadata_backend.image_metadata.setdefault(filepath, {}).update(meta)
        latent = np.asarray(self.encode_fn(array[None], 1))[0]
        if not self.ephemeral:
            self.save(filepath, latent)
        return latent

    def scan_cache_consistency(self) -> Dict[str, List[str]]:
        """Metadata↔cache audit (reference vae.py VAE-cache consistency repair,
        metadata/backends/base.py:1438-1533): returns files missing latents and
        orphaned cache entries no longer backed by metadata."""
        expected = {}
        for files in self.metadata_backend.aspect_ratio_bucket_indices.values():
            for path in files:
                cache_path, _ = self.generate_vae_cache_filename(path)
                expected[cache_path] = path
        missing = [src for cache_path, src in expected.items()
                   if not self.cache_data_backend.exists(cache_path)]
        orphans: List[str] = []
        if os.path.isdir(self.cache_dir):
            for name in os.listdir(self.cache_dir):
                full = os.path.join(self.cache_dir, name)
                if name.endswith(".pt") and full not in expected:
                    orphans.append(full)
        return {"missing": missing, "orphans": orphans}

    def repair_consistency(self, delete_orphans: bool = True) -> Dict[str, int]:
        """Re-encode missing latents and drop orphaned cache files."""
        report = self.scan_cache_consistency()
        encoded = 0
        if report["missing"] and self.encode_fn is not None:
            encoded = self.process_buckets()
        removed = 0
        if delete_orphans:
            for path in report["orphans"]:
                try:
                    os.remove(path)
                    removed += 1
                except OSError:
                    pass
        return {"encoded": encoded, "orphans_removed": removed}

    def clear_cache(self) -> None:
        for files in self.metadata_backend.aspect_ratio_bucket_indices.values():
            for path in files:
                cache_path, _ = self.generate_vae_cache_filename(path)
                if self.cache_data_backend.exists(cache_path):
                    self.cache_data_backend.delete(cache_path)
