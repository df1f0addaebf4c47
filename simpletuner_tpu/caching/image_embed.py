"""Image-embedding cache (CLIP-vision / DINO-style teacher features).

Reference: helpers/caching/image_embed.py:32 (CLIP-vision conditioning image
embeds) + grounding_image_embed.py; consumed as IP-adapter-style conditioning
and as CREPA teacher features (helpers/training/crepa.py) through the
``conditioning_image_embeds`` dataset linkage.
"""

from __future__ import annotations

import hashlib
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class ImageEmbedCache:
    def __init__(
        self,
        id: str,
        data_backend,
        cache_dir: str,
        encode_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
        image_size: int = 224,
        batch_size: int = 8,
        hash_filenames: bool = True,
        max_workers: int = 8,
    ):
        self.id = id
        self.data_backend = data_backend
        self.cache_dir = cache_dir
        self.encode_fn = encode_fn
        self.image_size = image_size
        self.batch_size = batch_size
        self.hash_filenames = hash_filenames
        self.max_workers = max_workers

    def cache_path(self, filepath: str) -> str:
        stem = os.path.splitext(filepath)[0]
        if self.hash_filenames:
            stem = hashlib.sha256(stem.encode()).hexdigest()
        return os.path.join(self.cache_dir, f"{os.path.basename(stem)}-embed.pt")

    def exists(self, filepath: str) -> bool:
        return self.data_backend.exists(self.cache_path(filepath))

    def load(self, filepath: str) -> np.ndarray:
        return np.asarray(self.data_backend.torch_load(self.cache_path(filepath)))

    def save(self, filepath: str, embed: np.ndarray) -> None:
        self.data_backend.torch_save(np.asarray(embed, np.float32), self.cache_path(filepath))

    def _prepare_one(self, path: str) -> Optional[Tuple[str, np.ndarray]]:
        try:
            import io

            from PIL import Image

            image = Image.open(io.BytesIO(self.data_backend.read(path))).convert("RGB")
            image = image.resize((self.image_size, self.image_size), Image.BICUBIC)
            array = np.asarray(image, np.float32) / 255.0
            mean = np.asarray([0.481, 0.458, 0.408], np.float32)
            std = np.asarray([0.269, 0.261, 0.276], np.float32)
            return path, (array - mean) / std
        except Exception:
            return None

    def process_files(self, files: List[str], process_index: int = 0, num_processes: int = 1) -> int:
        if self.encode_fn is None:
            raise RuntimeError(f"image embed cache {self.id}: no encoder attached")
        # split the deterministic list first, THEN filter cached entries:
        # filtering first races with other ranks' in-flight writes and the
        # interleaved shards disagree (same fix as VAECache.process_buckets)
        todo = [f for f in files[process_index::num_processes] if not self.exists(f)]
        if not todo:
            return 0
        done = 0
        with ThreadPoolExecutor(max_workers=self.max_workers) as pool:
            batch_paths: List[str] = []
            batch_arrays: List[np.ndarray] = []
            for item in pool.map(self._prepare_one, todo):
                if item is None:
                    continue
                path, array = item
                batch_paths.append(path)
                batch_arrays.append(array)
                if len(batch_paths) == self.batch_size:
                    self._flush(batch_paths, batch_arrays)
                    done += len(batch_paths)
                    batch_paths, batch_arrays = [], []
            if batch_paths:
                self._flush(batch_paths, batch_arrays)
                done += len(batch_paths)
        return done

    def _flush(self, paths: List[str], arrays: List[np.ndarray]) -> None:
        embeds = np.asarray(self.encode_fn(np.stack(arrays)))
        for path, embed in zip(paths, embeds):
            self.save(path, embed)

    def get(self, filepath: str) -> np.ndarray:
        if self.exists(filepath):
            return self.load(filepath)
        if self.encode_fn is None:
            raise KeyError(f"no cached image embed for {filepath}")
        item = self._prepare_one(filepath)
        if item is None:
            raise IOError(f"cannot read {filepath}")
        embed = np.asarray(self.encode_fn(item[1][None]))[0]
        self.save(filepath, embed)
        return embed


def build_clip_vision_encode_fn(pretrained: Optional[str] = None, tiny: bool = False):
    """jitted CLIP-vision encoder: (B, H, W, 3) normalized -> (B, tokens, D)."""
    import jax
    import jax.numpy as jnp
    from transformers import CLIPVisionConfig, FlaxCLIPVisionModel

    if tiny or pretrained is None:
        config = CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=64, patch_size=16,
        )
        model = FlaxCLIPVisionModel(config, seed=0)
        image_size = 64
    else:
        model = FlaxCLIPVisionModel.from_pretrained(pretrained)
        image_size = model.config.image_size

    @jax.jit
    def encode(pixels):
        out = model(pixel_values=jnp.transpose(pixels, (0, 3, 1, 2)))
        return out.last_hidden_state

    return encode, image_size
