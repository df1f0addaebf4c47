"""Evaluation: held-out eval loss + CLIP-score image evaluator.

Reference: trainer.py:6991-7006 ``execute_eval`` (loss over an ``eval``
dataset split, no optimizer update) and helpers/training/evaluation.py
(torchmetrics CLIPScore over validation renders).  Here the eval loss is one
jitted loss-only program reusing the model's ``loss_fn``; CLIP score runs the
Flax CLIP model on host-produced renders.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class EvalLoss:
    """Loss over the eval split with a fixed rng (deterministic across runs)."""

    def __init__(
        self,
        model,
        bundles: List,
        seed: int = 1234,
        max_batches: int = 8,
        eval_dataset_ids=None,
        draws_per_batch: int = 1,
    ):
        self.model = model
        ids = (
            set()
            if not eval_dataset_ids
            else {eval_dataset_ids}
            if isinstance(eval_dataset_ids, str)
            else set(eval_dataset_ids)
        )
        # eval split = dataset_type=eval OR a training dataset carved out via
        # --eval_dataset_id (reference trainer.py:6432-6437 skips those ids in
        # the train loop and evals on them instead)
        self.bundles = [
            b for b in bundles
            if b.config.dataset_type == "eval" or (ids and getattr(b, "id", None) in ids)
        ]
        self.seed = seed
        self.max_batches = max_batches
        # --eval_timesteps: deterministic draws per batch (fixed rng fan-out)
        # average noise/timestep sampling variance out of the eval-loss metric
        self.draws_per_batch = max(1, int(draws_per_batch))
        self._loss_jit = None

    @property
    def enabled(self) -> bool:
        return bool(self.bundles)

    def _loss_fn(self, variables, batch, rng):
        loss, _ = self.model.loss_fn(variables, rng, batch)
        return loss

    def execute_eval(self, variables) -> Optional[float]:
        if not self.enabled:
            return None
        from ..data.dataset import collate_batch

        if self._loss_jit is None:
            self._loss_jit = jax.jit(self._loss_fn)
        losses = []
        rng = jax.random.PRNGKey(self.seed)
        for bundle in self.bundles:
            count = 0
            for samples in iter(bundle.sampler):
                raw = collate_batch(samples, bundle, self.model)
                batch = {
                    k: jnp.asarray(v)
                    for k, v in raw.items()
                    if isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
                }
                for draw in range(self.draws_per_batch):
                    losses.append(float(self._loss_jit(
                        variables, batch,
                        jax.random.fold_in(rng, count * 1009 + draw))))
                count += 1
                if count >= self.max_batches:
                    break
        return float(np.mean(losses)) if losses else None


class CLIPScoreEvaluator:
    """CLIP similarity between validation renders and their prompts
    (reference helpers/training/evaluation.py CLIP evaluator)."""

    def __init__(self, pretrained: Optional[str] = None, tiny: bool = False):
        from transformers import CLIPConfig, FlaxCLIPModel

        if tiny or pretrained is None:
            config = CLIPConfig(
                text_config={"vocab_size": 1000, "hidden_size": 32, "intermediate_size": 64,
                             "num_hidden_layers": 2, "num_attention_heads": 2},
                vision_config={"hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
                               "num_attention_heads": 2, "image_size": 64, "patch_size": 16},
                projection_dim=32,
            )
            self.clip = FlaxCLIPModel(config, seed=0)
            self.image_size = 64
            self._tokenize = self._tiny_tokenize
        else:
            from transformers import CLIPProcessor

            self.clip = FlaxCLIPModel.from_pretrained(pretrained)
            self.processor = CLIPProcessor.from_pretrained(pretrained)
            self.image_size = self.clip.config.vision_config.image_size
            self._tokenize = None

    def _tiny_tokenize(self, prompts: List[str]):
        ids = np.zeros((len(prompts), 16), np.int32)
        for i, prompt in enumerate(prompts):
            for j, tok in enumerate(prompt.lower().split()[:16]):
                ids[i, j] = (hash(tok) % 998) + 2
        return ids, np.ones_like(ids)

    def score(self, images: List[np.ndarray], prompts: List[str]) -> float:
        """Mean cosine similarity (x100, CLIPScore convention) over pairs."""
        from PIL import Image

        pixel = []
        for image in images:
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = np.clip(arr * 255, 0, 255).astype(np.uint8)
            resized = np.asarray(
                Image.fromarray(arr).resize((self.image_size, self.image_size), Image.BICUBIC),
                np.float32,
            ) / 255.0
            mean = np.asarray([0.481, 0.458, 0.408], np.float32)
            std = np.asarray([0.269, 0.261, 0.276], np.float32)
            pixel.append(((resized - mean) / std).transpose(2, 0, 1))
        pixel_values = jnp.asarray(np.stack(pixel))

        if self._tokenize is not None:
            input_ids, attention_mask = self._tokenize(prompts)
        else:
            enc = self.processor(text=prompts, padding=True, return_tensors="np")
            input_ids, attention_mask = enc["input_ids"], enc["attention_mask"]

        out = self.clip(
            input_ids=jnp.asarray(input_ids),
            attention_mask=jnp.asarray(attention_mask),
            pixel_values=pixel_values,
        )
        img = out.image_embeds / jnp.linalg.norm(out.image_embeds, axis=-1, keepdims=True)
        txt = out.text_embeds / jnp.linalg.norm(out.text_embeds, axis=-1, keepdims=True)
        return float(jnp.mean(jnp.sum(img * txt, axis=-1)) * 100.0)
