"""Eval-loss and CLIP-score evaluator tests."""

import numpy as np
import pytest

from simpletuner_tpu.training.evaluation import CLIPScoreEvaluator, EvalLoss

pytestmark = pytest.mark.slow

class TestCLIPScore:
    @pytest.fixture(scope="class")
    def evaluator(self):
        return CLIPScoreEvaluator(tiny=True)

    def test_score_returns_scalar(self, evaluator):
        images = [np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)]
        score = evaluator.score(images, ["a photo of a cat"])
        assert isinstance(score, float)
        assert -100.0 <= score <= 100.0

    def test_batch_of_pairs(self, evaluator):
        rng = np.random.default_rng(1)
        images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(3)]
        score = evaluator.score(images, ["cat", "dog", "tree"])
        assert np.isfinite(score)

class TestEvalLoss:
    def test_disabled_without_eval_datasets(self):
        class FakeBundle:
            class config:
                dataset_type = "image"

        ev = EvalLoss(model=None, bundles=[FakeBundle()])
        assert not ev.enabled
        assert ev.execute_eval(None) is None