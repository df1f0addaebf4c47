"""Trainer lifecycle end-to-end on the tiny slice: run → checkpoint → resume →

validation render, all on the virtual CPU mesh."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from simpletuner_tpu.configuration import TrainingConfig
from simpletuner_tpu.training.trainer import Trainer

pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_images")
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.png")
        (root / f"img_{i}.txt").write_text(f"a training photo {i}")
    return str(root)

def make_config(image_dir, workdir, **overrides):
    cache_root = os.path.join(workdir, "cache")
    mdb = [
        {
            "id": "images",
            "type": "local",
            "instance_data_dir": image_dir,
            "crop": True,
            "crop_style": "center",
            "crop_aspect": "square",
            "resolution": 64,
            "resolution_type": "pixel_area",
            "caption_strategy": "textfile",
            "cache_dir_vae": os.path.join(cache_root, "vae"),
            "text_embeds": "embeds",
            "repeats": 7,  # 8 imgs × 8 → fills ≥1 global batch on the 8-device mesh
        },
        {
            "id": "embeds",
            "dataset_type": "text_embeds",
            "type": "local",
            "default": True,
            "cache_dir": os.path.join(cache_root, "text"),
        },
    ]
    values = {
        "model_family": "flux",
        "model_type": "lora",
        "model_arch_preset": "tiny",
        "lora_rank": 4,
        "train_batch_size": 2,
        "resolution": 64,
        "resolution_type": "pixel_area",
        "max_train_steps": 4,
        "checkpointing_steps": 2,
        "cache_dir": cache_root,
        "output_dir": os.path.join(workdir, "output"),
        "data_backend_config": mdb,
        "optimizer": "adamw",
        "learning_rate": 1e-3,
        "seed": 7,
        "validation_prompt": "a validation photo",
        "validation_num_inference_steps": 2,
        "validation_resolution": 64,
        "report_to": "none",
    }
    values.update(overrides)
    return TrainingConfig(values)

@pytest.fixture(scope="module")
def trained(image_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("run"))
    trainer = Trainer(config=make_config(image_dir, workdir))
    trainer.run()
    return trainer, workdir

def test_trainer_completes_all_steps(trained):
    trainer, _ = trained
    assert trainer.global_step == 4
    assert int(np.asarray(trainer._state.step)) == 4

def test_checkpoints_written_with_guard(trained):
    trainer, workdir = trained
    ckpts = trainer.checkpoint_manager.list_checkpoints()
    steps = [int(p.rsplit("-", 1)[1]) for p in ckpts]
    assert 4 in steps  # final checkpoint
    assert os.path.exists(os.path.join(ckpts[-1], ".checkpoint_complete"))
    # lora export artifact alongside the checkpoint
    assert os.path.exists(os.path.join(ckpts[-1], "pytorch_lora_weights.safetensors"))

def test_metrics_logged_jsonl(trained):
    trainer, workdir = trained
    path = os.path.join(workdir, "output", "simpletuner-tpu-metrics.jsonl")
    assert os.path.exists(path)
    records = [json.loads(line) for line in open(path)]
    assert len(records) >= 4
    assert all(np.isfinite(r["loss"]) for r in records)

def test_validation_images_rendered(trained):
    trainer, workdir = trained
    val_dir = os.path.join(workdir, "output", "validation")
    assert os.path.isdir(val_dir)
    files = os.listdir(val_dir)
    assert any(f.endswith(".png") for f in files)

def test_resume_from_checkpoint(trained, image_dir):
    trainer, workdir = trained
    config = make_config(
        image_dir, workdir, max_train_steps=6, resume_from_checkpoint="latest"
    )
    resumed = Trainer(config=config)
    resumed.run()
    assert resumed.global_step == 6
    assert int(np.asarray(resumed._state.step)) == 6

def test_cross_family_resume_refused(trained):
    """A checkpoint stamped with another family must be refused before any
    tensor restore (wrong-key-layout exports otherwise)."""
    from simpletuner_tpu.training.trainer import check_resume_family

    trainer, _ = trained
    ckpt = trainer.checkpoint_manager.list_checkpoints()[-1]
    state = json.load(open(os.path.join(ckpt, "trainer_state.json")))
    assert state["model_family"] == "flux"
    check_resume_family(ckpt, "flux")  # same family passes
    with pytest.raises(ValueError, match="model_family"):
        check_resume_family(ckpt, "zlab_i1")

def test_grad_accumulation_runs(image_dir, tmp_path_factory):
    """Canonical reference config: train_batch_size=1 + accumulation. The
    effective batch must be per_device × shards × accum (accelerate semantics),
    i.e. accumulation consumes accum extra batches, not a split of one."""
    workdir = str(tmp_path_factory.mktemp("ga_run"))
    config = make_config(
        image_dir,
        workdir,
        max_train_steps=2,
        train_batch_size=1,
        gradient_accumulation_steps=2,
        checkpointing_steps=None,
        validation_prompt=None,
    )
    trainer = Trainer(config=config)
    trainer.run()
    assert trainer.global_step == 2
    shards = trainer.mesh.shape["data"] * trainer.mesh.shape["fsdp"]
    assert trainer.global_batch_size == 1 * shards * 2

def test_async_checkpointing(image_dir, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("async_run"))
    config = make_config(
        image_dir, workdir, max_train_steps=4, checkpointing_steps=2,
        checkpointing_use_async=True, validation_prompt=None,
    )
    trainer = Trainer(config=config)
    trainer.run()
    trainer.checkpoint_manager.wait()
    ckpts = trainer.checkpoint_manager.list_checkpoints()
    steps = sorted(int(p.rsplit("-", 1)[1]) for p in ckpts)
    assert 4 in steps
    assert os.path.exists(os.path.join(ckpts[-1], "pytorch_lora_weights.safetensors"))

def test_trainer_with_context_parallel(image_dir, tmp_path_factory):
    """Whole Trainer lifecycle on the 3D mesh (data=2, fsdp=2, context=2)."""
    workdir = str(tmp_path_factory.mktemp("cp_run"))
    config = make_config(
        image_dir, workdir, max_train_steps=2, checkpointing_steps=None,
        validation_prompt=None, fsdp=True, fsdp_size=2, context_parallel_size=2,
        context_parallel_comm_strategy="ring", train_batch_size=2,
    )
    trainer = Trainer(config=config)
    try:
        assert dict(trainer.mesh.shape) == {"data": 2, "fsdp": 2, "context": 2}
        trainer.run()
        assert trainer.global_step == 2
    finally:
        from simpletuner_tpu.ops.attention import set_context_parallel

        set_context_parallel(None)