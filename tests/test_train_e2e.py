"""End-to-end stage-1 training on a tiny synthetic sphere scene (CPU, deterministic).

The integration layer of the test pyramid (SURVEY.md §4): assert the whole
provider -> marcher -> network -> compositor -> optimizer loop actually converges.
"""

import numpy as np
import pytest

from palettenerf_tpu.config import Config
from palettenerf_tpu.data.provider import NeRFDataset
from palettenerf_tpu.models.nerf import NeRFSpec
from palettenerf_tpu.train.trainer import Trainer

from synthetic import make_sphere_dataset


@pytest.fixture(scope="module")
def sphere_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("sphere_scene")
    return make_sphere_dataset(str(root), n_train=10, n_val=1, n_test=1, H=48, W=48)


def _tiny_cfg(scene, tmp):
    return Config(
        path=scene,
        bound=1.0,
        scale=0.5,       # cam_radius 2.0 * 0.5 = 1.0 -> inside bound with margin
        dt_gamma=0.0,
        min_near=0.05,
        density_thresh=10.0,
        num_rays=768,
        iters=220,
        max_steps=128,
        grid_size=64,
        update_extra_interval=32,
        train_samples_per_ray=48,
        infer_samples_per_ray=96,
        lambda_sparse=0.0,
        seed=0,
        workspace=str(tmp),
    )


@pytest.mark.slow
def test_nerf_trains_on_sphere(sphere_scene, tmp_path):
    cfg = _tiny_cfg(sphere_scene, tmp_path)
    spec = NeRFSpec.build(bound=cfg.bound)
    train_ds = NeRFDataset(cfg, type="train")
    val_ds = NeRFDataset(cfg, type="val")

    trainer = Trainer(
        "ngp", cfg, spec, workspace=str(tmp_path / "ws"),
        use_checkpoint="scratch", eval_interval=10_000, mute=True,
    )
    n_epochs = int(np.ceil(cfg.iters / len(train_ds)))
    trainer.train(train_ds, None, n_epochs)

    losses = trainer.stats["loss"]
    assert losses[-1] < losses[0] * 0.5, f"loss did not converge: {losses[0]} -> {losses[-1]}"

    # eval PSNR floor on the held-out view
    psnr = trainer.evaluate_one_epoch(val_ds, save_images=False)
    assert psnr > 16.5, f"PSNR too low: {psnr}"

    # checkpoint roundtrip
    trainer.save_checkpoint()
    t2 = Trainer("ngp", cfg, spec, workspace=trainer.workspace,
                 use_checkpoint="latest", eval_interval=10_000, mute=True)
    assert t2.global_step == trainer.global_step
    psnr2 = t2.evaluate_one_epoch(val_ds, save_images=False)
    assert abs(psnr2 - psnr) < 0.5
