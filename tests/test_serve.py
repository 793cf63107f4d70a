"""main_serve smoke test: tiny palette checkpoint -> bake -> sweep orbit (CPU)."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest


def test_serve_cli_end_to_end(tmp_path):
    from palettenerf_tpu.models.palette import PaletteSpec, init_palette, initialize_palette
    from palettenerf_tpu.train import checkpoint as ckpt_lib

    spec = PaletteSpec.build(bound=1.0, num_basis=4, grid_levels=4,
                             log2_hashmap_size=13)
    params = init_palette(jax.random.PRNGKey(0), spec)
    params = initialize_palette(params, spec,
                                color_list=np.eye(4, 3) * 0.7 + 0.15)
    ws = tmp_path / "ws"
    os.makedirs(ws / "checkpoints")
    ckpt_lib.save_checkpoint(str(ws / "checkpoints"), "palette", 1, 100, params)

    out_png = str(tmp_path / "frame.png")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "main_serve.py", str(ws), "--resolution", "32",
         "--W", "64", "--H", "64", "--u_res", "96", "--n_frames", "3",
         "--grid_levels", "4", "--log2_hashmap_size", "13",
         "--edit_basis", "1", "--out", out_png],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "fps" in r.stdout
    assert os.path.exists(out_png)
    import cv2

    img = cv2.imread(out_png)
    assert img.shape == (64, 64, 3)
