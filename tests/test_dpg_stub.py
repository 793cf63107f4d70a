"""Drive the DearPyGui front-end (gui/dpg_gui.py) against a recording stub `dpg`.

DearPyGui is not installed in this image, so the widget layer would otherwise
never execute. The stub implements the full API surface the GUIs use, records
every widget + callback, runs the render loop twice, then the test fires the
recorded callbacks (palette recolor, sliders, right-click pick, style panel) —
executing the same code paths a human would through the reference GUIs
(nerf/gui.py:55-480, palette/gui.py:475-659)."""

import contextlib
import importlib
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "tests")

from tests_stub_support import make_stub_dpg  # noqa: E402  (created below)


@pytest.fixture(scope="module")
def small_palette_trainer(tmp_path_factory):
    from synthetic import make_sphere_dataset

    from palettenerf_tpu.config import Config
    from palettenerf_tpu.models.palette import PaletteSpec
    from palettenerf_tpu.train.palette_trainer import PaletteTrainer

    tmp = tmp_path_factory.mktemp("dpg")
    root = str(tmp / "scene")
    make_sphere_dataset(root, n_train=3, n_val=1, n_test=1, H=16, W=16)
    cfg = Config(path=root, bound=1.0, scale=0.5, dt_gamma=0.0, min_near=0.05,
                 num_rays=64, iters=4, max_steps=32, grid_size=64,
                 train_samples_per_ray=8, infer_samples_per_ray=16,
                 num_basis=4, seed=0, update_extra_interval=2,
                 grid_levels=4, log2_hashmap_size=13, W=24, H=24, radius=2.2,
                 fovy=50.0)
    spec = PaletteSpec.build(bound=1.0, num_basis=4, grid_levels=4,
                             log2_hashmap_size=13)
    tr = PaletteTrainer("palette", cfg, spec, workspace=str(tmp / "ws"),
                        use_checkpoint="scratch", nerf_path=None, mute=True)
    from palettenerf_tpu.data.palette_provider import PaletteDataset

    ds = PaletteDataset(cfg, type="train")
    tr.train(ds, None, 1)
    import dataclasses

    import jax.numpy as jnp

    tr.eval_settings = dataclasses.replace(tr.eval_settings, density_scale=30.0)
    tr.grid_state = tr.grid_state._replace(
        bitfield=jnp.full_like(tr.grid_state.bitfield, 255))
    tr._build_jit_fns()
    return tr, cfg


@pytest.fixture()
def dpg_guis(small_palette_trainer):
    """Reload gui.dpg_gui with the stub installed; restore afterwards."""
    stub = make_stub_dpg(max_frames=2)
    pkg = types.ModuleType("dearpygui")
    pkg.dearpygui = stub
    saved = {k: sys.modules.get(k) for k in ("dearpygui", "dearpygui.dearpygui")}
    sys.modules["dearpygui"] = pkg
    sys.modules["dearpygui.dearpygui"] = stub
    import palettenerf_tpu.gui.dpg_gui as mod

    mod = importlib.reload(mod)
    assert mod.HAS_DPG and mod.dpg is stub
    yield mod, stub
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v
    importlib.reload(mod)


def test_nerf_gui_loop_and_widgets(small_palette_trainer, dpg_guis):
    tr, cfg = small_palette_trainer
    mod, stub = dpg_guis
    gui = mod.NeRFGUI(cfg, tr)
    gui.render()  # runs 2 loop iterations against the stub then exits
    assert stub.frames_rendered == 2
    assert gui.render_buffer.shape == (24, 24, 3)
    assert np.isfinite(gui.render_buffer).all()
    # fire the train-panel sliders (set_render_option paths)
    stub.fire("dt_gamma", 0.005)
    stub.fire("max samples", 32)
    assert gui.trainer.eval_settings.num_samples == 32
    # camera handlers
    stub.fire_handler("mouse_drag_left", (0, 5.0, 3.0))
    stub.fire_handler("mouse_wheel", 1.0)
    pose1 = gui.cam.pose.copy()
    gui.render_frame()
    assert np.isfinite(gui.render_buffer).all()
    stub.fire_handler("mouse_drag_middle", (0, 2.0, -1.0))
    assert not np.allclose(gui.cam.pose, pose1)


def test_palette_gui_edit_flow(small_palette_trainer, dpg_guis):
    tr, cfg = small_palette_trainer
    mod, stub = dpg_guis
    stub.reset(max_frames=2)
    gui = mod.PaletteGUI(cfg, tr)
    gui.render()
    assert stub.frames_rendered == 2
    base = gui.render_buffer.copy()
    # recolor basis 1 through its color_edit widget (DPG callbacks give 0-1 floats)
    stub.fire("basis 1", [0.9, 0.1, 0.1, 1.0])
    gui.render_frame()
    assert np.abs(gui.render_buffer - base).max() > 1e-5
    # right-click pick -> region edit center
    stub.set_mouse_pos(12, 12)
    stub.fire_handler("mouse_click_right", None)
    assert bool(np.asarray(gui.session._edit.use_xyz))
    # std sliders + weight dials
    stub.fire("std_xyz", 0.4)
    stub.fire("offsets w", 0.5)
    stub.fire("view-dep w", 0.0)
    gui.render_frame()
    assert np.isfinite(gui.render_buffer).all()
    # style panel: enable style-pick mode, add a correspondence, fit, toggle
    stub.set_value("_style_mode", True)
    stub.fire("target color", [255, 0, 0, 255])
    stub.fire_handler("mouse_click_right", None)
    assert stub.get_value("_log_style").startswith("1 ")
    gui.session.optimize_style(iters=3)
    stub.fire("use style", False)
    gui.render_frame()
    # reset colors path
    stub.fire("reset colors", None)
    gui.render_frame()
    assert np.isfinite(gui.render_buffer).all()
