"""A recording stub of the `dearpygui.dearpygui` module.

Implements exactly the API surface gui/dpg_gui.py uses, records every widget and
handler callback so tests can fire them, and bounds the render loop via
``max_frames``. No real window or GL context is involved.
"""

from __future__ import annotations

import contextlib
import types


def make_stub_dpg(max_frames: int = 2):
    stub = types.ModuleType("dearpygui.dearpygui")

    state = {
        "values": {},       # tag/label -> current value
        "widgets": {},      # label and tag -> dict(callback, user_data)
        "handlers": {},     # kind -> callback
        "mouse": (0.0, 0.0),
        "frames": 0,
        "max_frames": max_frames,
    }

    # ---- constants
    stub.mvMouseButton_Left = 0
    stub.mvMouseButton_Middle = 2
    stub.mvMouseButton_Right = 1
    stub.mvFormat_Float_rgb = "f_rgb"

    def _register(label=None, tag=None, default_value=None, callback=None, **kw):
        rec = {"callback": callback, "label": label, "tag": tag}
        for key in (label, tag):
            if key is not None:
                state["widgets"][key] = rec
                state["values"][key] = default_value
        return label or tag

    # ---- widget constructors (record + return id)
    def add_checkbox(label=None, default_value=False, callback=None, tag=None, **kw):
        return _register(label, tag, default_value, callback)

    def add_button(label=None, callback=None, tag=None, **kw):
        return _register(label, tag, None, callback)

    def add_text(text="", tag=None, **kw):
        return _register(None, tag, text, None)

    def add_slider_float(label=None, default_value=0.0, callback=None, tag=None, **kw):
        return _register(label, tag, default_value, callback)

    def add_slider_int(label=None, default_value=0, callback=None, tag=None, **kw):
        return _register(label, tag, default_value, callback)

    def add_color_edit(default_value=None, label=None, callback=None, tag=None, **kw):
        return _register(label, tag, default_value, callback)

    def add_raw_texture(w, h, buf, format=None, tag=None, **kw):
        return _register(None, tag, buf, None)

    def add_image(tex, **kw):
        return None

    def add_separator(**kw):
        return None

    for f in (add_checkbox, add_button, add_text, add_slider_float, add_slider_int,
              add_color_edit, add_raw_texture, add_image, add_separator):
        setattr(stub, f.__name__, f)

    # ---- containers as no-op context managers
    @contextlib.contextmanager
    def _cm(*a, **kw):
        yield None

    stub.texture_registry = _cm
    stub.window = _cm
    stub.handler_registry = _cm

    # ---- handlers
    def add_mouse_drag_handler(button=0, callback=None, **kw):
        kind = {0: "mouse_drag_left", 2: "mouse_drag_middle",
                1: "mouse_drag_right"}[button]
        state["handlers"][kind] = callback

    def add_mouse_wheel_handler(callback=None, **kw):
        state["handlers"]["mouse_wheel"] = callback

    def add_mouse_click_handler(button=0, callback=None, **kw):
        kind = {0: "mouse_click_left", 2: "mouse_click_middle",
                1: "mouse_click_right"}[button]
        state["handlers"][kind] = callback

    stub.add_mouse_drag_handler = add_mouse_drag_handler
    stub.add_mouse_wheel_handler = add_mouse_wheel_handler
    stub.add_mouse_click_handler = add_mouse_click_handler

    # ---- lifecycle
    stub.create_context = lambda *a, **kw: None
    stub.destroy_context = lambda *a, **kw: None
    stub.create_viewport = lambda *a, **kw: None
    stub.setup_dearpygui = lambda *a, **kw: None
    stub.show_viewport = lambda *a, **kw: None
    stub.set_primary_window = lambda *a, **kw: None

    def is_dearpygui_running():
        return state["frames"] < state["max_frames"]

    def render_dearpygui_frame():
        state["frames"] += 1

    stub.is_dearpygui_running = is_dearpygui_running
    stub.render_dearpygui_frame = render_dearpygui_frame

    # ---- values / mouse
    def set_value(tag, val):
        state["values"][tag] = val

    def get_value(tag):
        return state["values"].get(tag)

    stub.set_value = set_value
    stub.get_value = get_value
    stub.get_mouse_pos = lambda **kw: state["mouse"]

    # ---- test-driver helpers (not part of the dpg API)
    def _call(cb, sender, app_data):
        # real DearPyGui inspects the callback arity and passes at most
        # (sender, app_data, user_data) — zero-arg lambdas are legal
        import inspect
        try:
            n = len(inspect.signature(cb).parameters)
        except (TypeError, ValueError):
            n = 2
        cb(*(sender, app_data)[:min(n, 2)])

    def fire(key, app_data):
        rec = state["widgets"].get(key)
        assert rec is not None, f"no widget {key!r}; have {list(state['widgets'])}"
        state["values"][key] = app_data
        if rec["tag"] is not None:
            state["values"][rec["tag"]] = app_data
        if rec["callback"] is not None:
            _call(rec["callback"], key, app_data)

    def fire_handler(kind, app_data):
        cb = state["handlers"].get(kind)
        assert cb is not None, f"no handler {kind!r}; have {list(state['handlers'])}"
        _call(cb, kind, app_data)

    def set_mouse_pos(x, y):
        state["mouse"] = (float(x), float(y))

    def reset(max_frames=2):
        state["frames"] = 0
        state["max_frames"] = max_frames
        state["widgets"].clear()
        state["handlers"].clear()

    stub.fire = fire
    stub.fire_handler = fire_handler
    stub.set_mouse_pos = set_mouse_pos
    stub.reset = reset
    stub._state = state

    class _FramesProp:
        pass

    # frames_rendered as a module attribute refreshed on access via __getattr__
    def _getattr(name):
        if name == "frames_rendered":
            return state["frames"]
        raise AttributeError(name)

    stub.__getattr__ = _getattr
    return stub
