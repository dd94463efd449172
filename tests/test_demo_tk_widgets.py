"""Execution coverage for the Tk demo's widget/event layer (VERDICT r3
weak #6: `tools/demo_tk.py`'s widget wiring had never run anywhere).

The build image has tkinter but no display (no X, no Xvfb), so
`tkinter.Tk()` cannot exist even offscreen. `demo_tk` defers all
tkinter imports into the constructors, which lets these tests inject a
fake `tkinter` module and drive the REAL widget code — construction,
event bindings, variable traces, PPM frame encoding, bbox item state,
and the `after`-timer inference loop — with only the C rendering layer
stubbed out. Reference surface: demo/demo_window.py:7-186,
demo/pixel_canvas.py:8-223.
"""

import sys
import types

import numpy as np
import pytest

from air_tpu.tools.demo_tk import PixelCanvas, DemoWindow, bbox_canvas_coords


# -- fake tkinter ------------------------------------------------------------

class _Var:
    def __init__(self, value=None):
        self._value = value
        self._traces = []

    def trace_add(self, mode, cb):
        assert mode == "write"
        self._traces.append(cb)

    def get(self):
        return self._value

    def set(self, value):
        self._value = value
        for cb in self._traces:
            cb()


class _IntVar(_Var):
    def get(self):
        return int(self._value)


class _PhotoImage:
    def __init__(self, width=1, height=1):
        self.width, self.height = width, height
        self.data = b""
        self.format = None

    def configure(self, width=None, height=None, data=None, format=None):
        self.width, self.height = width, height
        self.data, self.format = data, format


class _Canvas:
    def __init__(self, master=None, width=1, height=1, **kw):
        self._w, self._h = int(width), int(height)
        self.items = {}            # id -> {"coords": ..., "state": ...}
        self.handlers = {}         # event sequence -> callback
        self._next_id = 1

    def winfo_width(self):
        return self._w

    def winfo_height(self):
        return self._h

    def create_image(self, x, y, image=None, anchor=None):
        i, self._next_id = self._next_id, self._next_id + 1
        self.items[i] = {"coords": (x, y), "state": "normal", "image": image}
        return i

    def create_rectangle(self, coords, width=None, outline=None):
        i, self._next_id = self._next_id, self._next_id + 1
        self.items[i] = {"coords": tuple(coords), "state": "normal"}
        return i

    def coords(self, item, *xy):
        self.items[item]["coords"] = xy

    def itemconfig(self, item, state=None):
        self.items[item]["state"] = state

    def bind(self, seq, cb):
        self.handlers[seq] = cb

    def grid(self, **kw):
        pass


class _Widget:
    def __init__(self, master=None, **kw):
        self.kw = kw

    def grid(self, **kw):
        pass

    def configure(self, **kw):
        self.kw.update(kw)


class _Master:
    """Stands in for the Tk root: only `after` is used by DemoWindow."""

    def __init__(self):
        self.after_calls = []      # list of (ms, callback)

    def after(self, ms, cb):
        self.after_calls.append((ms, cb))


class _Event:
    def __init__(self, x, y):
        self.x, self.y = x, y


@pytest.fixture()
def fake_tk(monkeypatch):
    tk = types.ModuleType("tkinter")
    tk.Canvas = _Canvas
    tk.PhotoImage = _PhotoImage
    tk.IntVar = _IntVar
    tk.StringVar = _Var
    tk.Spinbox = _Widget
    tk.NW = "nw"
    ttk = types.ModuleType("tkinter.ttk")
    ttk.Frame = _Widget
    ttk.Radiobutton = _Widget
    ttk.Button = _Widget
    ttk.Checkbutton = _Widget
    ttk.Label = _Widget
    tk.ttk = ttk
    monkeypatch.setitem(sys.modules, "tkinter", tk)
    monkeypatch.setitem(sys.modules, "tkinter.ttk", ttk)
    return tk


# -- PixelCanvas through its event handlers ----------------------------------

def test_pixel_canvas_click_drag_paints(fake_tk):
    pc = PixelCanvas(None, 50, 50, drawable=True, width=400, height=400)
    # canvas 400/50 = 8 px per image pixel; click at (100, 60) -> px (7, 12)
    pc.canvas.handlers["<Button-1>"](_Event(100, 60))
    assert pc.image[7, 12] == 1.0
    pc.canvas.handlers["<B1-Motion>"](_Event(180, 60))   # drag to col 22
    assert pc.image[7, 22] == 1.0 and pc.image[7, 17] == 1.0
    # right-click clears through the bound handler
    pc.canvas.handlers["<Button-3>"](_Event(0, 0))
    assert pc.image.sum() == 0.0


def test_pixel_canvas_ppm_frame(fake_tk):
    pc = PixelCanvas(None, 50, 50, drawable=False, width=400, height=400)
    pc.set_image(np.full((50, 50), 0.5, np.float32))
    header = b"P5 400 400 255 "
    assert pc.photo.format == "PPM"
    assert pc.photo.data.startswith(header)
    body = np.frombuffer(pc.photo.data[len(header):], np.uint8)
    assert body.shape == (400 * 400,) and int(body[0]) == 127


def test_pixel_canvas_bbox_items(fake_tk):
    pc = PixelCanvas(None, 50, 50, drawable=False, width=400, height=400)
    pc.set_bbox_positions([(0.5, 0.0, 0.0), (0.25, -0.5, 0.5)])
    rects = [pc.canvas.items[i] for i in pc.bbox_ids]
    assert rects[0]["state"] == "normal"
    assert rects[0]["coords"] == pytest.approx(
        bbox_canvas_coords(0.5, 0.0, 0.0, 400, 400))
    assert rects[1]["coords"] == pytest.approx((50, 250, 150, 350))
    assert all(r["state"] == "hidden" for r in rects[2:])
    pc.set_bbox_visibility(False)
    assert all(pc.canvas.items[i]["state"] == "hidden" for i in pc.bbox_ids)


# -- DemoWindow: controls, traces, and the inference timer loop ---------------

class _FakeWrapper:
    """ModelWrapper stand-in returning the reference 6-tuple
    (serve/model_wrapper.py: digits, positions, reconstructions, windows,
    latents, loss) for a fixed 2-step inference."""

    def __init__(self):
        self.calls = 0

    def infer(self, images):
        self.calls += 1
        digits = [2]
        pos = [[(0.5, 0.0, 0.0), (0.3, 0.2, -0.2)]]
        rec = [np.full((50, 50), 0.25, np.float32)]
        win = [[np.zeros((28, 28), np.float32),
                np.ones((28, 28), np.float32)]]
        lat = [[np.zeros(50), np.zeros(50)]]
        loss = [123.456]
        return digits, pos, rec, win, lat, loss


def _make_window(fake_tk):
    master = _Master()
    wrapper = _FakeWrapper()
    win = DemoWindow(master, wrapper, canvas_size=50, window_size=28,
                     refresh_period=50)
    return master, wrapper, win


def test_demo_window_traces_drive_canvases(fake_tk):
    _, _, win = _make_window(fake_tk)
    win.draw_mode.set(0)
    assert win.cnv_orig.erasing is True
    win.draw_mode.set(1)
    assert win.cnv_orig.erasing is False
    win.width_var.set("5")
    assert win.cnv_orig.line_width == 5
    win.rate_var.set("200")
    assert win.refresh_period == 200
    win.bbox_var.set(0)
    assert win.cnv_orig.bbox_visibility is False
    assert win.cnv_rec.bbox_visibility is False
    win.bbox_var.set(1)
    assert win.cnv_rec.bbox_visibility is True


def test_demo_window_inference_tick(fake_tk):
    master, wrapper, win = _make_window(fake_tk)
    # constructor arms the first tick at 100 ms (reference demo_window.py:34)
    assert master.after_calls[0][0] == 100
    master.after_calls[0][1]()                      # fire the timer
    assert wrapper.calls == 1
    # reconstruction displayed, bboxes propagated to BOTH main canvases
    assert win.cnv_rec.image[0, 0] == pytest.approx(0.25)
    assert win.cnv_rec.bbox_positions == win.cnv_orig.bbox_positions
    assert len(win.cnv_rec.bbox_positions) == 2
    # two inferred windows -> panes 0,1 filled, pane 2 cleared
    assert win.cnv_win[1].image.sum() == 28 * 28
    assert win.cnv_win[2].image.sum() == 0.0
    assert win.cnv_win[2].bbox_positions == []
    # status bar shows the NLL; timer re-armed with the current period
    assert "123.456" in win.status.kw["text"]
    assert master.after_calls[-1][0] == win.refresh_period


def test_demo_window_respects_rate_change_on_rearm(fake_tk):
    master, wrapper, win = _make_window(fake_tk)
    win.rate_var.set("500")
    master.after_calls[0][1]()
    assert master.after_calls[-1][0] == 500
    master.after_calls[-1][1]()                     # second tick works too
    assert wrapper.calls == 2
