"""RC input tests: native adapter build, calibration transform parity."""

import json
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fpyv_tpu.inputs.build_native import build_joystick_lib
from fpyv_tpu.inputs.rc import Joystick, calib_transform, map_from_to

REPO = Path(__file__).resolve().parents[1]

FRSKY_STYLE_CALIB = {
    "sticks": {
        "Throttle": {"idx": 0, "center": 0.088},
        "Roll": {"idx": 1, "center": -0.081},
        "Pitch": {"idx": 2, "center": -0.012},
        "Yaw": {"idx": 5, "center": -0.004},
    },
    "switches": {"AUX1": {"idx": 3}, "AUX2": {"idx": 4}},
    "min_vals": [0, 4902, 774, 0, 0, 258],
    "max_vals": [48371, 65535, 65535, 65535, 65535, 65535],
    "sign_reverse": [1, 1, 1, 1, 1, 1],
}


class TestNativeBuild:
    def test_adapter_compiles(self):
        lib = build_joystick_lib()
        assert lib is not None and lib.exists(), "g++ build of joystick adapter failed"

    def test_num_devices_callable(self):
        from fpyv_tpu.inputs.joystick_native import num_devices

        n = num_devices()
        assert isinstance(n, int) and n >= 0  # headless CI: usually 0


class TestCalibration:
    def test_load_save_round_trip(self, tmp_path):
        path = tmp_path / "calib.json"
        path.write_text(json.dumps(FRSKY_STYLE_CALIB))
        js = Joystick()  # no device needed for calibration math
        js.load_calibration(path)
        out = tmp_path / "resaved.json"
        js.save_calibration(out)
        re = json.loads(out.read_text())
        assert re["sticks"]["Throttle"]["idx"] == 0
        np.testing.assert_allclose(re["min_vals"], FRSKY_STYLE_CALIB["min_vals"])

    def test_calib_read_center_split(self, tmp_path):
        """calib_read's piecewise center map (get_sticks.py:254-265):
        reading == center -> 0; edges -> ±1."""
        path = tmp_path / "calib.json"
        calib = dict(FRSKY_STYLE_CALIB)
        path.write_text(json.dumps(calib))
        js = Joystick()
        js.load_calibration(path)

        def fake_read(raw6):
            js.read = lambda: np.asarray(raw6, np.float64)[None, :]

        # raw value at a stick's center maps to exactly 0
        c = calib["sticks"]["Roll"]["center"]
        mn, mx = calib["min_vals"][1], calib["max_vals"][1]
        raw_at_center = (c + 1) / 2 * (mx - mn) + mn
        raw = [24000, raw_at_center, 30000, 0, 0, 30000]
        fake_read(raw)
        out = js.calib_read()
        assert abs(out[1]) < 1e-12
        # max raw maps to +1
        raw[1] = mx
        fake_read(raw)
        assert abs(js.calib_read()[1] - 1.0) < 1e-12
        # min raw maps to -1
        raw[1] = mn
        fake_read(raw)
        assert abs(js.calib_read()[1] + 1.0) < 1e-12

    def test_pure_transform_matches_class(self, tmp_path):
        path = tmp_path / "calib.json"
        path.write_text(json.dumps(FRSKY_STYLE_CALIB))
        js = Joystick()
        js.load_calibration(path)
        rng = np.random.default_rng(0)
        raws = rng.uniform(js.min_vals, js.max_vals, (32, 6))

        stick_idx = [js.sticks[k]["idx"] for k in js.sticks]
        stick_center = [js.sticks[k]["center"] for k in js.sticks]
        batch = calib_transform(raws, js.min_vals, js.max_vals,
                                np.asarray(js.sign_reverse),
                                stick_idx, stick_center)
        for i in range(32):
            js.read = lambda i=i: raws[i][None, :]
            np.testing.assert_allclose(batch[i], js.calib_read(), atol=1e-12)

    def test_read_action_ordering(self, tmp_path):
        """components.py:250-253: action = [-roll, pitch, yaw, throttle]."""
        path = tmp_path / "calib.json"
        path.write_text(json.dumps(FRSKY_STYLE_CALIB))
        js = Joystick()
        js.load_calibration(path)
        js.calib_read = lambda: np.array([0.5, 0.25, -0.3, 1.0, -1.0, 0.1])
        np.testing.assert_allclose(js.read_action(), [-0.25, -0.3, 0.1, 0.5])

    def test_no_device_status(self):
        js = Joystick(index=15)  # surely absent
        assert js.status is False
        assert js.read().shape == (1, 6)


def test_map_from_to():
    assert map_from_to(5.0, 0.0, 10.0, -1.0, 1.0) == 0.0
    assert map_from_to(0.0, 0.0, 10.0, -1.0, 1.0) == -1.0


class TestVirtualTarget:
    """Mouse-drag virtual target (reference simulator.py:15-31)."""

    def _oracle(self, events, res=(640, 480), rate=0.1):
        """Literal replica of the reference get_target callback math."""
        half = (res[0] / 2, res[1] / 2)
        ix, iy = half
        prev_ix, prev_iy = half
        flag = False
        out = []
        for ev, x, y in events:
            if ev == "down":
                flag = True
            elif ev == "up":
                flag = False
            if flag:
                ix = rate * x + (1 - rate) * prev_ix
                iy = rate * y + (1 - rate) * prev_iy
            else:
                ix = (1 - rate) * half[0] + rate * prev_ix
                iy = (1 - rate) * half[1] + rate * prev_iy
            prev_ix, prev_iy = ix, iy
            out.append((ix, iy))
        return out

    def test_drag_and_recenter_match_reference_math(self):
        from fpyv_tpu.inputs.mouse import VirtualTarget

        events = ([("down", 100, 50)] + [("move", 100, 50)] * 20
                  + [("up", 100, 50)] + [("move", 400, 400)] * 10)
        vt = VirtualTarget((640, 480))
        got = []
        for ev in events:
            vt.on_event(*ev)
            got.append(vt.pixel())
        np.testing.assert_allclose(got, self._oracle(events), atol=1e-12)
        # dragging eased toward (100, 50)...
        mid = got[20]
        assert mid[0] < 320 and mid[1] < 240
        # ...and releasing snapped back toward center fast (0.9/event)
        end = got[-1]
        assert abs(end[0] - 320) < 1.0 and abs(end[1] - 240) < 1.0

    def test_simulator_scripted_pixel_stream(self):
        """Headless: a scripted drag steers the guided sim — the flown
        trajectory must differ from the centroid-guided baseline."""
        from fpyv_tpu.apps.simulator import run_simulator

        def drag_up_left(t):
            if t == 0:
                return [("down", 0, 0)]
            return [("move", 0, 0)]  # hold toward top-left pixel

        out_vt = run_simulator(steps=12, render="none", guided=True, seed=0,
                               virtual_target=True,
                               target_events=drag_up_left)
        out_base = run_simulator(steps=12, render="none", guided=True, seed=0)
        assert out_vt["steps"] == 12
        dp = np.linalg.norm(np.asarray(out_vt["final_position"])
                            - np.asarray(out_base["final_position"]))
        assert dp > 1e-3, dp


class TestCalibrationViews:
    """Live wizard figures (get_sticks.py:62-99), headless via Agg."""

    def _js(self, tmp_path):
        path = tmp_path / "calib.json"
        path.write_text(json.dumps(FRSKY_STYLE_CALIB))
        js = Joystick()
        js.load_calibration(path)
        return js

    def test_make_fig_bars(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        js = self._js(tmp_path)
        js.last_raw = np.asarray([1000, 2000, 3000, 4000, 5000, 60000.0])
        fig, ax = plt.subplots()
        out = js.make_fig_bars(ax=ax)
        heights = [p.get_height() for p in out.patches]
        np.testing.assert_allclose(heights, js.last_raw)
        assert out.get_ylim() == (0.0, 65535.0)
        plt.close(fig)

    def test_make_fig_axes_scatter_positions(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt

        js = self._js(tmp_path)
        js.calib_reading = np.asarray([0.5, -0.25, 0.75, 1.0, -1.0, 0.1])
        fig = plt.figure()
        axs = fig.subplots(1, 3)
        js.make_fig_axes(axs=axs)
        # first panel scatters (yaw, throttle) from the calibrated reading
        yaw = js.calib_reading[js.sticks["Yaw"]["idx"]]
        thr = js.calib_reading[js.sticks["Throttle"]["idx"]]
        offs = axs[0].collections[0].get_offsets()
        np.testing.assert_allclose(np.asarray(offs)[0], [yaw, thr])
        # third panel bars the switches
        assert len(axs[2].patches) == len(js.switches)
        plt.close(fig)

    def test_render_gated_headless(self, tmp_path, monkeypatch):
        """No display -> render_bars/axes are no-ops (no GUI calls)."""
        monkeypatch.delenv("DISPLAY", raising=False)
        monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
        js = self._js(tmp_path)
        js.render_bars()
        js.render_axes()  # must not raise


class TestCalibrateCli:
    """`fpyv_tpu.cli calibrate` — the runnable twin of get_sticks.py's
    __main__ (calibrate + live read loop, get_sticks.py:268-283)."""

    def test_calibrate_subcommand_headless(self, tmp_path, monkeypatch,
                                           capsys):
        from fpyv_tpu import cli
        from fpyv_tpu.inputs import rc

        path = tmp_path / "calib.json"
        path.write_text(json.dumps(FRSKY_STYLE_CALIB))
        monkeypatch.delenv("DISPLAY", raising=False)
        monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)

        class FakeJoystick(rc.Joystick):
            def __init__(self, index=0):
                super().__init__(index=99)  # no real device
                self.ret = True  # pretend connected

            def read(self):
                self.last_raw = np.full(self.N_CHANNELS, 32767.0)
                return self.last_raw[None, :]

        monkeypatch.setattr(rc, "Joystick", FakeJoystick)
        cli.main(["calibrate", "--calibration", str(path),
                  "--live", "0.1", "--rps", "10"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["calibration"] == str(path)
        assert out["sticks"]["Throttle"]["idx"] == 0
        assert out["live_seconds"] == 0.1
        assert len(out["action"]) == 4

    def test_calibrate_no_device_exits(self, monkeypatch, tmp_path):
        from fpyv_tpu import cli

        with pytest.raises(SystemExit):
            cli.main(["calibrate", "--index", "97",
                      "--calibration", str(tmp_path / "none.json")])
