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
