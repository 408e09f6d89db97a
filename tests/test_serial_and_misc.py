"""Serial protocol parsers, trail ring buffer, misc aux components."""

import base64

import numpy as np
import jax.numpy as jnp

from fpyv_tpu.inputs.serial_readers import (
    RX5808_FREQS,
    make_timing_message,
    parse_gyroglove,
    parse_rx5808,
    parse_timing_message,
    parse_timing_stream,
    read_velocidrone_track,
    timing_crc,
)
from fpyv_tpu.viz.trail import Trail


class TestGyroglove:
    def test_quaternion_line(self):
        text = ("quaternion: w: 16384, x: 0, y: 0, z: 0\r\n"
                "quaternion: w: 11585, x: 11585, y: 0, z: 0\r\n"
                "quaternion: w: 113")  # torn final line
        s = parse_gyroglove(text)
        np.testing.assert_allclose(
            s.quaternion, [11585 / 16384, 11585 / 16384, 0, 0])

    def test_position_and_acceleration(self):
        text = ("Position: 16384 0 8192\r\nPosition: 0 16384 0\r\n"
                "Acceleration: 100 200 300\r\nAcceleration: 400 500 600\r\n")
        s = parse_gyroglove(text)
        np.testing.assert_allclose(s.position, [0, 1.0, 0])
        np.testing.assert_allclose(
            s.acceleration, np.array([400, 500, 600]) / 16384)

    def test_rotation_matrix_line(self):
        vals = " ".join(str(v) for v in range(9))
        text = f"Rotation matrix: {vals}\r\nRotation matrix: {vals}\r\n"
        s = parse_gyroglove(text)
        np.testing.assert_allclose(
            s.rotation_matrix, np.arange(9).reshape(3, 3) / 16384)


class TestRx5808:
    def test_parse_sweep(self):
        lines = [f"Frequency: {f} MHz, RSSI: {100 + i} dBm"
                 for i, f in enumerate(RX5808_FREQS)]
        text = "\r\n".join(lines) + "\r\nFrequency: 58"  # torn line dropped
        out = parse_rx5808(text)
        assert len(out) >= 38  # duplicate 5880/5732 freqs collapse
        assert out[5865] == 100

    def test_band_table_size(self):
        assert len(RX5808_FREQS) == 40  # 5 bands x 8 channels


class TestTimingSystem:
    def test_round_trip(self):
        msg = make_timing_message(1234567890, "aa:bb:cc:dd:ee:ff", -42)
        assert len(msg) == 27
        ts, mac, rssi = parse_timing_message(msg)
        assert ts == 1234567890
        assert mac == "aa:bb:cc:dd:ee:ff"
        assert rssi == -42

    def test_crc_rejects_corruption(self):
        msg = make_timing_message(1234567890, "aa:bb:cc:dd:ee:ff", -42)
        bad = msg[:5] + ("9" if msg[5] != "9" else "8") + msg[6:]
        assert parse_timing_message(bad) is None

    def test_stream_extraction(self):
        m1 = make_timing_message(1000000001, "11:22:33:44:55:66", -50)
        m2 = make_timing_message(1000000002, "11:22:33:44:55:66", -55)
        text = f"junk\r\n{m1}\r\ngarbage$\r\n{m2}\r\n$short\r\n"
        out = parse_timing_stream(text)
        assert [o[0] for o in out] == [1000000001, 1000000002]

    def test_crc_is_xor(self):
        assert timing_crc("AB") == ord("A") ^ ord("B")


class TestVelocidrone:
    def test_decode(self, tmp_path):
        payload = b"track-blob-\x00\x01\x02"
        p = tmp_path / "track.trk"
        p.write_text(base64.b64encode(payload).decode())
        assert read_velocidrone_track(p) == payload


class TestTrail:
    def test_ring_buffer_keeps_last(self):
        t = Trail.create(4, jnp.zeros(3))
        for i in range(1, 7):
            t = t.update(jnp.asarray([float(i), 0.0, 0.0]))
        pts = np.asarray(t.ordered())
        # last 4 positions: 3,4,5,6 oldest-first
        np.testing.assert_allclose(pts[:, 0], [3, 4, 5, 6])

    def test_partial_fill(self):
        t = Trail.create(8, jnp.asarray([1.0, 2.0, 3.0]))
        t = t.update(jnp.asarray([4.0, 5.0, 6.0]))
        pts = np.asarray(t.ordered())
        np.testing.assert_allclose(pts[0], [1, 2, 3])
        np.testing.assert_allclose(pts[1], [4, 5, 6])
        # tail clamps to newest
        np.testing.assert_allclose(pts[-1], [4, 5, 6])


class TestTrailBatched:
    def test_batched_ring(self):
        t = Trail.create(4, jnp.zeros((3, 3)), batch_shape=(3,))
        for i in range(1, 7):
            pos = jnp.tile(jnp.asarray([[float(i), 0.0, 0.0]]), (3, 1))
            pos = pos.at[1, 0].mul(10.0)  # env 1 gets different positions
            t = t.update(pos)
        pts = np.asarray(t.ordered())
        assert pts.shape == (3, 4, 3)
        np.testing.assert_allclose(pts[0, :, 0], [3, 4, 5, 6])
        np.testing.assert_allclose(pts[1, :, 0], [30, 40, 50, 60])
