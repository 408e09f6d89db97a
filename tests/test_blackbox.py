"""Native blackbox decoder round-trip tests.

A synthetic Betaflight blackbox v2 encoder (faithful to the public format
spec: header quadruples, variable-byte + tag-packed encodings, per-field
predictors) produces .BBL files; the C++ decoder
(native/blackbox/fpyv_blackbox.cpp via ctypes) must recover the exact field
tables.  Covers: SIGNED_VB / UNSIGNED_VB / NEG_14BIT / TAG2_3S32 /
TAG8_4S16(v2) / TAG8_8SVB encodings, predictors 0/previous/straight-line/
average-2/minthrottle/increment/1500, I/P frame interleave, S slow frames,
E events, and multi-log files.
"""

import struct

import numpy as np
import pytest

pytest.importorskip("ctypes")

from fpyv_tpu.io.blackbox_native import (  # noqa: E402
    build_blackbox_lib,
    decode_blackbox,
    header_value,
    num_logs,
)
from fpyv_tpu.io.logs import blackbox_parser  # noqa: E402

if build_blackbox_lib() is None:
    pytest.skip("g++ unavailable; native decoder cannot build",
                allow_module_level=True)


# ---------------------------------------------------------------------------
# Synthetic encoder (writes the format the decoder reads)
# ---------------------------------------------------------------------------


def write_unsigned_vb(buf: bytearray, v: int):
    assert v >= 0
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def write_signed_vb(buf: bytearray, v: int):
    write_unsigned_vb(buf, (v << 1) ^ (v >> 63) if v < 0 else v << 1)


def zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


class Encoder:
    """One blackbox log: headers + frames."""

    def __init__(self, fields, minthrottle=1150):
        # fields: list of dicts {name, ipred, ienc, ppred, penc}
        self.fields = fields
        self.minthrottle = minthrottle
        self.buf = bytearray()
        self._header()
        self.prev = None
        self.prev2 = None

    def _header(self):
        lines = [
            "H Product:Blackbox flight data recorder by Nicholas Sherlock",
            "H Data version:2",
            "H Firmware revision:Betaflight 4.4.0 (synthetic)",
            "H Field I name:" + ",".join(f["name"] for f in self.fields),
            "H Field I signed:" + ",".join("1" for _ in self.fields),
            "H Field I predictor:" + ",".join(str(f["ipred"]) for f in self.fields),
            "H Field I encoding:" + ",".join(str(f["ienc"]) for f in self.fields),
            "H Field P predictor:" + ",".join(str(f["ppred"]) for f in self.fields),
            "H Field P encoding:" + ",".join(str(f["penc"]) for f in self.fields),
            f"H minthrottle:{self.minthrottle}",
            "H vbatref:1680",
        ]
        self.buf += ("\n".join(lines) + "\n").encode()

    # -- raw-value encoders (inverse of the decoder) -------------------------

    def _encode_raws(self, raws, encodings):
        buf = self.buf
        i = 0
        while i < len(raws):
            enc = encodings[i]
            if enc == 0:
                write_signed_vb(buf, raws[i]); i += 1
            elif enc == 1:
                write_unsigned_vb(buf, raws[i]); i += 1
            elif enc == 3:
                # value = -signExtend14(uvb); encode uvb = (-value) & 0x3FFF
                write_unsigned_vb(buf, (-raws[i]) & 0x3FFF); i += 1
            elif enc == 9:
                i += 1
            elif enc == 6:  # TAG8_8SVB group
                n = 0
                while i + n < len(raws) and n < 8 and encodings[i + n] == 6:
                    n += 1
                group = raws[i:i + n]
                if n == 1:
                    write_signed_vb(buf, group[0])
                else:
                    tag = 0
                    for k, v in enumerate(group):
                        if v != 0:
                            tag |= 1 << k
                    buf.append(tag)
                    for v in group:
                        if v != 0:
                            write_signed_vb(buf, v)
                i += n
            elif enc == 7:  # TAG2_3S32: encode the 3 values as bytes (case 3)
                v = raws[i:i + 3]
                assert len(v) == 3
                lead = 3 << 6
                sizes = []
                for k, x in enumerate(v):
                    for nb in (1, 2, 3, 4):
                        lo, hi = -(1 << (8 * nb - 1)), (1 << (8 * nb - 1)) - 1
                        if lo <= x <= hi:
                            sizes.append(nb)
                            break
                    lead |= (sizes[k] - 1) << (2 * k)
                buf.append(lead)
                for x, nb in zip(v, sizes):
                    buf += int(x & ((1 << (8 * nb)) - 1)).to_bytes(nb, "little")
                i += 3
            elif enc == 8:  # TAG8_4S16 v2, nibble stream
                v = raws[i:i + 4]
                assert len(v) == 4
                selector = 0
                nibbles = []
                for k, x in enumerate(v):
                    if x == 0:
                        code = 0
                    elif -8 <= x <= 7:
                        code = 1
                        nibbles.append(x & 0xF)
                    elif -128 <= x <= 127:
                        code = 2
                        nibbles += [(x >> 4) & 0xF, x & 0xF]
                    else:
                        assert -(1 << 15) <= x < (1 << 15)
                        code = 3
                        nibbles += [(x >> 12) & 0xF, (x >> 8) & 0xF,
                                    (x >> 4) & 0xF, x & 0xF]
                    selector |= code << (2 * k)
                buf.append(selector)
                if len(nibbles) % 2:
                    nibbles.append(0)
                for a, b in zip(nibbles[0::2], nibbles[1::2]):
                    buf.append((a << 4) | b)
                i += 4
            else:
                raise AssertionError(f"encoder: unsupported encoding {enc}")

    def _predict(self, idx, pred, current):
        f = self.fields[idx]
        if pred == 0:
            return 0
        if pred == 1:
            return self.prev[idx] if self.prev is not None else 0
        if pred == 2:
            if self.prev2 is not None:
                return 2 * self.prev[idx] - self.prev2[idx]
            return self.prev[idx] if self.prev is not None else 0
        if pred == 3:
            if self.prev2 is not None:
                return (self.prev[idx] + self.prev2[idx]) // 2
            return self.prev[idx] if self.prev is not None else 0
        if pred == 4:
            return self.minthrottle
        if pred == 6:
            return 1 + (self.prev[idx] if self.prev is not None else 0)
        if pred == 8:
            return 1500
        raise AssertionError(f"encoder: unsupported predictor {pred}")

    def frame(self, values, intra: bool):
        values = list(values)
        self.buf.append(ord("I" if intra else "P"))
        raws = []
        for i, v in enumerate(values):
            pred = self.fields[i]["ipred"] if intra else self.fields[i]["ppred"]
            raws.append(v - self._predict(i, pred, values))
        encs = [f["ienc"] if intra else f["penc"] for f in self.fields]
        self._encode_raws(raws, encs)
        if intra:
            self.prev, self.prev2 = values, None
        else:
            self.prev2, self.prev = self.prev, values

    def event_sync_beep(self, t=12345):
        self.buf.append(ord("E"))
        self.buf.append(0)
        write_unsigned_vb(self.buf, t)

    def end(self):
        self.buf.append(ord("E"))
        self.buf.append(255)
        self.buf += b"End of log\x00"


MAIN_FIELDS = [
    dict(name="loopIteration", ipred=0, ienc=1, ppred=6, penc=9),
    dict(name="time", ipred=0, ienc=1, ppred=2, penc=0),
    dict(name="axisP[0]", ipred=0, ienc=0, ppred=1, penc=7),
    dict(name="axisP[1]", ipred=0, ienc=0, ppred=1, penc=7),
    dict(name="axisP[2]", ipred=0, ienc=0, ppred=1, penc=7),
    dict(name="rcCommand[0]", ipred=0, ienc=0, ppred=3, penc=8),
    dict(name="rcCommand[1]", ipred=0, ienc=0, ppred=3, penc=8),
    dict(name="rcCommand[2]", ipred=0, ienc=0, ppred=3, penc=8),
    dict(name="rcCommand[3]", ipred=8, ienc=0, ppred=3, penc=8),
    dict(name="motor[0]", ipred=4, ienc=1, ppred=2, penc=6),
    dict(name="motor[1]", ipred=4, ienc=1, ppred=2, penc=6),
    dict(name="motor[2]", ipred=4, ienc=1, ppred=2, penc=6),
    dict(name="motor[3]", ipred=4, ienc=1, ppred=2, penc=6),
]


def synth_trajectory(n, seed=0):
    """Deterministic plausible int series per field."""
    rng = np.random.default_rng(seed)
    rows = []
    t = 1_000_000
    for k in range(n):
        t += 125 + int(rng.integers(-3, 4))
        rows.append([
            k,                      # loopIteration
            t,                      # time
            int(rng.integers(-40, 41)),
            int(rng.integers(-40, 41)),
            int(rng.integers(-3000, 3001)),   # forces TAG2_3S32 byte cases
            int(rng.integers(1400, 1601)),
            int(rng.integers(1400, 1601)),
            int(rng.integers(1400, 1601)),
            int(rng.integers(1000, 2001)),
            int(rng.integers(1150, 1850)),
            int(rng.integers(1150, 1850)),
            int(rng.integers(1150, 1850)),
            int(rng.integers(1150, 1850)),
        ])
    return rows


def write_log(path, rows, iframe_every=8, with_events=True):
    enc = Encoder(MAIN_FIELDS)
    for k, row in enumerate(rows):
        if with_events and k == 3:
            enc.event_sync_beep()
        enc.frame(row, intra=(k % iframe_every == 0))
    enc.end()
    path.write_bytes(bytes(enc.buf))
    return enc


class TestRoundTrip:
    def test_all_values_recovered(self, tmp_path):
        rows = synth_trajectory(100)
        p = tmp_path / "flight.bbl"
        write_log(p, rows)
        table = decode_blackbox(p)
        assert list(table) == [f["name"] for f in MAIN_FIELDS]
        got = np.stack([table[f["name"]] for f in MAIN_FIELDS], axis=1)
        np.testing.assert_array_equal(got, np.asarray(rows, np.int64))

    def test_i_frames_only(self, tmp_path):
        rows = synth_trajectory(20, seed=1)
        p = tmp_path / "iframes.bbl"
        write_log(p, rows, iframe_every=1, with_events=False)
        table = decode_blackbox(p)
        np.testing.assert_array_equal(table["time"],
                                      [r[1] for r in rows])

    def test_header_access(self, tmp_path):
        p = tmp_path / "hdr.bbl"
        write_log(p, synth_trajectory(5))
        assert header_value(p, "minthrottle") == "1150"
        assert "Betaflight" in header_value(p, "Firmware revision")

    def test_blackbox_parser_uses_native(self, tmp_path):
        rows = synth_trajectory(30, seed=2)
        p = tmp_path / "via_parser.bbl"
        write_log(p, rows)
        table = blackbox_parser(p)
        assert table["motor[0]"].dtype == np.float64
        np.testing.assert_array_equal(table["motor[0]"].astype(np.int64),
                                      [r[9] for r in rows])


class TestMultiLog:
    def test_two_logs(self, tmp_path):
        rows_a = synth_trajectory(12, seed=3)
        rows_b = synth_trajectory(7, seed=4)
        enc_a = Encoder(MAIN_FIELDS)
        for k, r in enumerate(rows_a):
            enc_a.frame(r, intra=(k % 4 == 0))
        enc_a.end()
        enc_b = Encoder(MAIN_FIELDS)
        for k, r in enumerate(rows_b):
            enc_b.frame(r, intra=(k % 4 == 0))
        enc_b.end()
        p = tmp_path / "two.bbl"
        p.write_bytes(bytes(enc_a.buf) + bytes(enc_b.buf))
        assert num_logs(p) == 2
        np.testing.assert_array_equal(decode_blackbox(p, 0)["time"],
                                      [r[1] for r in rows_a])
        np.testing.assert_array_equal(decode_blackbox(p, 1)["time"],
                                      [r[1] for r in rows_b])


class TestSlowFrames:
    def test_slow_values_carried_forward(self, tmp_path):
        enc = Encoder(MAIN_FIELDS)
        # inject S-frame defs into the header by rebuilding it
        enc.buf = bytearray()
        enc._header()
        extra = ("H Field S name:flightModeFlags,stateFlags\n"
                 "H Field S signed:0,0\n"
                 "H Field S predictor:0,0\n"
                 "H Field S encoding:1,1\n").encode()
        enc.buf += extra
        rows = synth_trajectory(10, seed=5)
        for k, r in enumerate(rows):
            if k == 0 or k == 4:
                enc.buf.append(ord("S"))
                write_unsigned_vb(enc.buf, 100 + k)
                write_unsigned_vb(enc.buf, 7)
            enc.frame(r, intra=(k % 4 == 0))
        enc.end()
        p = tmp_path / "slow.bbl"
        p.write_bytes(bytes(enc.buf))
        table = decode_blackbox(p)
        assert "flightModeFlags" in table
        np.testing.assert_array_equal(
            table["flightModeFlags"],
            [100, 100, 100, 100, 104, 104, 104, 104, 104, 104])
        np.testing.assert_array_equal(table["stateFlags"], [7] * 10)


class TestRobustness:
    def test_truncated_file(self, tmp_path):
        rows = synth_trajectory(50, seed=6)
        enc = Encoder(MAIN_FIELDS)
        for k, r in enumerate(rows):
            enc.frame(r, intra=(k % 8 == 0))
        p = tmp_path / "trunc.bbl"
        p.write_bytes(bytes(enc.buf[: len(enc.buf) - 10]))  # cut mid-frame
        table = decode_blackbox(p)
        n = len(table["time"])
        assert 40 <= n <= 50
        np.testing.assert_array_equal(table["time"][: n - 1],
                                      [r[1] for r in rows[: n - 1]])

    def test_not_a_blackbox(self, tmp_path):
        p = tmp_path / "junk.bbl"
        p.write_bytes(b"this is not a blackbox log at all")
        with pytest.raises(ValueError):
            decode_blackbox(p)
