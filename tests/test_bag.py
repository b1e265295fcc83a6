"""Bag decoder tests: synthesize a valid rosbag 2.0 file, parse with the
pure-Python reference parser and the native C++ decoder, cross-check."""
import struct

import numpy as np
import pytest

from lins_tpu.datasets import bag as bagmod


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_string(s: bytes) -> bytes:
    return struct.pack("<I", len(s)) + s


def _imu_msg(acc, gyr) -> bytes:
    msg = struct.pack("<III", 0, 0, 0) + _ros_string(b"imu")
    msg += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0] * 9))
    msg += struct.pack("<3d", *gyr) + struct.pack("<9d", *([0] * 9))
    msg += struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9))
    return msg


def _cloud_msg(xyz: np.ndarray, ring: np.ndarray) -> bytes:
    n = len(xyz)
    msg = struct.pack("<III", 0, 0, 0) + _ros_string(b"velodyne")
    msg += struct.pack("<II", 1, n)  # height, width
    fields = [(b"x", 0, 7), (b"y", 4, 7), (b"z", 8, 7), (b"intensity", 12, 7),
              (b"ring", 16, 4)]
    msg += struct.pack("<I", len(fields))
    for name, off, dt in fields:
        msg += _ros_string(name) + struct.pack("<IBI", off, dt, 1)
    point_step = 18
    msg += struct.pack("<B", 0)  # is_bigendian
    msg += struct.pack("<II", point_step, point_step * n)
    raw = bytearray(point_step * n)
    for i in range(n):
        struct.pack_into("<4fH", raw, i * point_step,
                         xyz[i, 0], xyz[i, 1], xyz[i, 2], 1.0, int(ring[i]))
    msg += struct.pack("<I", len(raw)) + bytes(raw)
    msg += struct.pack("<B", 1)  # is_dense
    return msg


def _time(t: float) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<II", secs, nsecs)


def write_test_bag(path, imu, clouds, chunked=True):
    """imu: list of (t, acc, gyr); clouds: list of (t, xyz, ring)."""
    conn_imu = _record({"op": b"\x07", "conn": struct.pack("<I", 0),
                        "topic": b"/imu/data"},
                       _header({"topic": b"/imu/data",
                                "type": b"sensor_msgs/Imu",
                                "md5sum": b"x", "message_definition": b""}))
    conn_pc = _record({"op": b"\x07", "conn": struct.pack("<I", 1),
                       "topic": b"/velodyne_points"},
                      _header({"topic": b"/velodyne_points",
                               "type": b"sensor_msgs/PointCloud2",
                               "md5sum": b"x", "message_definition": b""}))
    msgs = b""
    for t, acc, gyr in imu:
        msgs += _record({"op": b"\x02", "conn": struct.pack("<I", 0),
                         "time": _time(t)}, _imu_msg(acc, gyr))
    for t, xyz, ring in clouds:
        msgs += _record({"op": b"\x02", "conn": struct.pack("<I", 1),
                         "time": _time(t)}, _cloud_msg(xyz, ring))

    inner = conn_imu + conn_pc + msgs
    if chunked:
        body = _record({"op": b"\x05", "compression": b"none",
                        "size": struct.pack("<I", len(inner))}, inner)
    else:
        body = inner
    bag_header = _record({"op": b"\x03",
                          "index_pos": struct.pack("<Q", 0),
                          "conn_count": struct.pack("<I", 2),
                          "chunk_count": struct.pack("<I", 1)}, b" " * 4096)
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + body)


@pytest.fixture(scope="module")
def bag_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    imu = [(100.0 + 0.0025 * i, rng.normal(0, 1, 3) + [0, 0, 9.81],
            rng.normal(0, 0.1, 3)) for i in range(40)]
    clouds = []
    for k in range(3):
        n = 500 + 17 * k
        xyz = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        ring = rng.integers(0, 16, n)
        clouds.append((100.05 + 0.1 * k, xyz, ring))
    p = tmp_path_factory.mktemp("bags") / "test.bag"
    write_test_bag(str(p), imu, clouds)
    return str(p), imu, clouds


class TestPythonParser:
    def test_parses_all(self, bag_file):
        path, imu, clouds = bag_file
        out = bagmod.read_bag_python(path, "/imu/data", "/velodyne_points")
        assert len(out.imu_times) == len(imu)
        assert len(out.clouds) == len(clouds)
        np.testing.assert_allclose(out.imu_acc[0], imu[0][1], atol=1e-12)
        np.testing.assert_allclose(out.imu_gyr[5], imu[5][2], atol=1e-12)
        np.testing.assert_allclose(out.clouds[1], clouds[1][1], atol=1e-6)
        np.testing.assert_array_equal(out.rings[2], clouds[2][2])
        np.testing.assert_allclose(out.cloud_times, [c[0] for c in clouds],
                                   atol=1e-8)

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.bag"
        p.write_bytes(b"this is not a bag")
        with pytest.raises(IOError):
            bagmod.read_bag_python(str(p), "/a", "/b")


class TestNativeParser:
    def test_matches_python(self, bag_file):
        path, imu, clouds = bag_file
        if bagmod._load_native() is None:
            pytest.skip("native build unavailable")
        a = bagmod.read_bag_python(path, "/imu/data", "/velodyne_points")
        b = bagmod.read_bag_native(path, "/imu/data", "/velodyne_points")
        np.testing.assert_allclose(b.imu_times, a.imu_times, atol=1e-9)
        np.testing.assert_allclose(b.imu_acc, a.imu_acc, atol=1e-12)
        np.testing.assert_allclose(b.imu_gyr, a.imu_gyr, atol=1e-12)
        assert len(b.clouds) == len(a.clouds)
        for ca, cb, ra, rb in zip(a.clouds, b.clouds, a.rings, b.rings):
            np.testing.assert_allclose(cb, ca, atol=1e-6)
            np.testing.assert_array_equal(rb, ra)

    def test_to_sequence(self, bag_file):
        path, imu, clouds = bag_file
        from lins_tpu.config import VLP16
        out = bagmod.read_bag(path)
        seq = bagmod.bag_to_sequence(out, VLP16)
        assert seq["scans_xyz"].shape[0] == 3
        assert seq["scans_n"][0] == 500
