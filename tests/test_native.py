"""Native C++ map codec: build (if needed) and cross-parity with Python."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from dvm_slam_tpu.multiagent import codec, native_codec

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _ensure_built():
    if native_codec.available():
        return True
    if shutil.which("g++") is None:
        return False
    r = subprocess.run(["make", "-C", os.path.join(ROOT, "native")],
                       capture_output=True)
    native_codec._LIB = None
    return r.returncode == 0 and native_codec.available()


@pytest.mark.skipif(not _ensure_built(), reason="native codec not buildable")
class TestNativeCodec:
    def test_cross_parity(self, rng):
        arrays = {
            "a": rng.randn(5, 7).astype(np.float32),
            "b": rng.randint(0, 255, (3, 4, 2)).astype(np.uint8),
            "u": rng.randint(0, 2 ** 62, (4, 2)).astype(np.uint64),
            "m": rng.rand(9) > 0.5,
            "i": rng.randint(-100, 100, (6,)).astype(np.int32),
            "l": rng.randint(-100, 100, (2, 3)).astype(np.int64),
        }
        pb = codec.pack_arrays(arrays)
        nb = native_codec.pack_arrays(arrays)
        for blob, dec in [
            (pb, native_codec.unpack_arrays),
            (nb, codec.unpack_arrays),
            (nb, native_codec.unpack_arrays),
            (pb, codec.unpack_arrays),
        ]:
            out = dec(blob)
            assert set(out) == set(arrays)
            for k in arrays:
                np.testing.assert_array_equal(out[k], arrays[k])

    def test_mappacket_via_native(self, rng):
        pkt_arrays = {
            "kf_uuid": rng.randint(0, 2 ** 60, (2, 2)).astype(np.uint64),
            "pt_pos": rng.randn(10, 3).astype(np.float32),
        }
        blob = native_codec.pack_arrays(pkt_arrays)
        out = codec.unpack_arrays(blob)
        np.testing.assert_array_equal(out["kf_uuid"], pkt_arrays["kf_uuid"])

    def test_corruption_detected(self, rng):
        blob = bytearray(native_codec.pack_arrays({"a": rng.randn(4).astype(np.float32)}))
        blob[12] ^= 0xFF
        with pytest.raises(Exception):
            native_codec.unpack_arrays(bytes(blob))
