"""TCP socket transport: same semantics as the loopback bus, across real
sockets (three endpoints on localhost)."""

import numpy as np
import pytest

from dvm_slam_tpu.multiagent import codec, messages as msgs
from dvm_slam_tpu.multiagent.socket_transport import SocketTransport


@pytest.fixture
def buses():
    import socket

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    peers = {i: ("127.0.0.1", free_port()) for i in (1, 2, 3)}
    ts = {i: SocketTransport(i, peers) for i in (1, 2, 3)}
    yield ts
    for t in ts.values():
        t.close()


def _wait_poll(bus, agent, channel, tries=100):
    import time

    for _ in range(tries):
        out = bus.poll(agent, channel)
        if out:
            return out
        time.sleep(0.01)
    return []


class TestSocketTransport:
    def test_direct_and_broadcast(self, buses):
        buses[1].publish(1, 2, "ch", "direct")
        assert _wait_poll(buses[2], 2, "ch") == [(1, "direct")]
        buses[1].publish(1, None, "bcast", {"x": 1})
        assert _wait_poll(buses[2], 2, "bcast") == [(1, {"x": 1})]
        assert _wait_poll(buses[3], 3, "bcast") == [(1, {"x": 1})]
        assert buses[1].poll(1, "bcast") == []

    def test_service_roundtrip(self, buses):
        buses[2].register_service(2, "svc", lambda caller, req: (caller, req * 2))
        assert buses[1].call(1, 2, "svc", 21) == (1, 42)

    def test_map_packet_payload(self, buses, rng):
        arrays = {"pt_pos": rng.randn(50, 3).astype(np.float32)}
        blob = codec.pack_arrays(arrays)
        buses[1].publish(1, 3, msgs.CH_NEW_KEY_FRAMES,
                         msgs.NewKeyFrames(1, blob))
        out = _wait_poll(buses[3], 3, msgs.CH_NEW_KEY_FRAMES)
        assert len(out) == 1
        sender, m = out[0]
        back = codec.unpack_arrays(m.serialized_map)
        np.testing.assert_allclose(back["pt_pos"], arrays["pt_pos"])
        rep = buses[1].bandwidth_report()
        assert rep["bytes_by_channel"][msgs.CH_NEW_KEY_FRAMES] > 0

    def test_queue_depth_keep_last_10(self, buses):
        import time

        for i in range(20):
            buses[1].publish(1, 2, "q", i)
        time.sleep(0.3)
        out = [m for _, m in buses[2].poll(2, "q")]
        assert len(out) <= 10
        assert out[-1] == 19

    def test_peer_down_is_best_effort(self, buses):
        buses[3].close()
        buses[1].publish(1, 3, "ch", "lost")  # must not raise
        assert buses[1].call(1, 3, "svc", 1) is None
