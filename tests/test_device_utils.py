"""utils/device.py: axon-relay reachability pre-check (the native plugin's
claim loop hangs forever when the tunnel's local endpoint is down — the
pre-check converts that into a bounded, diagnosable retry)."""

import socket

import pytest

from lstm_rnn_tpu.utils import device as dev


def test_relay_check_noop_off_axon(monkeypatch):
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert dev._relay_down_reason() is None


def test_relay_check_reports_closed_port(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("LSTM_RNN_TPU_AXON_PORT", "1")  # nothing listens
    r = dev._relay_down_reason()
    assert r is not None and "unreachable" in r


def test_relay_check_passes_open_port(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
        monkeypatch.setenv("LSTM_RNN_TPU_AXON_PORT",
                           str(srv.getsockname()[1]))
        assert dev._relay_down_reason() is None
    finally:
        srv.close()


def test_ensure_backend_raises_after_ladder(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setenv("LSTM_RNN_TPU_AXON_PORT", "1")
    sleeps = []
    monkeypatch.setattr(dev.time, "sleep", sleeps.append)
    with pytest.raises(RuntimeError, match="hang forever"):
        dev.ensure_backend(max_retries=3)
    assert sleeps == [60.0, 300.0, 600.0]
