"""Device-health probe (gssd_tpu/utils/device_health.py)."""

from gssd_tpu.utils import device_health


def test_probe_succeeds_on_healthy_backend():
    assert device_health._probe_once(60.0)


def test_wait_gives_up_after_max_wait(monkeypatch):
    monkeypatch.setattr(device_health, "_probe_once", lambda t: False)
    msgs = []
    ok = device_health.wait_for_healthy_device(
        probe_timeout_s=0.01, retry_wait_s=0.01, max_wait_s=0.05,
        log=msgs.append)
    assert ok is False
    assert any("unhealthy" in m for m in msgs)


def test_wait_recovers_after_outage(monkeypatch):
    calls = {"n": 0}

    def flaky(_):
        calls["n"] += 1
        return calls["n"] >= 3  # two failed probes, then recovery

    monkeypatch.setattr(device_health, "_probe_once", flaky)
    msgs = []
    ok = device_health.wait_for_healthy_device(
        probe_timeout_s=0.01, retry_wait_s=0.01, max_wait_s=10.0,
        log=msgs.append)
    assert ok is True
    assert calls["n"] == 3
    assert any("recovered" in m for m in msgs)
