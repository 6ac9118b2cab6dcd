"""The cross-process TPU device lock (ark_tpu/utils/device_lock.py):
advisory flock serializing every TPU entrypoint; strict no-op on the cpu
platform (this suite) and when disabled via env."""

import pytest


def test_device_lock_noop_on_cpu():
    from ark_tpu.utils import device_lock as dl

    # conftest pins the cpu priority platform -> never takes the lock
    assert dl.tpu_is_priority_platform() is False
    assert dl.acquire_device_lock() is False
    assert dl._HELD == []


def test_device_lock_mechanics(tmp_path, monkeypatch):
    from ark_tpu.utils import device_lock as dl

    monkeypatch.setenv("ARK_TPU_DEVICE_LOCK_FILE", str(tmp_path / "dev.lock"))
    monkeypatch.setattr(dl, "tpu_is_priority_platform", lambda: True)

    # disabled via env -> no-op even when applicable
    monkeypatch.setenv("ARK_TPU_DEVICE_LOCK", "0")
    assert dl.acquire_device_lock() is False
    monkeypatch.delenv("ARK_TPU_DEVICE_LOCK")

    assert dl.acquire_device_lock(tag="holder") is True
    held = dl._HELD.pop()
    try:
        # a second open file description cannot take the flock -> timeout
        with pytest.raises(TimeoutError):
            dl.acquire_device_lock(timeout=0.2, poll=0.05, tag="waiter")
        # env-provided timeout is honored too
        monkeypatch.setenv("ARK_TPU_DEVICE_LOCK_TIMEOUT", "0.2")
        with pytest.raises(TimeoutError):
            dl.acquire_device_lock(poll=0.05, tag="waiter2")
        monkeypatch.delenv("ARK_TPU_DEVICE_LOCK_TIMEOUT")
    finally:
        held.close()  # releases the flock

    # free again -> acquired immediately; lockfile records the holder
    assert dl.acquire_device_lock(timeout=1, tag="next") is True
    assert "tag=next" in (tmp_path / "dev.lock").read_text()
    # re-entrant: a second acquire in the holding process returns True
    # immediately instead of flocking against our own held lock
    assert dl.acquire_device_lock(timeout=0.2, tag="again") is True
    assert len(dl._HELD) == 1
    dl._HELD.pop().close()
