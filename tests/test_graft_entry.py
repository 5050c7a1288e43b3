"""The driver's multichip dryrun must self-configure its device topology.

Round-1 regression: the driver artifact (MULTICHIP_r01.json) failed because
dryrun_multichip raised instead of forcing an n-device virtual CPU mesh when
fewer devices were visible (__graft_entry__.py). These tests pin the
bootstrap helpers and run the full dryrun under the conftest's 8-device mesh.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_force_host_devices_env_replaces_existing_count(monkeypatch):
    monkeypatch.setenv(
        "XLA_FLAGS", "--foo=1 --xla_force_host_platform_device_count=2"
    )
    flags = graft._force_host_devices_env(8)
    assert "--xla_force_host_platform_device_count=8" in flags
    assert "device_count=2" not in flags
    assert "--foo=1" in flags


def test_force_host_devices_env_from_empty(monkeypatch):
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    assert graft._force_host_devices_env(4).strip() == (
        "--xla_force_host_platform_device_count=4"
    )


def test_dryrun_multichip_runs_in_process_with_enough_devices():
    # conftest forces an 8-device CPU topology, so this exercises the direct
    # path (no subprocess) end to end: DPxTP train step + sharded indexes.
    graft.dryrun_multichip(8)
