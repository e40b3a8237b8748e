"""Multi-host (multi-process) execution: the full product path (Mapper on
the synthetic scene, XLA SPMD step, mesh {"obj": 4, "data": 2}) runs as TWO
coordinated processes with 4 virtual CPU devices each, and its per-frame
losses match the single-process 8-device run. Also covers the collective
host-view paths: mesh export and the orbax full checkpoint with
primary-only artifact writing.

The reference is single-GPU (train.py:32); this is a capability beyond it.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(env_extra, args=()):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, DRIVER, *args], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _results(*procs, timeout=900):
    """communicate() each process, killing ALL of them on any timeout or
    failure so a hung coordinator can't leak orphan drivers (which would
    hold the port and poison later runs)."""
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            assert p.returncode == 0, f"driver failed:\n{err[-3000:]}"
            line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
            outs.append(json.loads(line))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs


def test_two_process_loss_parity(tmp_path):
    (ref,) = _results(_run({"VMAP_TEST_LOCAL_DEVICES": "8"},
                           args=(str(tmp_path / "single"),)))
    assert ref["n_devices"] == 8

    env = {"VMAP_TEST_LOCAL_DEVICES": "4",
           "VMAP_COORDINATOR": f"127.0.0.1:{_free_port()}",
           "VMAP_NUM_PROCESSES": "2"}
    p0 = _run({**env, "VMAP_PROCESS_ID": "0"}, args=(str(tmp_path / "mh"),))
    p1 = _run({**env, "VMAP_PROCESS_ID": "1"}, args=(str(tmp_path / "mh"),))
    r0, r1 = _results(p0, p1)

    assert r0["n_devices"] == 8 and r1["n_devices"] == 8
    assert r0["primary"] != r1["primary"]
    # both processes see identical (replicated) losses
    assert r0["losses"] == r1["losses"]
    # and they match the single-process SPMD run (to float tolerance on the
    # driver's 4-decimal prints; exact equality observed in practice)
    np.testing.assert_allclose(r0["losses"], ref["losses"],
                               rtol=2e-4, atol=1e-4)
    # primary wrote meshes + checkpoint, secondary wrote nothing
    prim, sec = (r0, r1) if r0["primary"] else (r1, r0)
    assert prim["n_meshes"] > 0 and sec["n_meshes"] == 0
    assert (tmp_path / "mh" / "ckpt" / "latest.json").exists()
    meshes = os.listdir(tmp_path / "mh" / "mesh")
    assert any(f.endswith(".obj") for f in meshes)


def test_two_process_fused_kernel(tmp_path):
    """The FLAGSHIP path — the monolithic fused Pallas train kernel under
    shard_map — runs multi-host: 2 processes, group axis sharded over the
    cross-process "obj" mesh axis, identical replicated losses on both,
    INCLUDING the collective host-view chain (unprepare of the sharded
    prepared bank -> all-gather -> mesh export + orbax checkpoint).
    (Parity with the single-process fused run was additionally verified:
    same losses to the printed 4 decimals; not re-run here to keep the
    suite's single-core wall time bounded.)"""
    env = {"VMAP_TEST_LOCAL_DEVICES": "4", "VMAP_TEST_FUSED": "1",
           "VMAP_COORDINATOR": f"127.0.0.1:{_free_port()}",
           "VMAP_NUM_PROCESSES": "2"}
    p0 = _run({**env, "VMAP_PROCESS_ID": "0"}, args=(str(tmp_path / "f"),))
    p1 = _run({**env, "VMAP_PROCESS_ID": "1"}, args=(str(tmp_path / "f"),))
    r0, r1 = _results(p0, p1)
    assert r0["n_devices"] == 8 and r1["n_devices"] == 8
    assert r0["losses"] == r1["losses"]
    assert np.isfinite(r0["losses"]).all()
    prim, sec = (r0, r1) if r0["primary"] else (r1, r0)
    assert prim["n_meshes"] > 0 and sec["n_meshes"] == 0
    assert (tmp_path / "f" / "ckpt" / "latest.json").exists()
