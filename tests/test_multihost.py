"""Real multi-process distributed training test (SURVEY §4; VERDICT r2 #5).

Spawns 2 OS processes, each with 4 virtual CPU devices, joined by
`jax.distributed.initialize` through a localhost coordinator
(`parallel/multihost.py::initialize_multihost`), and runs ONE production
sharded block train step (parallel/block_parallel.py) on an 8-device
global {data:8} mesh.  Asserts:

  * both workers complete and agree bitwise on the replicated result
    (the params psum really crossed the process boundary);
  * the updated params match the single-process 8-virtual-device run of
    the identical workload (allclose — collective reduction order across
    gloo may differ from the in-process path).

Skips (with the reason) if the CPU backend lacks cross-process
collectives in this jaxlib build.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from multihost_worker import build_workload, run_step_on_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_block_step_matches_single_process(tmp_path):
    port = _free_port()
    env_common = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": str(NPROC),
        "TM_MH_OUT": str(tmp_path),
        # the persistent compile cache is keyed per-topology; harmless
    }
    procs = []
    for pid in range(NPROC):
        env = {**env_common, "JAX_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    joined = "\n---\n".join(outs)
    for bad in ("does not support", "NotImplementedError", "UNIMPLEMENTED",
                "no collectives", "CollectivesInterface"):
        if any(p.returncode != 0 for p in procs) and bad in joined:
            pytest.skip(f"cross-process CPU collectives unsupported: {bad}")
    assert all(p.returncode == 0 for p in procs), joined
    assert all("WORKER_OK" in o for o in outs), joined

    res = [np.load(tmp_path / f"p{i}.npz") for i in range(NPROC)]
    assert bool(res[0]["primary"]) and not bool(res[1]["primary"])
    # replicated outputs identical across processes: the gradient psum is
    # global, not per-process
    keys = [k for k in res[0].files if k.startswith("leaf")]
    assert keys
    for k in keys:
        np.testing.assert_array_equal(res[0][k], res[1][k], err_msg=k)
    np.testing.assert_array_equal(res[0]["loss"], res[1]["loss"])

    # single-process reference on this pytest runner's own 8 virtual devices
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices("cpu"))[:8].reshape(-1), ("data",))
    params_1p, loss_1p = run_step_on_mesh(mesh, build_workload())
    leaves_1p = jax.tree_util.tree_flatten(params_1p)[0]
    assert np.allclose(loss_1p, float(res[0]["loss"]), rtol=1e-5, atol=1e-6)
    assert len(leaves_1p) == len(keys)
    for i, leaf in enumerate(leaves_1p):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf)), res[0][f"leaf{i}"],
            rtol=1e-5, atol=1e-7, err_msg=f"leaf{i}")
