"""Multi-process distributed execution: 2 processes x 4 virtual CPU
devices running the sharded MSM over ONE global 8-device mesh.

This is the SURVEY §4 "multi-node without a cluster" prescription
(jax.distributed over the CPU backend) — the execution path that maps to
multi-host TPU pods (DCN process groups + ICI in-slice collectives)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
import numpy as np
sys.path.insert(0, os.environ["CTT_REPO"])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
# /root/.axon_site sitecustomize may pre-select the axon TPU platform;
# override at runtime like tests/conftest.py does
jax.config.update("jax_platforms", "cpu")
from constantine_tpu.parallel.mesh import init_distributed, make_mesh, DATA_AXIS
assert init_distributed()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.parallel.msm_sharded import msm_sharded
from constantine_tpu.utils import refmath as rm

ctx = get_curve("BLS12_381")
mesh = make_mesh()
n = 32
rng = np.random.default_rng(2)
ks = [int(k) for k in rng.integers(1, 200, size=n)]
pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
px_h = np.asarray(ctx.fp.encode([p[0] for p in pts]))
py_h = np.asarray(ctx.fp.encode([p[1] for p in pts]))
sc_h = np.asarray(ctx.scalars_to_limbs(
    [int(s) for s in rng.integers(1, 2**16, size=n)]))

sh = NamedSharding(mesh, P(DATA_AXIS))
def glob(arr):
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])
px, py, sc = glob(px_h), glob(py_h), glob(sc_h)
out = msm_sharded(ctx.g1, mesh, (px, py), sc, scalar_bits=16)
# replicated output: every process's local shard is the full value
vals = [np.asarray(t.addressable_data(0)) for t in out]
(ax, ay), inf = ctx.g1.to_affine(tuple(jnp.asarray(v)[None] for v in vals))
gx = int(ctx.fp.decode(np.asarray(ax))[0])
gy = int(ctx.fp.decode(np.asarray(ay))[0])
print(json.dumps({"x": gx, "y": gy, "pid": int(os.environ["CTT_PROCESS_ID"])}),
      flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_msm(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "CTT_REPO": os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            "CTT_COORDINATOR": f"127.0.0.1:{port}",
            "CTT_NUM_PROCESSES": "2",
            "CTT_PROCESS_ID": str(pid),
            # force the CPU backend at the env level: the parent session
            # may carry an accelerator plugin (axon TPU) that otherwise
            # wins platform selection inside the worker
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multi-process worker timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes agree
    assert outs[0]["x"] == outs[1]["x"] and outs[0]["y"] == outs[1]["y"]

    # host-integer reference
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.utils import refmath as rm
    ctx = get_curve("BLS12_381")
    rng = np.random.default_rng(2)
    n = 32
    ks = [int(k) for k in rng.integers(1, 200, size=n)]
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    scalars = [int(s) for s in rng.integers(1, 2**16, size=n)]
    acc = None
    for s_, pt in zip(scalars, pts):
        q = rm.ec_mul(s_, pt, 0, ctx.p)
        acc = q if acc is None else rm.ec_add(acc, q, 0, ctx.p)
    assert outs[0]["x"] == acc[0] and outs[0]["y"] == acc[1]
