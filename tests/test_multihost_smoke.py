"""Two-process ``jax.distributed`` smoke test (VERDICT r2 missing #5).

Launches two REAL processes that each call ``jax.distributed.initialize``
against a shared coordinator, build the multihost ("data" across hosts x
"db" within a host) mesh via :func:`dirjax.parallel.make_multihost_mesh`,
and run a psum over it — proving the multihost mesh path executes under a
multi-process JAX runtime, not just the single-process fake-device layout
tests. CPU-only; each process gets 2 virtual XLA devices.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

# the env var alone does not override the sandbox's pre-registered TPU
# platform plugin (see CLAUDE.md) — force CPU before backend init
jax.config.update("jax_platforms", "cpu")

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, {repo!r})
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from dirjax.parallel.mesh import make_multihost_mesh

mesh = make_multihost_mesh()
assert mesh.shape["data"] == 2, mesh.shape       # one row per process
assert mesh.shape["db"] == 2, mesh.shape         # local devices per row
rows = [set(d.process_index for d in row) for row in mesh.devices]
assert all(len(r) == 1 for r in rows), "a mesh row straddles processes"

# run a global computation over the mesh: every process contributes its
# local shard, the reduction must see all 4 devices' values
sharding = NamedSharding(mesh, P("data", "db"))
arr = jax.make_array_from_callback(
    (4, 2), sharding,
    lambda idx: np.arange(8, dtype=np.float32).reshape(4, 2)[idx])
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(arr)
# jnp.sum over the fully-sharded array -> GSPMD inserts the cross-process
# all-reduce; every process must see the global 0+1+...+7
assert float(total) == 28.0, float(total)
print(f"proc {pid} OK", flush=True)
"""


def test_two_process_distributed_mesh(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _WORKER.replace("{repo!r}", repr(repo))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = []
    for pid in range(2):
        p = subprocess.Popen([sys.executable, "-c", script, coord, str(pid)],
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             env=env, text=True)
        procs.append(p)
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out, out
