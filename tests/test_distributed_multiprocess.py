"""Two-process `jax.distributed` bring-up over localhost (the DCN analog).

SURVEY §4.5: multi-host logic must be testable on CPU. This spawns a
coordinator + worker pair (2 CPU devices each -> 4 global), runs
`initialize_distributed` + `host_shard`, and takes one data-parallel
gradient step over the global mesh: each process contributes a distinct
local batch shard, and the psum'd gradient every process reports must
equal the single-process oracle over the concatenated batch — proving
the gradient all-reduce actually crossed process boundaries.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from buckgnn_tpu.parallel.mesh import (
    host_shard, initialize_distributed, make_mesh,
)

topo = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert topo["process_count"] == nproc, topo
assert topo["global_devices"] == 2 * nproc, topo
assert topo["local_devices"] == 2, topo

# per-host ETL sharding: each process builds only its slice
items = list(range(10))
mine = host_shard(items)
assert sorted(mine) == [x for i, x in enumerate(items) if i % nproc == pid]

# one DP gradient step: params replicated, batch sharded over 'data'
# (2 local + 2 remote shards); the mean-loss gradient psums over DCN
mesh = make_mesh()  # all 4 global devices on the data axis
w = jnp.arange(3, dtype=jnp.float32)
local = (np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
         + 100.0 * pid)  # 2 devices x 2 rows, distinct per process
batch = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (8, 3)
)


def loss(w, x):
    return jnp.mean((x @ w) ** 2)


with jax.set_mesh(mesh):
    g = jax.jit(jax.grad(loss),
                out_shardings=NamedSharding(mesh, P()))(w, batch)
g = np.asarray(jax.device_get(g))
print("GRAD", pid, ",".join(f"{v:.6e}" for v in g), flush=True)
"""


@pytest.mark.slow
def test_two_process_dp_gradient_matches_oracle(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # every process must report the SAME gradient = the oracle over the
    # concatenated global batch
    def grad_of(out):
        line = [l for l in out.splitlines() if l.startswith("GRAD")][0]
        return np.array([float(v) for v in line.split()[2].split(",")])

    g0, g1 = grad_of(outs[0]), grad_of(outs[1])
    x = np.concatenate([
        np.arange(12, dtype=np.float32).reshape(4, 3),
        np.arange(12, dtype=np.float32).reshape(4, 3) + 100.0,
    ])
    w = np.arange(3, dtype=np.float32)
    oracle = 2.0 * x.T @ (x @ w) / x.shape[0]
    np.testing.assert_allclose(g0, g1, rtol=1e-6)
    np.testing.assert_allclose(g0, oracle, rtol=1e-4)
