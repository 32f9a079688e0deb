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


FRAMEWORK_WORKER = r"""
import os, sys
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from buckgnn_tpu.config import TrainConfig
from buckgnn_tpu.graph.batch import batch_iterator
from buckgnn_tpu.graph.normalizer import normalize_dataset
from buckgnn_tpu.graph.synthetic import generate_dataset
from buckgnn_tpu.parallel.dp import make_parallel_train_step, stack_batches
from buckgnn_tpu.parallel.mesh import initialize_distributed, make_mesh
from buckgnn_tpu.train.losses import get_loss_function
from buckgnn_tpu.train.trainer import build_model, init_state, make_optimizer

topo = initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
assert topo["global_devices"] == 2 * nproc, topo

# deterministic shared dataset/pack: every process derives the same four
# batches, then contributes ONLY its two as process-local shards
ds = generate_dataset(8, seed=42, min_side=3, max_side=4)
normed, nz = normalize_dataset(ds)
cfg = TrainConfig(hidden_channels=16, num_layers=2, batch_size=2,
                  dropout_rate=0.0, lr=1e-3, segment_impl="xla")
batches = list(batch_iterator(normed, 2, 64, 512))[:4]
assert len(batches) == 4, len(batches)

mesh = make_mesh()  # 4 global devices on 'data'
model = build_model(cfg, normed[0].x.shape[1], 5)
opt = make_optimizer(cfg)
state = init_state(model, opt, batches[0])  # same seed -> same params

repl = NamedSharding(mesh, P())


def globalize_repl(tree):
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x), np.shape(x)), tree)


sh = NamedSharding(mesh, P("data"))
local = stack_batches(batches[2 * pid: 2 * pid + 2])


def globalize_batch(x):
    x = np.asarray(x)
    return jax.make_array_from_process_local_data(sh, x,
                                                  (4,) + x.shape[1:])


import dataclasses as dc
state = dc.replace(state,
                   params=globalize_repl(state.params),
                   batch_stats=globalize_repl(state.batch_stats),
                   opt_state=globalize_repl(state.opt_state))
stacked = jax.tree.map(globalize_batch, local)

criterion = get_loss_function(cfg.loss_function)
step = make_parallel_train_step(model, opt, criterion, cfg, nz, mesh)
with jax.set_mesh(mesh):
    new_state, metrics = step(state, stacked, jax.random.key(0),
                              jnp.float32(cfg.lr))
loss = float(jax.device_get(metrics["loss"]))
leaves = jax.tree.leaves(new_state.params)
fp = float(sum(float(jnp.sum(jnp.square(l))) for l in leaves))
print(f"RESULT {pid} {loss:.8e} {fp:.8e}", flush=True)
"""


@pytest.mark.slow
def test_two_process_framework_dp_step_matches_oracle(tmp_path):
    """VERDICT r3 weak #5: the REAL framework step (GraphBatch packing +
    make_parallel_train_step) crosses the two-process DCN analog — each
    process packs its own shard, and the post-step loss AND updated-param
    fingerprint both match the single-process 4-device oracle bit-for-bit
    in f32 tolerance."""
    script = tmp_path / "fw_worker.py"
    script.write_text(FRAMEWORK_WORKER)
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
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    def result_of(out):
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        _, _, loss, fp = line.split()
        return float(loss), float(fp)

    (l0, f0), (l1, f1) = result_of(outs[0]), result_of(outs[1])
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert f0 == pytest.approx(f1, rel=1e-6)

    # single-process oracle: same batches, same init, 4 local devices
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from buckgnn_tpu.config import TrainConfig
    from buckgnn_tpu.graph.batch import batch_iterator
    from buckgnn_tpu.graph.normalizer import normalize_dataset
    from buckgnn_tpu.graph.synthetic import generate_dataset
    from buckgnn_tpu.parallel.dp import (
        make_parallel_train_step,
        shard_stacked_batch,
        stack_batches,
    )
    from buckgnn_tpu.parallel.mesh import make_mesh
    from buckgnn_tpu.train.losses import get_loss_function
    from buckgnn_tpu.train.trainer import (
        build_model,
        init_state,
        make_optimizer,
    )

    ds = generate_dataset(8, seed=42, min_side=3, max_side=4)
    normed, nz = normalize_dataset(ds)
    cfg = TrainConfig(hidden_channels=16, num_layers=2, batch_size=2,
                      dropout_rate=0.0, lr=1e-3, segment_impl="xla")
    batches = list(batch_iterator(normed, 2, 64, 512))[:4]
    mesh = make_mesh(n_data=4, n_model=1)
    model = build_model(cfg, normed[0].x.shape[1], 5)
    opt = make_optimizer(cfg)
    state = init_state(model, opt, batches[0])
    criterion = get_loss_function(cfg.loss_function)
    step = make_parallel_train_step(model, opt, criterion, cfg, nz, mesh)
    with jax.set_mesh(mesh):
        stacked = shard_stacked_batch(stack_batches(batches), mesh)
        new_state, metrics = step(state, stacked, jax.random.key(0),
                                  jnp.float32(cfg.lr))
    oracle_loss = float(metrics["loss"])
    oracle_fp = float(sum(float(jnp.sum(jnp.square(l)))
                          for l in jax.tree.leaves(new_state.params)))
    assert l0 == pytest.approx(oracle_loss, rel=1e-5)
    assert f0 == pytest.approx(oracle_fp, rel=1e-5)


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
