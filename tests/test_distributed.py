"""True multi-process data parallelism: 2 hosts x 4 CPU devices.

Spawns two Python processes that form a jax.distributed cluster over a
local coordinator, stitch DISJOINT per-host batches into global arrays
(parallel/distributed.globalize_batch), run a real sharded train step,
and save an orbax checkpoint from the multi-process global arrays. This
is the closest a single machine gets to the v5e multi-host story
(SURVEY.md section 5.8) — no TPU pod required.

Scope note: the worker deliberately does NOT run a full train_model
epoch. On this 1-core build machine two processes jit-compiling a whole
epoch (train step + eval step + validation sweep) starve the shutdown
barrier and flake the test; the trainer-loop-on-a-mesh path is covered
single-process by tests/test_parallel.py + tests/test_trainer.py, while
everything that is UNIQUE to multi-process — cluster formation,
globalize_batch, cross-process collective all-reduce, checkpoint save
from globally-sharded arrays, clean shutdown — stays here.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.integration]

_WORKER = '''
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
sys.path.insert(0, {repo_root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
# Generous barriers: both workers share ONE core here, so their compile
# phases serialize and they can reach the init/shutdown barriers minutes
# apart (the defaults flaked with "1/2 tasks reached the barrier").
jax.distributed.initialize(coordinator_address=f"localhost:{{port}}",
                           num_processes=2, process_id=pid,
                           initialization_timeout=300,
                           shutdown_timeout_seconds=600)
assert jax.process_count() == 2 and len(jax.devices()) == 8

import optax
from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.parallel.distributed import globalize_batch, host_shard
from birdnet_stm32_tpu.parallel.mesh import make_mesh, replicated
from birdnet_stm32_tpu.parallel.steps import TrainState, make_train_step
from birdnet_stm32_tpu.training.losses import make_loss_fn

mesh = make_mesh()
shard, n_shards = host_shard()
assert n_shards == 2

# globalize_batch correctness: disjoint per-host constants; the global sum
# proves each host's rows are counted exactly once.
probe = globalize_batch({{"x": np.full((8, 4), shard, np.float32)}}, mesh)
from jax.sharding import NamedSharding, PartitionSpec as P
tot = jax.jit(lambda t: t["x"].sum(),
              in_shardings=({{"x": NamedSharding(mesh, P("data"))}},),
              out_shardings=NamedSharding(mesh, P()))(probe)
assert float(tot) == 8 * 4 * 1.0, float(tot)

# Real sharded train step over the 2-process mesh: per-host halves of a
# deterministic global batch; the replicated params must update
# identically on both processes.
cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                  fft_length=128, chunk_duration=1.0, embeddings_size=32,
                  num_classes=2, class_names=["a", "b"],
                  audio_frontend="librosa", mag_scale="none", alpha=0.25)
model = build_dscnn(cfg, class_activation="none")
variables = init_model(model, cfg, jax.random.key(0))
tx = optax.adam(1e-3)
state = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
step = make_train_step(model, tx, make_loss_fn(), mesh=mesh,
                       frontend_trainable=cfg.frontend_trainable)

rng = np.random.default_rng(0)  # same seed on both hosts -> same global batch
B_global = 16
x_all = rng.uniform(0, 1, (B_global, *cfg.input_shape())).astype(np.float32)
y_all = np.eye(2, dtype=np.float32)[rng.integers(0, 2, B_global)]
half = B_global // 2
x, y = globalize_batch(
    (x_all[shard * half:(shard + 1) * half], y_all[shard * half:(shard + 1) * half]),
    mesh)
leaf_before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[:3].copy()
state, metrics = step(state, x, y, jax.random.key(1))
state, metrics = step(state, x, y, jax.random.key(2))
loss = float(metrics["loss"])
assert np.isfinite(loss)
leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[:3]
assert not np.allclose(leaf, leaf_before), "optimizer did not update params"

# Checkpoint save FROM multi-process global arrays: device_get on the
# replicated state must assemble host-local values on every process, and
# the orbax write is a COLLECTIVE — every process calls save on the SAME
# directory (orbax coordinates the shard writes and only the primary
# finalizes; per-process directories would never be finalized).
from birdnet_stm32_tpu.training.checkpoint import save_checkpoint
run_dir = {run_dir!r}
variables_out = {{"params": jax.device_get(state.params)}}
bs = getattr(state, "batch_stats", None)
if bs:
    variables_out["batch_stats"] = jax.device_get(bs)
save_checkpoint(run_dir, variables_out, cfg)
assert os.path.exists(os.path.join(run_dir, "best")), "orbax save missing"

print(f"RESULT pid={{pid}} loss={{loss:.6f}} leaf={{leaf[0]:.6f}},{{leaf[1]:.6f}},{{leaf[2]:.6f}}")
jax.distributed.shutdown()
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train_step(tmp_path):
    repo_root = str(Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo_root=repo_root,
                                     run_dir=str(tmp_path / "run")))
    port = _free_port()

    procs = [subprocess.Popen([sys.executable, str(worker), str(pid), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert line, out[-2000:]
        results.append(line[0].split(" ", 1)[1])
    # Same global batch + replicated params: loss and updated weights must
    # be IDENTICAL on both processes (the all-reduce really synchronized).
    assert results[0].split("loss=")[1] == results[1].split("loss=")[1], results
