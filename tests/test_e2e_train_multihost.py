"""End-to-end: the train CLI run as TWO jax.distributed processes
(--coordinator_address/--num_processes/--process_id) on the synthetic
dataset — the multi-node analogue of the reference's mp.spawn + DDP launch
(train_rcmvsnet.py:502-606, 632-636).

Each process owns 4 virtual CPU devices; the CLI builds the global
8-device mesh, each process loads its DistributedSampler-style shard,
gradients/BN stats reduce across processes (Gloo here, DCN on a pod), and
only process 0 writes checkpoints and scalars.
"""
import json
import math
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_train_cli_two_processes(tmp_path):
    logdir = tmp_path / "run"
    port = _free_port()
    procs = []
    cli_args = ["--trainpath", "synthetic", "--logdir", str(logdir),
                "--epochs", "1", "--max_steps", "1", "--num_view", "3",
                "--numdepth", "16", "--summary_freq", "1",
                "--n_rays", "64", "--n_samples", "16",
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2"]
    # bootstrap through jax.config.update: this host's sitecustomize
    # re-asserts JAX_PLATFORMS onto the TPU platform inside the child, so
    # the env var alone can't pin the virtual CPU devices (same reason
    # tests/conftest.py does both)
    boot = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from rcmvsnet_tpu.cli.train import main; import sys; "
            "main(sys.argv[1:])")
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, "-c", boot] + cli_args
            + ["--process_id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd="/root/repo"))
    outs = []
    for p in procs:
        try:
            outs.append((p.communicate(timeout=900), p.returncode))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for (out, err), rc in outs:
        assert rc == 0, f"rank failed (rc={rc}):\n{err[-2000:]}"

    # rank 0 wrote the two-artifact checkpoint and scalars; rank 1 didn't
    names = sorted(p.name for p in logdir.glob("*.msgpack"))
    assert "model_000000_cas.msgpack" in names, names
    assert "model_000000_nerf.msgpack" in names, names
    recs = [json.loads(line) for line in
            (logdir / "scalars.jsonl").read_text().splitlines()]
    losses = [r["loss"] for r in recs if r["mode"] == "train"]
    assert losses and all(math.isfinite(l) for l in losses)
    # the mesh banner shows the distributed topology, printed by rank 0 only
    r0_out = outs[0][0][0]
    r1_out = outs[1][0][0]
    assert "8 devices / 2 process(es)" in r0_out
    assert "8 devices" not in r1_out
