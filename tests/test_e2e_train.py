"""End-to-end: the train CLI on the synthetic dataset over a 2-device
mesh — two steps + validation + checkpointing, then a resume run.

Covers the full driver loop (/root/reference/train_rcmvsnet.py:130-258
semantics): mesh setup, sharded batches, fused train step, metric
logging, per-epoch checkpoint save, and --resume restoring the newest
epoch.
"""
import json
import math
from pathlib import Path


def test_train_cli_synthetic_and_resume(tmp_path):
    from rcmvsnet_tpu.cli import train as train_cli

    logdir = tmp_path / "run"
    args = [
        "--trainpath", "synthetic", "--logdir", str(logdir),
        "--epochs", "1", "--max_steps", "2", "--num_view", "3",
        "--numdepth", "16", "--summary_freq", "1", "--n_devices", "2",
        "--n_rays", "64", "--n_samples", "16",
    ]
    train_cli.main(args)

    # two-artifact checkpoint split for epoch 0 (reference
    # train_rcmvsnet.py:214-226 naming)
    names = sorted(p.name for p in logdir.glob("*.msgpack"))
    assert "model_000000_cas.msgpack" in names, names
    assert "model_000000_nerf.msgpack" in names, names
    recs = [json.loads(line) for line in
            (logdir / "scalars.jsonl").read_text().splitlines()]
    modes = {r["mode"] for r in recs}
    assert "train" in modes and "fulltest" in modes, modes
    losses = [r["loss"] for r in recs if r["mode"] == "train"]
    assert len(losses) == 2 and all(math.isfinite(l) for l in losses)

    # resume: epoch 0 checkpoint found, training continues at epoch 1
    assert args[4] == "--epochs"
    train_cli.main(args[:4] + ["--epochs", "2"] + args[6:] + ["--resume"])
    names2 = sorted(p.name for p in logdir.glob("*.msgpack"))
    assert "model_000001_cas.msgpack" in names2, names2
    recs2 = (logdir / "scalars.jsonl").read_text().splitlines()
    assert len(recs2) > len(recs)
