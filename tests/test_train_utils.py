"""Schedule parity vs torch's WarmupMultiStepLR, loader semantics,
checkpoint roundtrip."""
import numpy as np
import jax
import jax.numpy as jnp

from rcmvsnet_tpu.train.schedule import warmup_multistep_schedule


def test_warmup_multistep_matches_torch():
    import torch
    from bisect import bisect_right

    base_lr, milestones, gamma = 1e-4, [100, 200, 300], 0.5
    wf, wi = 1.0 / 3, 50
    sched = warmup_multistep_schedule(base_lr, milestones, gamma, wf, wi)

    # literal reimplementation of utils.py:245-260 get_lr
    def torch_lr(step):
        warmup = 1.0
        if step < wi:
            alpha = step / wi
            warmup = wf * (1 - alpha) + alpha
        return base_lr * warmup * gamma ** bisect_right(milestones, step)

    for step in [0, 1, 25, 49, 50, 51, 99, 100, 101, 199, 200, 250, 299,
                 300, 500]:
        np.testing.assert_allclose(float(sched(step)), torch_lr(step),
                                   rtol=1e-6, err_msg=f"step {step}")


def test_loader_batching_and_sharding():
    from rcmvsnet_tpu.data.loader import DataLoader, epoch_indices

    class DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32), "name": f"s{i}"}

    loader = DataLoader(DS(), batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 5  # drop_last
    assert batches[0]["x"].shape == (4, 2)
    assert isinstance(batches[0]["name"], list)

    # shuffled differently per epoch, deterministic per seed
    a = epoch_indices(23, 0, True, 0)
    b = epoch_indices(23, 1, True, 0)
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, epoch_indices(23, 0, True, 0))

    # process shards partition the index set
    shards = [epoch_indices(24, 0, True, 0, p, 4) for p in range(4)]
    allidx = np.concatenate(shards)
    assert len(allidx) == 24
    assert set(allidx.tolist()) == set(range(24))


def test_loader_equal_shards_when_indivisible():
    """n % process_count != 0 must still give every process the SAME
    number of samples AND batches: an extra batch on one rank would issue
    collectives with no peer and deadlock a multi-process run.
    drop_last drops the tail; otherwise the wrap-pad grows it."""
    from rcmvsnet_tpu.data.loader import DataLoader, epoch_indices

    for n, p in [(23, 2), (23, 4), (25, 4), (27097, 2)]:
        dropped = [epoch_indices(n, 0, True, 0, pi, p, drop_last=True)
                   for pi in range(p)]
        assert len({len(s) for s in dropped}) == 1, (n, p)
        assert len(dropped[0]) == n // p
        padded = [epoch_indices(n, 0, True, 0, pi, p, drop_last=False)
                  for pi in range(p)]
        assert len({len(s) for s in padded}) == 1, (n, p)
        assert len(padded[0]) == -(-n // p)

    class DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32)}

    for drop_last in (True, False):
        counts = set()
        for pi in range(2):
            loader = DataLoader(DS(23), batch_size=4, shuffle=True, seed=0,
                                drop_last=drop_last,
                                process_index=pi, process_count=2)
            nb = len(list(loader))
            assert nb == len(loader), (drop_last, pi)
            counts.add(nb)
        assert len(counts) == 1, (drop_last, counts)

    # wrap-pad must TILE when pad > n (torch DistributedSampler semantics):
    # n=1, p=4 would otherwise give two processes zero samples
    shards = [epoch_indices(1, 0, False, 0, pi, 4, drop_last=False)
              for pi in range(4)]
    assert [len(s) for s in shards] == [1, 1, 1, 1]


def test_loader_worker_errors_propagate_and_early_break_cancels():
    import threading
    import time

    from rcmvsnet_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 3:
                raise ValueError("corrupt sample")
            return {"x": np.zeros((2,), np.float32)}

    loader = DataLoader(Bad(), batch_size=1, shuffle=False, prefetch=1)
    with np.testing.assert_raises(RuntimeError):
        list(loader)  # must NOT silently truncate the epoch at sample 3

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((2,), np.float32)}

    before = threading.active_count()
    for _ in range(4):
        it = iter(DataLoader(Slow(), batch_size=1, prefetch=1))
        next(it)
        it.close()  # abandon mid-epoch: the worker must not block forever
    time.sleep(1.5)
    assert threading.active_count() <= before + 1, (
        "abandoned prefetch workers did not exit")


def test_checkpoint_roundtrip(tmp_path):
    import flax.struct
    from rcmvsnet_tpu.train.checkpoint import (latest_epoch,
                                               restore_checkpoint,
                                               save_checkpoint)

    class S(flax.struct.PyTreeNode):
        step: jnp.ndarray
        params: dict
        batch_stats: dict
        opt_state: tuple

    rs = np.random.RandomState(0)
    state = S(jnp.asarray(42),
              {"cascade": {"w": jnp.asarray(rs.randn(3, 4), jnp.float32)},
               "render": {"v": jnp.asarray(rs.randn(2), jnp.float32)}},
              {"cascade": {"m": jnp.zeros(4)}, "render": {}},
              (jnp.asarray(1.0),))
    save_checkpoint(tmp_path, state, epoch=3)
    save_checkpoint(tmp_path, state, epoch=5)
    assert latest_epoch(tmp_path) == 5

    zero = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, start = restore_checkpoint(tmp_path, zero)
    assert start == 6
    assert int(restored.step) == 42
    np.testing.assert_array_equal(np.asarray(restored.params["cascade"]["w"]),
                                  np.asarray(state.params["cascade"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored.params["render"]["v"]),
                                  np.asarray(state.params["render"]["v"]))


def test_adjust_w_aug_schedule():
    from rcmvsnet_tpu.losses.aug import adjust_w_aug
    # matches train_rcmvsnet.py:379-394
    assert adjust_w_aug(0, 0.01) == 0.01
    assert adjust_w_aug(1, 0.01) == 0.02
    assert adjust_w_aug(3, 0.01) == 0.04
    assert adjust_w_aug(5, 0.01) == 0.08
    assert adjust_w_aug(7, 0.01) == 0.16
    assert adjust_w_aug(9, 0.01) == 0.32
    assert adjust_w_aug(14, 0.01) == 0.32


def test_metric_logger_image_summaries(tmp_path):
    """log_images writes per-image min-max-normalized summaries (PNG
    fallback always; TB when available) — reference utils.py:83-100."""
    import numpy as np
    from rcmvsnet_tpu.train.logging import MetricLogger

    logger = MetricLogger(tmp_path)
    rs = np.random.RandomState(0)
    logger.log_images("train", {
        "depth_est": rs.rand(2, 16, 20) * 900,      # [B, H, W]
        "ref_img": rs.rand(2, 16, 20, 3),           # [B, H, W, 3]
    }, step=10)
    logger.close()
    assert (tmp_path / "images" / "train_depth_est_00000010.png").exists()
    assert (tmp_path / "images" / "train_ref_img_00000010.png").exists()
    import cv2
    img = cv2.imread(str(tmp_path / "images" / "train_depth_est_00000010.png"))
    assert img.min() == 0 and img.max() == 255  # min-max normalized
