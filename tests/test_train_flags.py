"""Train-CLI flag parity: the reference's reachable training knobs
(train_rcmvsnet.py:27-123) map onto the typed config tree."""
from rcmvsnet_tpu.cli.train import config_from_args, parse_args


def test_defaults_match_reference():
    c = config_from_args(parse_args(["--trainpath", "x"]))
    assert c.run.lr_milestone_epochs == (10, 12, 14)
    assert c.run.lr_gamma == 0.5          # "10,12,14:2" → ×1/2
    assert c.run.weight_decay == 0.0
    assert c.run.save_freq == 1 and c.run.eval_freq == 1
    assert c.backbone.grad_detach is True
    assert c.render.net_type == "v0"
    assert c.backbone.ndepths == (48, 32, 8)
    assert c.loss.dlossw == (0.5, 1.0, 2.0)


def test_overrides():
    c = config_from_args(parse_args(
        ["--trainpath", "x", "--lrepochs", "2,4:4", "--wd", "1e-4",
         "--save_freq", "2", "--eval_freq", "3",
         "--grad_method", "undetach", "--net_type", "v2"]))
    assert c.run.lr_milestone_epochs == (2, 4)
    assert c.run.lr_gamma == 0.25
    assert c.run.weight_decay == 1e-4
    assert c.run.save_freq == 2 and c.run.eval_freq == 3
    assert c.backbone.grad_detach is False
    assert c.render.net_type == "v2"
