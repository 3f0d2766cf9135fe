"""Layer-level parity vs torch with shared weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(autouse=True)
def _highest_precision():
    """Pin full-f32 math so parity isn't drowned by the platform's bf16
    default — scoped per-test: a module-level config.update leaks into the
    whole pytest session at collection time and breaks bf16 Pallas kernels
    in other files."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)
import torch
import torch.nn as tnn

from rcmvsnet_tpu.nn.layers import ConvBNAct, DeconvBNAct

RS = np.random.RandomState(11)


def _t2f_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _t2f_conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO


def _t2f_deconv2d(w):
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()  # IOHW -> flipped HWIO


def _t2f_deconv3d(w):
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


@pytest.mark.parametrize("stride,k,p", [(1, 3, 1), (2, 3, 1), (2, 5, 2)])
def test_conv_bn_relu_matches_torch(stride, k, p):
    B, H, W, Ci, Co = 2, 12, 16, 5, 7
    x = RS.randn(B, H, W, Ci).astype(np.float32)

    tconv = tnn.Conv2d(Ci, Co, k, stride=stride, padding=p, bias=False)
    tbn = tnn.BatchNorm2d(Co, momentum=0.1)
    tbn.weight.data = torch.from_numpy(RS.rand(Co).astype(np.float32) + 0.5)
    tbn.bias.data = torch.from_numpy(RS.randn(Co).astype(np.float32))
    tbn.running_mean.data = torch.from_numpy(RS.randn(Co).astype(np.float32))
    tbn.running_var.data = torch.from_numpy(RS.rand(Co).astype(np.float32) + 0.5)
    tbn.eval()

    mod = ConvBNAct(Co, (k, k), (stride, stride), (p, p))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    params = {"Conv_0": {"kernel": jnp.asarray(
        _t2f_conv2d(tconv.weight.detach().numpy()))},
        "TorchBatchNorm_0": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy())}}
    batch_stats = {"TorchBatchNorm_0": {
        "mean": jnp.asarray(tbn.running_mean.numpy()),
        "var": jnp.asarray(tbn.running_var.numpy())}}

    ours = mod.apply({"params": params, "batch_stats": batch_stats},
                     jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = torch.relu(tbn(tconv(torch.from_numpy(x).permute(0, 3, 1, 2))))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_deconv3d_matches_torch_convtranspose():
    B, D, H, W, Ci, Co = 1, 4, 6, 8, 3, 5
    x = RS.randn(B, D, H, W, Ci).astype(np.float32)

    tdeconv = tnn.ConvTranspose3d(Ci, Co, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
    mod = DeconvBNAct(Co, (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1),
                      relu=False, bn=False)
    # bn=False adds a bias param; zero it for comparison
    kernel = jnp.asarray(_t2f_deconv3d(tdeconv.weight.detach().numpy()))
    variables = {"params": {"kernel": kernel, "bias": jnp.zeros((Co,))}}

    ours = mod.apply(variables, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tdeconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    assert ours.shape == ref.shape == (B, 2 * D, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_batchnorm_train_step_updates_running_stats_like_torch():
    B, H, W, C = 4, 6, 6, 3
    x = RS.randn(B, H, W, C).astype(np.float32) * 2 + 1

    mod = ConvBNAct(C, (1, 1), (1, 1), (0, 0), relu=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    eye = np.zeros((1, 1, C, C), np.float32)
    for i in range(C):
        eye[0, 0, i, i] = 1.0
    variables["params"]["Conv_0"]["kernel"] = jnp.asarray(eye)

    out, mutated = mod.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])

    tbn = tnn.BatchNorm2d(C, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)

    stats = mutated["batch_stats"]["TorchBatchNorm_0"]
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-5)
