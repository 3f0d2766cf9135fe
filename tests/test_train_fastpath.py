"""Round-4 train fast-path wiring: the camera-only coverage probes the
train CLI feeds to pick_fast_path, and the backward-residency VMEM gate
(ADVICE r3: the custom-VJP backward keeps ~3x the forward's footprint
resident, so the eval gate alone is insufficient)."""
import numpy as np
import pytest

from rcmvsnet_tpu.core.io import write_cam_file, write_pair_file
from rcmvsnet_tpu.data.dtu_train import DTUTrainDataset
from rcmvsnet_tpu.data.synthetic import make_synthetic_views
from rcmvsnet_tpu.ops.pallas_warp_train import backward_vmem_bytes


@pytest.fixture()
def train_layout(tmp_path):
    """Minimal DTU-train camera layout (no images needed: sample_cams_all
    and __init__ read only Cameras/)."""
    V = 5
    s = make_synthetic_views(H=64, W=80, V=V, depth0=600.0, seed=7,
                             baseline=6.0)
    cam_dir = tmp_path / "Cameras" / "train"
    cam_dir.mkdir(parents=True)
    for v in range(V):
        write_cam_file(cam_dir / f"{v:08d}_cam.txt",
                       s["extrinsics"][v], s["intrinsics"],
                       [s["depth_min"], 2.5])
    write_pair_file(tmp_path / "Cameras" / "pair.txt",
                    [(v, [u for u in range(V) if u != v]) for v in range(V)])
    return tmp_path, s, V


def test_sample_cams_all_structure(train_layout):
    root, s, V = train_layout
    ds = DTUTrainDataset(root, ["scan1", "scan2"], nviews=4, ndepths=32,
                         interval_scale=1.06)
    cams = ds.sample_cams_all()
    # one probe per unique REF view, regardless of scan/light multiplicity
    assert len(cams) == V
    for ref, cam in enumerate(cams):
        proj = cam["proj_matrices"]["stage1"]
        assert proj.shape == (V, 2, 4, 4)  # ref + ALL its pair sources
        np.testing.assert_allclose(proj[0, 0], s["extrinsics"][ref],
                                   rtol=1e-6)
        # stage pyramid: x2 / x4 on the first two intrinsic rows only
        st2 = cam["proj_matrices"]["stage2"]
        st3 = cam["proj_matrices"]["stage3"]
        np.testing.assert_allclose(st2[:, 1, :2], proj[:, 1, :2] * 2,
                                   rtol=1e-6)
        np.testing.assert_allclose(st3[:, 1, :2], proj[:, 1, :2] * 4,
                                   rtol=1e-6)
        np.testing.assert_allclose(st2[:, 0], proj[:, 0], rtol=1e-6)
        dv = cam["depth_values"]
        assert dv.shape == (32,)
        np.testing.assert_allclose(dv[0], s["depth_min"], rtol=1e-6)
        np.testing.assert_allclose(np.diff(dv), 2.5 * 1.06, rtol=1e-4)
        assert cam["hw"] == (512, 640)


def test_sample_cams_all_matches_getitem_projs(train_layout):
    """The probe's projection pyramid must be byte-identical to what
    __getitem__ hands the model (prefix: getitem takes nviews-1 of the
    same ordered sources)."""
    root, s, V = train_layout
    ds = DTUTrainDataset(root, ["scan1"], nviews=4, ndepths=32)
    cams = {  # ref view -> probe
        int(np.argmax([np.allclose(c["proj_matrices"]["stage1"][0, 0],
                                   s["extrinsics"][r])
                       for r in range(V)])): c for c in ds.sample_cams_all()}
    scan, light, ref, srcs = ds.metas[0]
    probe = cams[ref]["proj_matrices"]["stage1"]
    # compare against the cam-table math __getitem__ uses (images absent,
    # so rebuild its proj rows directly from the cam files)
    from rcmvsnet_tpu.core.io import read_cam_file
    for i, vid in enumerate([ref] + list(srcs)):
        cam = read_cam_file(root / "Cameras" / "train" / f"{vid:08d}_cam.txt")
        np.testing.assert_allclose(probe[i, 0], cam.extrinsics, rtol=1e-7)
        np.testing.assert_allclose(probe[i, 1, :3, :3], cam.intrinsics,
                                   rtol=1e-7)


def test_backward_vmem_gate():
    # reference train config stage 3 (the largest): fits under the clamp
    assert backward_vmem_bytes(4, 512, 640, 8, 2) <= 127 * 1024 * 1024
    # f32 compute costs 2x the src residency and does NOT fit at the
    # stage-3 train shape — the gate must push f32 training onto the XLA
    # warp there (bf16 training keeps the kernel)
    assert backward_vmem_bytes(4, 512, 640, 8, 4) > 127 * 1024 * 1024
    # eval-scale shapes (1600x1184 stage 3) blow past it: the gate must
    # exclude them even though the EVAL per-view gate would pass
    assert backward_vmem_bytes(5, 1184, 1600, 8, 2) > 127 * 1024 * 1024
    # monotone in every extent
    b = backward_vmem_bytes(4, 256, 320, 16, 2)
    assert backward_vmem_bytes(5, 256, 320, 16, 2) > b
    assert backward_vmem_bytes(4, 512, 320, 16, 2) > b
    assert backward_vmem_bytes(4, 256, 640, 16, 2) > b
    assert backward_vmem_bytes(4, 256, 320, 32, 2) > b


def test_cascade_train_gate_excludes_oversized_backward():
    """CascadeMVSNet must NOT hand _DepthStage the train kernel when the
    backward residency exceeds VMEM, even with the eval gate passing."""
    import jax
    import jax.numpy as jnp

    from rcmvsnet_tpu.models import cascade as cas

    captured = []
    orig = cas._DepthStage

    class Spy(orig):
        def __call__(self, *a, **kw):
            captured.append(self.use_pallas_warp_train)
            return super().__call__(*a, **kw)

    model = cas.CascadeMVSNet(
        pallas_warp_max_bytes=1 << 62,  # eval gate passes everywhere
        pallas_warp_train=True, ndepths=(8, 8, 8))
    # huge image -> stage-3 backward residency >> 127 MB
    B, V, H, W = 1, 5, 1184, 1600
    imgs = jnp.zeros((B, V, H, W, 3), jnp.float32)
    proj = np.zeros((B, V, 2, 4, 4), np.float32)
    proj[:, :, 0] = np.eye(4)
    proj[:, :, 1, :3, :3] = np.eye(3)
    projs = {f"stage{k}": jnp.asarray(proj) for k in (1, 2, 3)}
    dv = jnp.linspace(1.0, 2.0, 16)[None]
    cas._DepthStage = Spy
    try:
        jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), imgs, projs, dv,
                               train=True))
    finally:
        cas._DepthStage = orig
    assert captured, "stages never constructed"
    assert captured[-1] is False, (
        "stage-3 train kernel enabled despite oversized backward")
