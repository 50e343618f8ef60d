"""PyTorch-reference weight bridge: numerical parity at fp32 tolerance.

Builds a torch twin of the architecture contract (conv3x3/1x1 + BN +
ReLU VGG stack and heads, reference VGG_Backbone.py:40-70, heads.py) in
reference state-dict naming, imports its weights through
tools/import_torch_weights, and checks the flax forward reproduces the
torch forward on the same image — the parity measurement BASELINE.md's
"HPatches repeatability parity (fp32 tolerance)" target rests on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from spnerf_tpu.models.superpoint import (
    SuperPointConfig,
    init_superpoint,
    superpoint_inference,
)
from spnerf_tpu.tools.import_torch_weights import (
    import_into,
    torch_state_dict_to_flax,
)

# >=10s on the 1-core CPU host (r4 timing run); excluded from the
# quick pre-commit tier: pytest -m "not slow"
pytestmark = pytest.mark.slow

CN = (8, 8, 12, 12, 16, 16, 16, 16)  # tiny vgg for test speed
DET = (16, 24)
DESC = (16, 24)


def _torch_block(cin, cout, k=3):
    conv = torch.nn.Conv2d(cin, cout, k, padding=k // 2)
    bn = torch.nn.BatchNorm2d(cout)
    # randomize BN to make folding bugs visible
    with torch.no_grad():
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.5, 0.5)
        bn.running_mean.uniform_(-0.3, 0.3)
        bn.running_var.uniform_(0.5, 2.0)
    return conv, bn


class TorchTwin(torch.nn.Module):
    """Reference-naming torch model (own implementation of the
    documented contract; not reference code)."""

    def __init__(self):
        super().__init__()
        dims = (1,) + CN
        backbone = torch.nn.Module()
        for i in range(8):
            conv, bn = _torch_block(dims[i], dims[i + 1])
            blk = torch.nn.Module()
            blk.conv2d, blk.norm = conv, bn
            setattr(backbone, f"block_{i + 1}", blk)
        self.backbone = backbone
        det = torch.nn.Module()
        for name, (cin, cout), k in (("convPa", DET, 3),
                                     ("convPb", (DET[1], 65), 1)):
            conv, bn = _torch_block(cin, cout, k)
            blk = torch.nn.Module()
            blk.conv2d, blk.norm = conv, bn
            setattr(det, name, blk)
        self.detector_head = det
        desc = torch.nn.Module()
        for name, (cin, cout), k in (("convDa", DESC, 3),
                                     ("convDb", (DESC[1], DESC[1]), 1)):
            conv, bn = _torch_block(cin, cout, k)
            blk = torch.nn.Module()
            blk.conv2d, blk.norm = conv, bn
            setattr(desc, name, blk)
        self.descriptor_head = desc

    def forward(self, x):
        relu = torch.nn.functional.relu
        pool = torch.nn.functional.max_pool2d
        for i in range(1, 9):
            blk = getattr(self.backbone, f"block_{i}")
            x = relu(blk.norm(blk.conv2d(x)))
            if i in (2, 4, 6):
                x = pool(x, 2)
        pa = self.detector_head.convPa
        pb = self.detector_head.convPb
        logits = pb.norm(pb.conv2d(relu(pa.norm(pa.conv2d(x)))))
        da = self.descriptor_head.convDa
        db = self.descriptor_head.convDb
        desc_raw = db.norm(db.conv2d(relu(da.norm(da.conv2d(x)))))
        return logits, desc_raw


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    m = TorchTwin().eval()
    return m


def _flax_from_twin(twin):
    cfg = SuperPointConfig(model_name="superpoint", vgg_cn=CN,
                           detector_dim=DET, descriptor_dim=DESC)
    model, variables = init_superpoint(jax.random.PRNGKey(0), cfg,
                                       (1, 32, 40, 1))
    converted = torch_state_dict_to_flax(twin.state_dict())
    merged = import_into(variables, converted)
    return cfg, model, merged


def test_forward_parity(twin):
    cfg, model, variables = _flax_from_twin(twin)
    rng = np.random.default_rng(0)
    img = rng.random((2, 32, 40, 1), np.float32)
    with torch.no_grad():
        t_logits, t_desc = twin(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = model.apply(variables, jnp.asarray(img), train=False)
    np.testing.assert_allclose(
        np.asarray(out["logits"]),
        t_logits.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["desc_raw"]),
        t_desc.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_decoded_outputs_parity(twin):
    """prob heatmap + upsampled/normalized descriptors match the torch
    decode (softmax/pixel_shuffle, bicubic interpolate + L2)."""
    cfg, model, variables = _flax_from_twin(twin)
    rng = np.random.default_rng(1)
    img = rng.random((1, 32, 40, 1), np.float32)
    with torch.no_grad():
        t_logits, t_desc_raw = twin(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        t_prob = torch.softmax(t_logits, dim=1)[:, :-1]
        t_prob = torch.nn.functional.pixel_shuffle(t_prob, 8).squeeze(1)
        t_desc = torch.nn.functional.interpolate(
            t_desc_raw, scale_factor=8, mode="bicubic", align_corners=False)
        t_desc = torch.nn.functional.normalize(t_desc, p=2, dim=1)
    out = superpoint_inference(model, variables, jnp.asarray(img),
                               with_nms=False)
    np.testing.assert_allclose(np.asarray(out["prob_heatmap"]),
                               t_prob.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["desc"]),
        t_desc.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


def test_partial_merge_magicpoint_seeds_superpoint(twin):
    """A MagicPoint-only state dict (no descriptor head) merges into a
    SuperPoint model, leaving descriptor params at init — the
    engine.py:86-90 bootstrap semantics."""
    sd = {k: v for k, v in twin.state_dict().items()
          if not k.startswith("descriptor_head")}
    cfg = SuperPointConfig(model_name="superpoint", vgg_cn=CN,
                           detector_dim=DET, descriptor_dim=DESC)
    _, variables = init_superpoint(jax.random.PRNGKey(0), cfg, (1, 32, 40, 1))
    before = np.asarray(
        variables["params"]["descriptor"]["convDa"]["Conv_0"]["kernel"])
    merged = import_into(variables, torch_state_dict_to_flax(sd))
    after = np.asarray(
        merged["params"]["descriptor"]["convDa"]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(before, after)  # untouched
    got = np.asarray(
        merged["params"]["backbone"]["block1"]["Conv_0"]["kernel"])
    want = twin.backbone.block_1.conv2d.weight.detach().numpy()
    np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0))


def test_roundtrip_through_pth(tmp_path, twin):
    from spnerf_tpu.tools.import_torch_weights import load_torch_checkpoint

    p = tmp_path / "ref.pth"
    torch.save({"iteration": 7, "model_state_dict": twin.state_dict()}, p)
    variables = load_torch_checkpoint(p)
    k = np.asarray(variables["params"]["backbone"]["block3"]["Conv_0"]["kernel"])
    assert k.shape == (3, 3, CN[1], CN[2])
    m = np.asarray(
        variables["batch_stats"]["detector"]["convPb"]["BatchNorm_0"]["mean"])
    assert m.shape == (65,)
