"""Generate golden fixtures by executing the REFERENCE torch nets on CPU.

VERDICT r2 item 6: pin the flow/LPIPS stacks end-to-end (converter +
architecture + composition), not just layer-by-layer. This script runs
ONCE (its outputs are committed under tests/fixtures/):

  * PWC-Net: loads the reference architecture
    (/root/reference/flow3d/models/pwcnet.py) with its CuPy CUDA
    correlation replaced by a CPU-torch implementation of the same kernel
    semantics (k = (dy+4)*9 + (dx+4), sum/channels —
    correlation.py:69-100), fills it with manifest-seeded weights
    (tests/golden_utils.build_seeded_state_dict), and records the flow +
    flow-aligned warp + AlignedLoss value for a fixed 64x64 pair.
  * LPIPS: runs the vendored richzhang package
    (/root/reference/models/networks_basic.py PNetLin, alex backbone)
    with the same seeded backbone weights + the REFERENCE's shipped lin
    weights (models/weights/v0.1/alex.pth) and records the score.

tests/test_golden_fixtures.py rebuilds the same weights from the
committed manifests and asserts our JAX stacks reproduce the recorded
outputs at 1e-4.
"""

import json
import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from golden_utils import FIXTURE_DIR, build_seeded_state_dict  # noqa: E402


def cpu_correlation(tenFirst=None, tenSecond=None):
    """Pure-torch port of the CUDA cost volume (correlation.py:35-103):
    81 channels, k = (dy+4)*9 + (dx+4), normalized by channel count."""
    B, C, H, W = tenFirst.shape
    pad = torch.nn.functional.pad(tenSecond, (4, 4, 4, 4))
    outs = []
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            shifted = pad[:, :, 4 + dy : 4 + dy + H, 4 + dx : 4 + dx + W]
            outs.append((tenFirst * shifted).mean(1, keepdim=True))
    return torch.cat(outs, 1)


def load_reference_pwcnet_module():
    """Import the reference pwcnet.py with a stub correlation package."""
    chain = [
        "flow3d",
        "flow3d.models",
        "flow3d.models.external",
        "flow3d.models.external.pwcnet",
        "flow3d.models.external.pwcnet.correlation",
    ]
    for name in chain:
        sys.modules.setdefault(name, types.ModuleType(name))
    corr = types.ModuleType("flow3d.models.external.pwcnet.correlation.correlation")
    corr.FunctionCorrelation = lambda tenFirst, tenSecond: cpu_correlation(
        tenFirst=tenFirst, tenSecond=tenSecond
    )
    sys.modules[corr.__name__] = corr
    sys.modules["flow3d.models.external.pwcnet.correlation"].correlation = corr

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pwcnet", os.path.join(REF, "flow3d", "models", "pwcnet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_pwcnet_fixture():
    mod = load_reference_pwcnet_module()
    net = mod.PWCNet(load_pretrained=False)
    sd_ref = net.net.state_dict()
    manifest = [[k, list(v.shape)] for k, v in sd_ref.items()]
    sd = build_seeded_state_dict(manifest, seed=42)
    net.net.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    net.eval()

    rng = np.random.default_rng(0)
    H, W = 64, 64
    # smooth-ish images: random low-frequency pattern + noise
    def img():
        base = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
        up = torch.nn.functional.interpolate(
            torch.from_numpy(base.transpose(2, 0, 1))[None], size=(H, W),
            mode="bilinear", align_corners=False,
        )[0].numpy().transpose(1, 2, 0)
        return np.clip(
            up + 0.05 * rng.normal(size=(H, W, 3)).astype(np.float32), 0, 1
        ).astype(np.float32)

    a, b = img(), img()
    ta = torch.from_numpy(a.transpose(2, 0, 1))[None]
    tb = torch.from_numpy(b.transpose(2, 0, 1))[None]
    with torch.no_grad():
        flow = net(ta, tb)  # (1, 2, H, W)
        aligned, fmask = mod.get_backwarp(ta, flow)
        l_rec = torch.nn.L1Loss()(aligned * fmask, tb * fmask)

    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "pwcnet_golden.npz"),
        a=a, b=b,
        flow=flow[0].numpy().transpose(1, 2, 0),
        aligned=aligned[0].numpy().transpose(1, 2, 0),
        fmask=fmask[0].numpy().transpose(1, 2, 0),
        l_rec=np.float32(l_rec.item()),
    )
    with open(os.path.join(FIXTURE_DIR, "pwcnet_manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(f"pwcnet fixture: flow range "
          f"[{flow.min().item():.4f}, {flow.max().item():.4f}], "
          f"l_rec={l_rec.item():.6f}")


def make_lpips_fixture():
    # import networks_basic without executing the package __init__ (it
    # pulls skimage, absent here): synthesize a package with __path__
    import importlib

    # networks_basic imports skimage.color at module scope but PNetLin's
    # tensor forward never touches it — stub it out
    sk = types.ModuleType("skimage")
    sk.color = types.ModuleType("skimage.color")
    sk.measure = types.ModuleType("skimage.measure")
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.color", sk.color)
    sys.modules.setdefault("skimage.measure", sk.measure)

    # torchvision is absent; the vendored pretrained_networks only slices
    # tv.alexnet(pretrained=False).features — provide the standard AlexNet
    # features topology (torchvision.models.alexnet)
    class _AlexNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(
                torch.nn.Conv2d(3, 64, 11, stride=4, padding=2),
                torch.nn.ReLU(inplace=True),
                torch.nn.MaxPool2d(3, stride=2),
                torch.nn.Conv2d(64, 192, 5, padding=2),
                torch.nn.ReLU(inplace=True),
                torch.nn.MaxPool2d(3, stride=2),
                torch.nn.Conv2d(192, 384, 3, padding=1),
                torch.nn.ReLU(inplace=True),
                torch.nn.Conv2d(384, 256, 3, padding=1),
                torch.nn.ReLU(inplace=True),
                torch.nn.Conv2d(256, 256, 3, padding=1),
                torch.nn.ReLU(inplace=True),
                torch.nn.MaxPool2d(3, stride=2),
            )

    tvm = types.ModuleType("torchvision")
    tvm.models = types.ModuleType("torchvision.models")
    tvm.models.alexnet = lambda pretrained=False, **kw: _AlexNet()
    sys.modules.setdefault("torchvision", tvm)
    sys.modules.setdefault("torchvision.models", tvm.models)
    # networks_basic also does `import models as util` (the package's own
    # __init__, unimportable without skimage); the tensor forward only
    # needs normalize_tensor — same definition as models/__init__.py:42
    util = types.ModuleType("models")

    def normalize_tensor(in_feat, eps=1e-10):
        norm_factor = torch.sqrt(
            torch.sum(in_feat ** 2, dim=1, keepdim=True)
        )
        return in_feat / (norm_factor + eps)

    util.normalize_tensor = normalize_tensor
    sys.modules["models"] = util

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules["refmodels"] = pkg
    nb = importlib.import_module("refmodels.networks_basic")

    pnl = nb.PNetLin(
        pnet_type="alex", pnet_rand=True, pnet_tune=False, use_dropout=True,
        spatial=False, version="0.1", lpips=True,
    )
    # seeded backbone in torchvision naming (what our converter consumes)
    feat_ref = pnl.net.state_dict()  # sliceJ.N.weight == features.N.*
    manifest = []
    remap = {}
    for k, v in feat_ref.items():
        idx = k.split(".")[1]
        tv_key = f"features.{idx}.{k.split('.')[-1]}"
        manifest.append([tv_key, list(v.shape)])
        remap[tv_key] = k
    sd_tv = build_seeded_state_dict(manifest, seed=43)
    pnl.net.load_state_dict(
        {remap[k]: torch.from_numpy(v) for k, v in sd_tv.items()}
    )
    # the reference's shipped lin weights
    lin_sd = torch.load(
        os.path.join(REF, "models", "weights", "v0.1", "alex.pth"),
        map_location="cpu",
    )
    pnl.load_state_dict(lin_sd, strict=False)
    pnl.eval()

    rng = np.random.default_rng(1)
    H, W = 64, 64
    a = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.normal(size=(H, W, 3)), 0, 1).astype(np.float32)
    # PNetLin expects [-1, 1] inputs (the package's normalize=True scaling)
    ta = torch.from_numpy((2 * a - 1).transpose(2, 0, 1))[None]
    tb = torch.from_numpy((2 * b - 1).transpose(2, 0, 1))[None]
    with torch.no_grad():
        score = pnl(ta, tb)
    score = float(np.asarray(score).reshape(-1)[0])

    np.savez_compressed(
        os.path.join(FIXTURE_DIR, "lpips_golden.npz"),
        a=a, b=b, score=np.float32(score),
        **{f"lin{i}": np.asarray(lin_sd[f"lin{i}.model.1.weight"])
           for i in range(5)},
    )
    with open(os.path.join(FIXTURE_DIR, "lpips_manifest.json"), "w") as f:
        json.dump(manifest, f)
    print(f"lpips fixture: score={score:.6f}")


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    torch.manual_seed(0)
    make_pwcnet_fixture()
    make_lpips_fixture()


if __name__ == "__main__":
    main()
