"""Golden-fixture parity for the flow/LPIPS stacks (VERDICT r2 item 6).

The fixtures under tests/fixtures/ were recorded by
scripts/make_golden_fixtures.py, which EXECUTED the reference torch
implementations on CPU: the reference PWC-Net architecture
(/root/reference/flow3d/models/pwcnet.py, CUDA correlation replaced by a
pure-torch port of the same kernel) and the vendored richzhang LPIPS
(/root/reference/models/networks_basic.py PNetLin with the shipped
v0.1/alex.pth lin weights). Both nets used manifest-seeded weights that
these tests re-create bit-identically (tests/golden_utils.py), so the
comparisons pin our converters + architectures + composition end-to-end
against independently-executed reference forwards.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.golden_utils import (
    FIXTURE_DIR,
    build_seeded_state_dict,
    load_manifest,
)


def _fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not generated")
    return np.load(path)


class TestPWCNetGolden:
    def test_flow_and_aligned_match_reference(self):
        from deblur4dgs_tpu.models import pwcnet as P

        fix = _fixture("pwcnet_golden.npz")
        manifest = load_manifest("pwcnet_manifest.json")
        sd = build_seeded_state_dict(manifest, seed=42)
        params = P.load_torch_state(sd)

        a = jnp.asarray(fix["a"])[None]
        b = jnp.asarray(fix["b"])[None]
        flow = P.pwcnet_flow(params, a, b)[0]
        np.testing.assert_allclose(
            np.asarray(flow), fix["flow"], atol=1e-4,
            err_msg="composed flow vs reference torch forward",
        )
        aligned, fmask = P.backwarp(a, jnp.asarray(fix["flow"])[None])
        # the reference get_backwarp hard-thresholds the validity mask and
        # pre-multiplies the warp (pwcnet.py:36-57)
        np.testing.assert_allclose(
            np.asarray(aligned[0] * fmask[0]), fix["aligned"], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(fmask[0]), fix["fmask"], atol=1e-5
        )
        l_rec = float(jnp.mean(jnp.abs(
            aligned[0] * fmask[0] - b[0] * fmask[0]
        )))
        np.testing.assert_allclose(l_rec, float(fix["l_rec"]), atol=1e-5)


class TestLPIPSGolden:
    def test_score_matches_reference(self):
        from deblur4dgs_tpu.eval import lpips as LP

        fix = _fixture("lpips_golden.npz")
        manifest = load_manifest("lpips_manifest.json")
        backbone_sd = build_seeded_state_dict(manifest, seed=43)
        lin_sd = {
            f"lin{i}.model.1.weight": fix[f"lin{i}"] for i in range(5)
        }
        params = LP.load_lpips_torch(backbone_sd, lin_sd)
        score = float(LP.lpips(
            params, jnp.asarray(fix["a"])[None], jnp.asarray(fix["b"])[None],
            normalize=True,
        )[0])
        np.testing.assert_allclose(score, float(fix["score"]), atol=1e-4)
