"""Shared helpers for the golden-fixture tests (see
scripts/make_golden_fixtures.py, which generated the committed fixtures by
running the REFERENCE torch implementations)."""

import json
import os

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "fixtures")


def build_seeded_state_dict(manifest, seed):
    """Deterministic float32 torch-layout state dict from a committed
    (name, shape) manifest: weights ~ N(0, 1/sqrt(fan_in)), biases
    ~ N(0, 0.01). The SAME arrays are produced by the generation script
    (which fed them to the reference torch net) and by the tests (which
    feed them through our converters) — so the recorded outputs pin
    converter + architecture end-to-end."""
    rng = np.random.default_rng(seed)
    sd = {}
    for name, shape in manifest:
        shape = tuple(int(s) for s in shape)
        if name.endswith(".bias") or len(shape) == 1:
            sd[name] = rng.normal(0, 0.01, shape).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            sd[name] = rng.normal(
                0, 1.0 / np.sqrt(fan_in), shape
            ).astype(np.float32)
    return sd


def load_manifest(name):
    with open(os.path.join(FIXTURE_DIR, name)) as f:
        return json.load(f)
