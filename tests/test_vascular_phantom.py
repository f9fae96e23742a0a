"""Vascular phantom texture: branching vessel trees in the lungs.

The vascular option exists to restore sim-TRE correlation for instance
refinement (DESIGN.md section 2a): band-limited noise gives local windows
no unambiguous structure, bright branching tubes do.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.make_synthetic_dataset import make_phantom, vascular_tree


def test_vascular_tree_density():
    rng = np.random.default_rng(0)
    vol = vascular_tree(rng, (48, 48, 48), roots=(24, 24, 24))
    assert vol.shape == (48, 48, 48)
    assert 0.0 <= vol.min() and vol.max() <= 1.0
    frac = (vol > 0.1).mean()
    # a tree, not empty and not a blob
    assert 0.002 < frac < 0.25, frac
    # connected-ish: the densest voxel sits near the root region
    assert vol.max() == 1.0


def test_vascular_phantom_statistics():
    rng = np.random.default_rng(1)
    ct, seg = make_phantom(rng, 48, texture="vascular")
    lung = seg > 0
    assert lung.any()
    v = ct[lung]
    # parenchyma stays air-like; vessels push a visible fraction of lung
    # voxels toward soft-tissue HU
    assert np.median(v) < -700
    vessel_frac = (v > -400).mean()
    assert 0.01 < vessel_frac < 0.35, vessel_frac
    # broadband parenchyma still present (not a binary vessel mask)
    assert v.std() > 50


def test_vascular_reproducible():
    a, _ = make_phantom(np.random.default_rng(7), 32, texture="vascular")
    b, _ = make_phantom(np.random.default_rng(7), 32, texture="vascular")
    np.testing.assert_array_equal(a, b)


def test_other_textures_unchanged():
    """Adding the vascular option must not alter the existing textures."""
    rng = np.random.default_rng(2)
    ct_b, _ = make_phantom(rng, 32, texture="banded")
    v = ct_b[ct_b > -1000]
    assert (ct_b > -400).mean() < 0.9  # no vessel boost leaked in
