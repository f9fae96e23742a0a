"""Native codec: C++ build + roundtrip + fallback equivalence."""
import numpy as np
import pytest

from liftreg_tpu import native


def test_native_builds_and_roundtrips():
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(32, 33, 7)).astype(np.float32)
    meta, payload = native.pack_array(arr)
    assert len(payload) < arr.nbytes  # random floats still shrink a bit? not
    # guaranteed for pure noise; just require valid roundtrip
    out = native.unpack_array(meta, payload)
    np.testing.assert_array_equal(out, arr)


def test_codec_compresses_structured_data():
    zz = np.linspace(-1, 1, 64 ** 3).astype(np.float32).reshape(64, 64, 64)
    meta, payload = native.pack_array(zz)
    assert len(payload) < zz.nbytes / 3
    np.testing.assert_array_equal(native.unpack_array(meta, payload), zz)


def test_fallback_format_matches_native():
    if not native.native_available():
        pytest.skip("no native codec")
    rng = np.random.default_rng(1)
    arr = (rng.normal(size=(10, 11)) * 100).astype(np.int32)
    meta, native_payload = native.pack_array(arr)
    # decode the native payload with the pure-python path
    lib, native._LIB = native._LIB, "disabled"
    try:
        native_load = native._load
        native._load = lambda: None
        out = native.unpack_array(meta, native_payload)
        np.testing.assert_array_equal(out, arr)
    finally:
        native._load = native_load
        native._LIB = lib


def test_dataset_compress_option(tmp_path):
    import os
    from tools.make_synthetic_dataset import generate
    from liftreg_tpu.data.dataset import Registration2D3DDataset
    out = str(tmp_path / "d")
    generate(out, n_train=1, n_val=1, n_test=1, sz=16, n_proj=2, latent=2)
    opt = {"drr_folder_name": "drr", "use_segmentation_map": True,
           "spacing_to_refer": [2.2] * 3, "load_projection_interval": 1,
           "apply_hu_clip": True, "max_num_for_loading": (-1,) * 4,
           "compress_in_memory": True}
    ds = Registration2D3DDataset(out, phase="train", option=opt)
    sample, name = ds[0]
    assert sample["source"].shape == (1, 16, 16, 16)
    assert np.isfinite(sample["source"]).all()
    # compare against uncompressed dataset
    opt2 = dict(opt, compress_in_memory=False)
    ds2 = Registration2D3DDataset(out, phase="train", option=opt2)
    sample2, _ = ds2[0]
    np.testing.assert_array_equal(sample["source"], sample2["source"])
    np.testing.assert_array_equal(sample["target_proj"], sample2["target_proj"])
