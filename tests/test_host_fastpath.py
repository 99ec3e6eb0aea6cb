"""Host-pipeline fast paths are bit-exact: the decoded-image LRU
(images.py) and the shared-zero skip-copy batch collate (pipeline._stack,
data/zeros.py)."""
import random

import numpy as np
import pytest

from medical_tri_modal_pilot_tpu.data import images as I
from medical_tri_modal_pilot_tpu.data.pipeline import _stack
from medical_tri_modal_pilot_tpu.data.zeros import is_shared_zero, zero_array


@pytest.fixture()
def jpeg(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(300, 260), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr, mode="L").save(p, quality=92)
    return str(p)


@pytest.mark.parametrize("kind", ["random", "randaug", "resize",
                                  "resize_crop", "resize_affine_crop",
                                  "center", "resize_eval"])
def test_image_cache_bit_exact(jpeg, kind):
    size = 64
    I.set_image_cache_mb(0)
    ref = [I.load_cxr(jpeg, kind, size, random.Random(3)) for _ in range(2)]
    I.set_image_cache_mb(64)
    try:
        miss = I.load_cxr(jpeg, kind, size, random.Random(3))
        hit = I.load_cxr(jpeg, kind, size, random.Random(3))
        np.testing.assert_array_equal(ref[0], miss)   # cold = uncached
        np.testing.assert_array_equal(ref[1], hit)    # warm = cached prefix
    finally:
        I.set_image_cache_mb(256)


@pytest.mark.parametrize("kind", ["random", "resize_affine_crop",
                                  "resize_eval"])
def test_image_disk_cache_bit_exact_and_persistent(jpeg, tmp_path, kind):
    """--image-cache-dir: the persistent .npy level under the LRU returns
    bit-identical pixels, and a fresh 'process' (empty LRU, same dir)
    hits the disk instead of re-decoding."""
    size = 64
    I.set_image_cache_mb(0)
    ref = [I.load_cxr(jpeg, kind, size, random.Random(3)) for _ in range(2)]
    cache_dir = str(tmp_path / "imgcache")
    try:
        I.set_image_cache_mb(64)
        I.set_image_cache_dir(cache_dir)
        miss = I.load_cxr(jpeg, kind, size, random.Random(3))
        np.testing.assert_array_equal(ref[0], miss)
        import os
        files = os.listdir(cache_dir)
        assert len(files) == 1 and files[0].endswith(".npy")
        # fresh process simulation: drop the in-memory LRU, keep the dir
        I.set_image_cache_mb(0)
        I.set_image_cache_mb(64)
        # decode must not run again: poison it to prove the disk hit
        orig = I._decode_eq
        I._decode_eq = lambda p: (_ for _ in ()).throw(
            AssertionError("decode ran despite a disk-cache hit"))
        try:
            hit = I.load_cxr(jpeg, kind, size, random.Random(3))
        finally:
            I._decode_eq = orig
        np.testing.assert_array_equal(ref[1], hit)
    finally:
        I.set_image_cache_dir(None)
        I.set_image_cache_mb(256)


def test_zero_array_shared_and_immutable():
    a = zero_array((4, 4))
    b = zero_array((4, 4))
    assert a is b and is_shared_zero(a)
    assert not is_shared_zero(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        a[0, 0] = 1.0


def test_stack_skip_copy_matches_np_stack():
    rng = np.random.default_rng(1)
    big = (1, 72, 72)   # > the 16 KiB skip-copy threshold
    samples = []
    for i in range(6):
        samples.append({
            "img": (zero_array(big) if i % 2 else
                    rng.normal(size=big).astype(np.float32)),
            "txt": (zero_array((128,)) if i == 3 else
                    rng.normal(size=(128,)).astype(np.float32)),
            "target": np.float32(i),
        })
    got = _stack(samples)
    want = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    # batch buffers are fresh + writable even when rows were skipped
    got["img"][0] += 1.0
