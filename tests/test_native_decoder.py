"""Native C++ zip/JPEG decoder vs the python/cv2 path."""

import os
import zipfile

import cv2
import numpy as np
import pytest

from simple_tad_tpu.data import native
from simple_tad_tpu.data.zipreader import decode_zip_frames


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.build_native():
        pytest.skip("native decoder toolchain unavailable")
    os.environ["SIMPLE_TAD_NATIVE_DECODER"] = "1"
    yield
    os.environ.pop("SIMPLE_TAD_NATIVE_DECODER", None)


@pytest.fixture(scope="module")
def jpeg_zip(tmp_path_factory):
    root = tmp_path_factory.mktemp("nz")
    path = str(root / "images.zip")
    rng = np.random.default_rng(0)
    imgs = {}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for t in range(6):
            x = np.linspace(0, 255, 64, dtype=np.float32)[None, :, None]
            img = np.clip(x + rng.normal(0, 10, (48, 64, 3)) + t * 5,
                          0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(".jpg", img)
            assert ok
            zf.writestr(f"{t:06d}.jpg", buf.tobytes())
            imgs[f"{t:06d}.jpg"] = buf.tobytes()
    return path, imgs


def test_entry_listing_and_probe(jpeg_zip):
    path, imgs = jpeg_zip
    dec = native.NativeZipDecoder(path)
    assert sorted(dec.entry_names()) == sorted(imgs)
    assert dec.probe("000000.jpg") == (48, 64)
    dec.close()


def test_native_decode_matches_cv2(jpeg_zip):
    path, imgs = jpeg_zip
    names = sorted(imgs)
    got = native.decode_zip_frames_native(path, names)
    assert got is not None and got.shape == (6, 48, 64, 3)
    for i, n in enumerate(names):
        want = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(imgs[n], np.uint8),
                         cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
        diff = np.abs(got[i].astype(int) - want.astype(int))
        # same libjpeg family; allow tiny IDCT variation
        assert diff.max() <= 1, (n, diff.max())


def test_zipreader_uses_native_and_resizes(jpeg_zip):
    path, imgs = jpeg_zip
    names = sorted(imgs)[:3]
    frames = decode_zip_frames(path, names, resize=(32, 32))
    assert len(frames) == 3
    assert frames[0].shape == (32, 32, 3)


def test_missing_entry_falls_back_cleanly(jpeg_zip):
    path, _ = jpeg_zip
    # native path returns None on bad entry; zipreader then raises KeyError
    assert native.decode_zip_frames_native(path, ["nope.jpg"]) is None
    with pytest.raises(KeyError):
        decode_zip_frames(path, ["nope.jpg"])


def test_stored_zip_entries(tmp_path):
    """ZIP_STORED (uncompressed) entries decode too (frames2zip default)."""
    path = str(tmp_path / "stored.zip")
    img = np.full((16, 16, 3), 128, np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("a.jpg", buf.tobytes())
    out = native.decode_zip_frames_native(path, ["a.jpg"])
    assert out is not None and out.shape == (1, 16, 16, 3)
    assert abs(int(out.mean()) - 128) <= 2
