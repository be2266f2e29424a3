"""Reference-signature dataset builders."""

import pytest

from simple_tad_tpu.config import FinetuneConfig, PretrainConfig
from simple_tad_tpu.data.builders import (build_frame_dataset,
                                          build_pretraining_dataset)
from tests.fixtures import make_synthetic_dada, make_synthetic_dota_full


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    dota = make_synthetic_dota_full(
        str(tmp_path_factory.mktemp("bdota")), n_clips=2,
        frames_per_clip=24, h=48, w=64)
    dada = make_synthetic_dada(str(tmp_path_factory.mktemp("bdada")),
                               n_clips=2, frames_per_clip=60)
    return dota, dada


def test_build_frame_dataset_dota(roots):
    dota, _ = roots
    args = FinetuneConfig(data_set="DoTA", data_path=dota, num_frames=16,
                          view_fps=10, sampling_rate=2, input_size=32)
    train, n = build_frame_dataset(True, False, args)
    assert n == 2 and train.mode == "train" and train.view_step == 2
    test, _ = build_frame_dataset(False, True, args)
    assert test.mode == "test" and test.view_step == 1
    assert len(test) == 2 * 9     # 24 frames, window 16, stride 1


def test_build_frame_dataset_dada(roots):
    _, dada = roots
    args = FinetuneConfig(data_set="DADA2K", data_path=dada, num_frames=16,
                          view_fps=10, sampling_rate=3, input_size=32)
    val, n = build_frame_dataset(False, False, args)
    assert n == 2 and val.orig_fps == 30 and val.view_step == 3
    args2 = FinetuneConfig(data_set="DADA2K", data_path=dada,
                           num_frames=16, view_fps=10, sampling_rate=3,
                           sampling_rate_val=1, input_size=32)
    val2, _ = build_frame_dataset(False, False, args2)
    assert val2.view_step == 1


def test_build_pretraining_dataset(roots):
    dota, _ = roots
    args = PretrainConfig(data_set="DoTA", data_path=dota, num_frames=16,
                          view_fps=10, sampling_rate=4)
    ds = build_pretraining_dataset(True, args)
    assert len(ds) > 0
    w = ds.get_window(0)
    assert w.shape[0] == 16


def test_prepared_view_list_roundtrip(tmp_path, roots):
    """prepare-views writes the reference txt format; loading it into
    PretrainWindowDataset reproduces the scanned samples exactly
    (bdd100k.py:164-188 *_prepared semantics)."""
    import numpy as np
    from simple_tad_tpu.cli.data_tools import main as tools_main
    from simple_tad_tpu.cli.pretrain import _build_source
    from simple_tad_tpu.data.pretrain_datasets import load_view_list

    dota_root, _ = roots
    out = str(tmp_path / "views.txt")
    tools_main(["prepare-views", "--data_set", "DoTA",
                "--data_path", dota_root, "--out", out,
                "--num_frames", "8", "--sampling_rate", "2"])

    class _Cfg:
        num_frames = 8
        view_fps = 10
        sampling_rate = 2
    scanned = _build_source("DoTA", dota_root, _Cfg)
    prepared = _build_source("DoTA", dota_root, _Cfg, view_list=out)
    assert len(prepared) == len(scanned) > 0
    for (c1, s1), (c2, s2) in zip(prepared.samples, scanned.samples):
        assert c1 == c2
        np.testing.assert_array_equal(s1, s2)
    # pkl flavor (dada.py:686-691)
    import pickle
    pkl = str(tmp_path / "views.pkl")
    with open(pkl, "wb") as f:
        pickle.dump([(c, list(map(int, s))) for c, s in scanned.samples], f)
    again = load_view_list(pkl)
    assert len(again) == len(scanned)
    np.testing.assert_array_equal(again[0][1], scanned.samples[0][1])
