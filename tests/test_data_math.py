"""Sequencer / TTC / label-smoothing math vs loop-based oracles
(golden-value strategy per SURVEY.md §4)."""

import numpy as np
import pytest

from simple_tad_tpu.data.sequencing import (
    RegularSequencer, RegularSequencerWithStart, UnsafeOverlapSequencer)
from simple_tad_tpu.data.labels import compute_time_vector, smooth_labels


def loop_time_vector(labels, fps, TT=2.0, TA=1.0):
    """Direct per-frame restatement of dataset/data_utils.py:6-56."""
    labels = np.asarray(labels)
    n = len(labels)
    tv = np.zeros(n)
    anom = np.where(labels == 1)[0]
    if len(anom) == 0:
        return tv
    TTf, TAf = int(TT * fps), int(TA * fps)
    for i in range(n):
        if labels[i] == 1:
            tv[i] = 0
            continue
        d = anom - i
        fut = d[d > 0]
        if len(fut) and fut[0] <= TTf:
            tv[i] = -fut[0] / fps
            continue
        past = d[d < 0]
        if len(past) and abs(past[-1]) <= TAf:
            tv[i] = -past[-1] / fps
            continue
        tv[i] = -100.0
    return tv


@pytest.mark.parametrize("seed", range(5))
def test_time_vector_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = rng.integers(5, 200)
    labels = (rng.random(n) < 0.15).astype(int)
    fps = int(rng.choice([10, 30]))
    got = compute_time_vector(labels, fps)
    want = loop_time_vector(labels, fps)
    np.testing.assert_allclose(got, want)


def test_time_vector_no_anomaly():
    assert (compute_time_vector([0] * 10, 10) == 0).all()


def test_time_vector_known_case():
    # anomaly at frames 5-6, fps=10, TT=2s (20f), TA=1s (10f)
    labels = [0] * 5 + [1, 1] + [0] * 13
    tv = compute_time_vector(labels, 10)
    assert tv[5] == 0 and tv[6] == 0
    assert tv[4] == -0.1 and tv[0] == -0.5          # before: negative
    assert tv[7] == pytest.approx(0.1)              # after: positive
    assert tv[16] == pytest.approx(1.0)
    assert tv[17] == -100.0                         # outside TA window


def test_smooth_labels_values():
    labels = np.array([0, 0, 1, 0, 0])
    tv = np.array([-1.0, -0.5, 0.0, 0.5, -100.0])
    sm = smooth_labels(labels, tv, before_limit=2.0, after_limit=1.0)
    assert sm.shape == (5, 2)
    # before ramp: 1/(1+exp(-6*(x+1)))
    np.testing.assert_allclose(sm[0, 1], 1 / (1 + np.exp(-6 * (-1 + 1))),
                               rtol=1e-6)
    np.testing.assert_allclose(sm[1, 1], 1 / (1 + np.exp(-6 * (-0.5 + 1))),
                               rtol=1e-6)
    assert sm[2, 1] == 1.0
    # after ramp: 1/(1+exp(-12*(-x+0.5)))
    np.testing.assert_allclose(sm[3, 1], 1 / (1 + np.exp(-12 * (-0.5 + 0.5))),
                               rtol=1e-6)
    assert sm[4, 1] == 0.0
    np.testing.assert_allclose(sm.sum(-1), 1.0, rtol=1e-6)


class TestRegularSequencer:
    def test_same_fps_stride1(self):
        seqs = RegularSequencer(10, 4, step=1).get_sequences(10, 10)
        assert seqs[0] == [0, 1, 2, 3]
        assert seqs[-1] == [6, 7, 8, 9]
        assert len(seqs) == 7

    def test_decimation(self):
        # 30fps input, 10fps target: fps_step=3, window covers 3*4-2=10 frames
        seqs = RegularSequencer(10, 4, step=1).get_sequences(20, 30)
        for s in seqs:
            assert len(s) == 4
            assert s[1] - s[0] == 3
        assert seqs[-1][-1] == 19          # last window ends at last frame

    def test_stride_alignment(self):
        seqs = RegularSequencer(10, 4, step=3).get_sequences(12, 10)
        # actual_len=4, start=(12-4)%3=2 -> starts 2,5,8
        assert [s[0] for s in seqs] == [2, 5, 8]
        assert seqs[-1][-1] == 11

    def test_too_short_returns_none(self):
        assert RegularSequencer(10, 16, step=1).get_sequences(10, 10) is None

    def test_every_frame_gets_window_at_step1(self):
        # test mode: step=1 => one window per frame from frame seq_len-1 on
        seqs = RegularSequencer(10, 16, step=1).get_sequences(100, 10)
        assert len(seqs) == 100 - 16 + 1
        assert [s[-1] for s in seqs] == list(range(15, 100))


def test_sequencer_with_start_adds_initial_window():
    # start = (100-16)%30 = 24 > min(3,5) -> extra window at 0 appended
    s = RegularSequencerWithStart(10, 16, step=30).get_sequences(100, 10)
    r = RegularSequencer(10, 16, step=30).get_sequences(100, 10)
    assert len(s) == len(r) + 1
    assert s[-1] == list(range(16))


def test_unsafe_overlap_sequencer():
    labels = np.zeros(60, bool)
    labels[40:43] = True
    seqs = UnsafeOverlapSequencer(10, 8, step=4,
                                  surrounding_timesteps=2).get_sequences(
        labels, 10)
    ends = [s[-1] for s in seqs]
    assert ends == sorted(set(ends))              # deduped + sorted
    for e in (38, 39, 40, 41, 42, 43, 44):        # unsafe ends + surround
        assert e in ends
    assert ends[-1] == 59
