"""Approximate-PESQ property tests (labeled approximation; anchors +
monotonicity, not ITU value parity)."""

import numpy as np
import pytest

from prior_diffuse_tpu.data import synthetic
from prior_diffuse_tpu.metrics.pesq_np import pesq_approx


def test_perfect_scores_max():
    rng = np.random.default_rng(0)
    _, clean = synthetic.make_utterance(rng, 32000, snr_db=5.0)
    assert pesq_approx(clean, clean) == pytest.approx(4.64, abs=0.01)


def test_monotone_in_snr():
    scores = []
    for snr in (20, 10, 0, -10):
        noisy, clean = synthetic.make_utterance(
            np.random.default_rng(1), 32000, snr_db=snr
        )
        scores.append(pesq_approx(clean, noisy))
    assert all(a > b for a, b in zip(scores, scores[1:]))
    assert scores[0] > 2.5 and scores[-1] < 1.5


def test_gain_invariance():
    noisy, clean = synthetic.make_utterance(np.random.default_rng(2), 32000, 10.0)
    a = pesq_approx(clean, noisy)
    b = pesq_approx(clean, noisy * 3.0)  # level alignment should absorb gain
    assert a == pytest.approx(b, abs=0.1)


def test_alignment_tolerates_shift():
    noisy, clean = synthetic.make_utterance(np.random.default_rng(3), 32000, 10.0)
    shifted = np.concatenate([np.zeros(800, np.float32), noisy])[:32000]
    a = pesq_approx(clean, noisy)
    b = pesq_approx(clean, shifted)
    assert b == pytest.approx(a, abs=0.5)


def test_env_gate(monkeypatch):
    from prior_diffuse_tpu.metrics import pesq as pq

    if pq.HAVE_PESQ:
        pytest.skip("real binding present")
    noisy, clean = synthetic.make_utterance(np.random.default_rng(4), 32000, 10.0)
    monkeypatch.delenv("PDT_APPROX_PESQ", raising=False)
    assert pq.pesq_score(clean, noisy, 16000) is None
    monkeypatch.setenv("PDT_APPROX_PESQ", "1")
    s = pq.pesq_score(clean, noisy, 16000)
    assert s is not None and 1.0 <= s <= 4.64
