"""Synthetic VoiceBank-DEMAND-shaped data for tests and smoke runs.

Generates clean "speech" (harmonic tones with an envelope) plus noise,
and writes paired ``{noisy,clean}_{trainset,testset}_wav`` trees so the
full data pipeline / trainers run without the real corpus.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from prior_diffuse_tpu.data.wavio import write_wav


def make_utterance(
    rng: np.random.Generator, length: int, sr: int = 16000, snr_db: float = 5.0
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (noisy, clean) float32 pair."""
    t = np.arange(length) / sr
    f0 = rng.uniform(90, 250)
    clean = np.zeros(length, np.float32)
    for h in range(1, 6):
        clean += (1.0 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    env = 0.4 * (0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t))
    clean = (clean * env / np.max(np.abs(clean))).astype(np.float32) * 0.5
    noise = rng.standard_normal(length).astype(np.float32)
    p_clean = np.mean(clean**2)
    p_noise = np.mean(noise**2)
    noise *= np.sqrt(p_clean / (p_noise * 10 ** (snr_db / 10)))
    return clean + noise, clean


def write_corpus(
    root: str,
    n_train: int = 8,
    n_test: int = 4,
    sr: int = 16000,
    min_len: int = 24000,
    max_len: int = 64000,
    seed: int = 0,
) -> str:
    """Create the 4-directory layout under ``root``; returns ``root``."""
    rng = np.random.default_rng(seed)
    for split, n in [("trainset", n_train), ("testset", n_test)]:
        nd = os.path.join(root, f"noisy_{split}_wav")
        cd = os.path.join(root, f"clean_{split}_wav")
        os.makedirs(nd, exist_ok=True)
        os.makedirs(cd, exist_ok=True)
        for i in range(n):
            length = int(rng.integers(min_len, max_len))
            noisy, clean = make_utterance(rng, length, sr)
            name = f"p{split[:2]}_{i:03d}.wav"
            write_wav(os.path.join(nd, name), noisy, sr)
            write_wav(os.path.join(cd, name), clean, sr)
    return root
