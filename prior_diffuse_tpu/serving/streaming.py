"""Long-file streaming enhancement: chunk + crossfaded overlap-add.

The reference has no long-context path (SURVEY section 5) — it runs
whole utterances through the model at once, which for very long files
means unbounded activation memory and one XLA shape per length.  This
module enhances arbitrarily long audio with **bounded** memory and a
single compiled shape: fixed-length segments with overlap, enhanced as
batches, then recombined with equal-power crossfades.

When does streaming output differ from whole-file output?  The RMS
normalization is file-global (computed once over the whole waveform, so
per-segment level pumping cannot occur), and the complementary
crossfade guarantees a seam-free (click-free) result — but the two
paths are *not* bit-equal: (a) the reverse sampler draws an independent
x_T per segment instead of one per file, and (b) models whose receptive
field spans the segment (BLSTM/attention time context) see truncated
context near segment edges.  ``tests/test_serving.py::
test_streaming_vs_wholefile_real_model`` pins both the seam-free
property and the deviation bound with real trainer weights.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def enhance_long(
    trainer,
    wav: np.ndarray,
    rng,
    segment: int = 48000,
    overlap: int = 4800,
    batch_size: Optional[int] = None,
) -> np.ndarray:
    """Enhance one arbitrarily long waveform in fixed-size segments.

    ``segment`` and ``overlap`` are in samples; the model always sees
    ``[batch, segment]`` inputs (one compiled shape).  Overlap regions
    are blended with a raised-cosine crossfade.
    """
    assert 0 < overlap < segment
    batch_size = batch_size or trainer.cfg.batch_size
    n = len(wav)
    if n <= segment:
        from prior_diffuse_tpu.serving.enhance import enhance_files

        return enhance_files(trainer, [wav], rng)[0]

    c = np.sqrt(np.sum(wav.astype(np.float64) ** 2) / n)
    c = max(float(c), 1e-12)
    norm = (wav / c).astype(np.float32)

    hop = segment - overlap
    starts = list(range(0, max(n - overlap, 1), hop))
    segs = np.zeros((len(starts), segment), np.float32)
    for i, s in enumerate(starts):
        chunk = norm[s : s + segment]
        segs[i, : len(chunk)] = chunk

    outs = np.zeros_like(segs)
    for i in range(0, len(starts), batch_size):
        block = segs[i : i + batch_size]
        rng, step_rng = jax.random.split(rng)
        outs[i : i + len(block)] = np.asarray(
            trainer.enhance_batch(block, step_rng)
        )[: len(block)]

    # raised-cosine crossfade: head of segment i overlaps tail of i-1
    # with complementary ramps (fade_in + fade_out == 1)
    fade_in = 0.5 * (1 - np.cos(np.pi * np.arange(overlap) / overlap)).astype(np.float32)
    fade_out = 1.0 - fade_in
    result = np.zeros(starts[-1] + segment, np.float32)
    for i, s in enumerate(starts):
        seg = outs[i].copy()
        if i > 0:
            seg[:overlap] *= fade_in
        if i < len(starts) - 1:
            seg[hop:] *= fade_out
        result[s : s + segment] += seg
    return (result[:n] * c).astype(np.float32)
