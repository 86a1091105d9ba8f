"""Whole-file enhancement (the reference's ``generate_wav`` paths).

The reference enhances file-by-file at batch size 1 with CPU STFT and
CPU ISTFT boundaries (``trainer/complex_ddpm_trainer.py:903-1018``).
TPU-first redesign: files are length-sorted into padded buckets and the
entire wav -> STFT -> prior -> scan-sampler -> ISTFT -> wav path runs
on device per bucket; only decode and write stay on host.

Any trainer exposing ``enhance_batch(noisy_padded, rng)`` can serve
through these helpers (DDPM, complex dis-only, magnitude).
"""

from __future__ import annotations

import glob
import logging
import os
import time
from typing import List, Optional, Sequence

import jax
import numpy as np

from prior_diffuse_tpu.data.wavio import read_wav, write_wav


# Every enhance jit shape is (rows, pad) — each new one is an XLA
# compile, which on this stack can cost minutes.  Two ladders bound the
# count: row counts round up to powers of two (<= batch_size) and pad
# lengths climb a geometric x1.5 ladder of bucket_samples multiples, so
# a directory of N mixed-length files compiles O(log batch + log maxlen)
# shapes instead of O(N).
_seen_shapes: set = set()


def _ladder_pad(longest: int, bucket_samples: int) -> int:
    rung = bucket_samples
    while rung < longest:
        rung = -(-int(rung * 1.5) // bucket_samples) * bucket_samples
    return rung


def _ladder_rows(count: int, batch_size: int) -> int:
    rows = 1
    while rows < count:
        rows *= 2
    return min(rows, max(batch_size, count))


# Measured serving optimum (docs/PERF_r3_notes.md): rows=8 is the best
# per-utterance point (6.4 ms/utt bf16) and 8 < rows < 16 sits in a
# worse MXU tiling regime (10.3 ms/utt at rows=12), so row groups
# larger than 8 are split 8+remainder rather than compiled as one
# wide shape — 2x8 beats 1x12 and 1x16 per utterance.
_ROWS_OPT = 8


def _buckets(lengths: Sequence[int], batch_size: int, bucket_samples: int):
    order = np.argsort(lengths)
    groups = []
    for i in range(0, len(order), batch_size):
        grp = order[i : i + batch_size]
        groups += [grp[k : k + _ROWS_OPT]
                   for k in range(0, len(grp), _ROWS_OPT)]
    for idx in groups:
        pad_to = _ladder_pad(max(lengths[j] for j in idx), bucket_samples)
        rows = _ladder_rows(len(idx), min(batch_size, _ROWS_OPT))
        if (rows, pad_to) not in _seen_shapes:
            _seen_shapes.add((rows, pad_to))
            logging.info("enhance: new jit shape rows=%d pad=%d "
                         "(%d shapes this process)", rows, pad_to,
                         len(_seen_shapes))
        yield idx, rows, pad_to


def prior_only_server(trainer, dtype=None):
    """Serving adapter that runs ONLY the discriminative prior (x_init,
    no residual DDPM) through the same wav -> STFT -> ISTFT -> wav
    pipeline; exposes ``enhance_batch`` so it plugs into
    ``enhance_files``/``enhance_long`` anywhere a trainer does.

    The reference has no such path (its dis-only trainers are separate
    models, ``trainer/complex_trainer.py``); this adapter shares the
    trained chain's prior, so chain-vs-prior deltas in the demo and
    schedule-tradeoff tables isolate the residual DDPM's net
    contribution on identical weights.

    ``dtype`` is the prior compute dtype (defaults to the trainer's
    ``serve_dtype``); params/batch-stats are cast once per state object
    and passed as jit arguments (never closed over — constants get
    re-shipped per call on this PJRT).
    """
    import jax.numpy as jnp

    from prior_diffuse_tpu.signal.compress import decompress_spec
    from prior_diffuse_tpu.signal.stft import istft
    from prior_diffuse_tpu.training.base import spec_features

    dt = dtype if dtype is not None else getattr(
        trainer, "serve_dtype", jnp.float32)
    cfg = trainer.cfg

    @jax.jit
    def impl(dis_vars, wav):
        feat = spec_features(wav, cfg)
        x_init, _ = trainer._dis_apply(dis_vars, feat.astype(dt),
                                       train=False)
        return istft(
            decompress_spec(x_init.astype(jnp.float32), cfg.feat_type),
            length=wav.shape[-1], fft_num=cfg.fft_num,
            win_size=cfg.win_size, win_shift=cfg.win_shift)

    class _PriorOnly:
        def __init__(self):
            self.cfg = cfg
            self._src = None
            self._vars = None

        def enhance_batch(self, wav_batch, rng):
            if self._src is not trainer.state:
                dis = trainer.state["dis"]
                if dt != jnp.float32:
                    dis = jax.tree.map(lambda p: p.astype(dt), dis)
                self._vars, self._src = dis, trainer.state
            return impl(self._vars, trainer.put_batch(wav_batch)[0])

    return _PriorOnly()


def enhance_waveform(trainer, wav: np.ndarray, rng) -> np.ndarray:
    """Enhance one waveform (RMS-normalize, run the model pipeline,
    restore scale)."""
    out = enhance_files(trainer, [wav], rng)
    return out[0]


def enhance_files(trainer, wavs: List[np.ndarray], rng,
                  batch_size: Optional[int] = None,
                  bucket_samples: int = 16000) -> List[np.ndarray]:
    """Enhance a list of waveforms; returns same-length enhanced wavs."""
    batch_size = batch_size or trainer.cfg.batch_size
    lengths = [len(w) for w in wavs]
    results: List[Optional[np.ndarray]] = [None] * len(wavs)
    for idx, rows, pad_to in _buckets(lengths, batch_size, bucket_samples):
        batch = np.zeros((rows, pad_to), np.float32)
        scales = np.zeros(len(idx), np.float32)
        for row, j in enumerate(idx):
            w = wavs[j]
            c = np.sqrt(np.sum(w.astype(np.float64) ** 2) / len(w))
            c = max(float(c), 1e-12)
            batch[row, : len(w)] = w / c
            scales[row] = c
        rng, step_rng = jax.random.split(rng)
        out = np.asarray(
            trainer.enhance_batch(batch, step_rng)
        )  # [B, pad_to]
        for row, j in enumerate(idx):
            results[j] = (out[row, : lengths[j]] * scales[row]).astype(np.float32)
    return results  # type: ignore[return-value]


def enhance_directory(trainer, data_path: str, out_dir: str, rng,
                      batch_size: Optional[int] = None) -> float:
    """Enhance every wav under ``data_path`` into ``out_dir``.

    Returns the realtime factor achieved (audio seconds per wall
    second) for observability.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(data_path, "*.wav")))
    if not paths:
        raise FileNotFoundError(f"no wavs under {data_path}")
    wavs = [read_wav(p, trainer.cfg.sample_rate)[0] for p in paths]
    t0 = time.time()
    enhanced = enhance_files(trainer, wavs, rng, batch_size)
    wall = time.time() - t0
    for p, w in zip(paths, enhanced):
        write_wav(os.path.join(out_dir, os.path.basename(p)), w,
                  trainer.cfg.sample_rate)
    audio_sec = sum(len(w) for w in wavs) / trainer.cfg.sample_rate
    rtf = audio_sec / wall if wall > 0 else float("inf")
    logging.info(
        "enhanced %d files (%.1f s audio) in %.2f s -> RTF %.1fx",
        len(paths), audio_sec, wall, rtf,
    )
    return rtf
