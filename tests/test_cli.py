"""CLI surface test: the reference-familiar flag set drives a full
train epoch and an enhancement run through ``prior_diffuse_tpu.cli``
(the `main.py:9-104` analog), end to end on a tiny synthetic corpus."""

import os

import numpy as np
import pytest

from prior_diffuse_tpu.data import synthetic


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("clicorpus")
    return synthetic.write_corpus(
        str(root), n_train=2, n_test=2, min_len=6000, max_len=9000, seed=5
    )


def _write_conf(tmp_path):
    conf = tmp_path / "tiny.yml"
    conf.write_text(
        """
train:
  batch_size: 2
  n_epochs: 1
  loss: com_mse_loss
  chunk_length: 4800
model:
  name: DiffUNet
optim:
  lr: 5.0e-4
optim_ddpm:
  lr: 2.0e-4
"""
    )
    return str(conf)


@pytest.mark.slow  # full train->generate e2e flow, ~3 min alone
def test_cli_train_then_generate(tmp_path, corpus):
    from prior_diffuse_tpu.cli import main

    conf = _write_conf(tmp_path)
    assets = str(tmp_path / "assets")
    base = [
        "--trainer", "ComplexDDPMTrainer", "--config", conf,
        "--doc", "t", "--assets", assets, "--data-root", corpus,
    ]
    main(base + ["--joint"])  # one epoch of joint training + eval
    ckpt_dir = f"{assets}/checkpoint/t"
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
    # metrics JSONL written with the pesq regime recorded
    metrics = f"{assets}/log/t/metrics.jsonl"
    assert os.path.exists(metrics)
    assert "pesq_mode" in open(metrics).read()

    main(base + ["--generate", "--retrain"])  # enhance from best ckpt
    out_dir = f"{assets}/wav/t"
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 2
