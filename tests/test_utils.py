"""Profiler, logging, plateau-controller and CLI-parse unit tests."""

import json
import time

import numpy as np
import jax.numpy as jnp

from prior_diffuse_tpu.training.plateau import PlateauController
from prior_diffuse_tpu.utils.logging import MetricsLogger
from prior_diffuse_tpu.utils.profiler import StepTimer, flops_estimate


def test_step_timer():
    t = StepTimer(window=4)
    assert t.tick() is None
    time.sleep(0.01)
    dt = t.tick()
    assert dt is not None and dt > 0
    assert t.mean > 0 and t.items_per_sec(8) > 0


def test_flops_estimate():
    f = lambda a, b: a @ b
    x = jnp.ones((64, 64))
    fl = flops_estimate(f, x, x)
    # matmul flops = 2*64^3 (None acceptable if backend lacks analysis)
    assert fl is None or fl >= 2 * 64**3 * 0.5


def test_metrics_logger_jsonl(tmp_path):
    m = MetricsLogger(str(tmp_path))
    m.log({"loss": 1.5}, step=3)
    m.log({"loss": 1.25}, step=4)
    m.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["loss"] == 1.25 and rec["step"] == 4


def test_plateau_controller_reference_semantics():
    """half_lr=3, early_stop=5: bad-epoch counter vs the *previous* loss."""
    pc = PlateauController(half_lr=3, early_stop=5)
    assert pc.update(1.0) == (False, False, True)  # first epoch, best
    assert pc.update(0.9) == (False, False, True)  # improved
    assert pc.update(0.95) == (False, False, False)  # bad 1
    assert pc.update(0.96) == (False, False, False)  # bad 2
    halve, stop, best = pc.update(0.97)  # bad 3 -> halve
    assert halve and not stop
    assert pc.update(0.98) == (False, False, False)  # bad 4
    halve, stop, best = pc.update(0.99)  # bad 5 -> stop
    assert stop


def test_cli_parse(tmp_path):
    from prior_diffuse_tpu.cli import parse_args

    run, use_wandb = parse_args(
        ["--trainer", "MagTrainer", "--config", "conf/grn.yml",
         "--assets", str(tmp_path), "--doc", "x", "--joint", "--sigma"]
    )
    assert run.trainer == "MagTrainer" and run.joint and run.sigma
    assert not use_wandb
    assert run.checkpoint_dir.endswith("checkpoint/x")
