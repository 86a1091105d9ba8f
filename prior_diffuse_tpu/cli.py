"""Command-line entry point.

Mirrors the reference CLI surface (``main.py:20-41``):

    python -m prior_diffuse_tpu.cli --trainer ComplexDDPMTrainer \
        --config conf/diff.yml [--generate|--retrain|--joint|--eval|--sigma|--noisy|--draw]

with explicit registry dispatch instead of ``eval()`` (main.py:96), a
typed config tree, and asset dirs ``<assets>/{log,checkpoint,wav}/<doc>``.
"""

from __future__ import annotations

import argparse
import dataclasses
import logging

import numpy as np

from prior_diffuse_tpu.config import RunConfig, load_experiment
from prior_diffuse_tpu.registry import TRAINERS
from prior_diffuse_tpu.utils.logging import setup_logging


def parse_args(argv=None) -> RunConfig:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=1234, help="Random seed")
    p.add_argument("--trainer", type=str, default="ComplexDDPMTrainer",
                   help=f"One of: {', '.join(TRAINERS.names())}")
    p.add_argument("--config", type=str, default="conf/diff.yml",
                   help="Path to the experiment YAML")
    p.add_argument("--verbose", type=str, default="info")
    p.add_argument("--doc", type=str, default="diff")
    p.add_argument("--assets", type=str, default="assets_dpm")
    p.add_argument("--data-root", type=str, default="data")
    p.add_argument("--generate", action="store_true", help="Run enhancement")
    p.add_argument("--retrain", action="store_true", help="Resume from checkpoint")
    p.add_argument("--joint", action="store_true", help="Joint dis+DDPM training")
    p.add_argument("--eval", action="store_true", help="Evaluation only")
    p.add_argument("--sigma", action="store_true", help="PriorGrad sigma conditioning")
    p.add_argument("--noisy", action="store_true")
    p.add_argument("--draw", action="store_true", help="Eval/plot from best checkpoint")
    p.add_argument("--wandb", action="store_true",
                   help="Mirror metrics to wandb (optional dependency)")
    p.add_argument("--profile-steps", type=int, default=0,
                   help="Capture a jax.profiler trace of the first N "
                        "train steps into <log_dir>/trace")
    a = p.parse_args(argv)
    run = RunConfig(
        seed=a.seed, trainer=a.trainer, config=a.config, doc=a.doc,
        assets=a.assets, generate=a.generate, retrain=a.retrain,
        joint=a.joint, eval=a.eval, sigma=a.sigma, noisy=a.noisy,
        draw=a.draw, profile_steps=a.profile_steps, data_root=a.data_root,
    )
    setup_logging(run.log_dir, a.verbose)
    return run, a.wandb


def main(argv=None):
    # ensure trainers are registered
    import prior_diffuse_tpu.training.complex_trainer  # noqa: F401
    import prior_diffuse_tpu.training.ddpm_trainer  # noqa: F401
    import prior_diffuse_tpu.training.mag_trainer  # noqa: F401

    run, use_wandb = parse_args(argv)
    exp = load_experiment(run.config)
    logging.info("Run = %s", dataclasses.asdict(run))
    logging.info("Experiment = %s", dataclasses.asdict(exp))
    np.random.seed(run.seed)

    from prior_diffuse_tpu.utils.logging import MetricsLogger

    metrics = MetricsLogger(run.log_dir, use_wandb=use_wandb)
    trainer = TRAINERS.get(run.trainer)(run, exp, metrics_logger=metrics)
    if run.generate:
        trainer.generate_wav(load_pre_train=True)
    else:
        trainer.train_ddpm()


if __name__ == "__main__":
    main()
