"""Typed configuration tree.

Replaces the reference's three-layer config (argparse flags + YAML->
``argparse.Namespace`` via ``dict2namespace`` at ``main.py:9-17`` + the
module-global diffusion ``AttrDict`` at ``utils/params.py:19-50``) with
dataclasses.  The same three knob groups survive: run flags
(:class:`RunConfig`), experiment config (:class:`ExperimentConfig`) and
diffusion hyper-parameters (:class:`DiffusionConfig`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import yaml


@dataclass(frozen=True)
class StftConfig:
    """STFT framing parameters (reference ``conf/*.yml`` train block)."""

    fft_num: int = 320
    win_size: int = 320
    win_shift: int = 160

    @property
    def freq_bins(self) -> int:
        return self.fft_num // 2 + 1  # 161


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 6
    n_epochs: int = 50
    loss: str = "com_mse_loss"
    chunk_length: int = 48000  # 3 s @ 16 kHz
    win_size: int = 320
    fft_num: int = 320
    win_shift: int = 160
    feat_type: str = "sqrt"  # normal | sqrt | cubic | log_1x | none
    pesq_loss: bool = False
    lam: float = 1.0  # joint loss weight: lam * L_ddpm + L_dis
    sample_rate: int = 16000
    # "bfloat16" enables mixed-precision model compute (params stay
    # f32, losses/optimizer in f32); "float32" = reference numerics
    compute_dtype: str = "float32"

    @property
    def stft(self) -> StftConfig:
        return StftConfig(self.fft_num, self.win_size, self.win_shift)

    @property
    def freq_bins(self) -> int:
        return self.fft_num // 2 + 1


@dataclass(frozen=True)
class ModelConfig:
    name: str = "DiffUNet"


@dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "Adam"
    lr: float = 5e-4
    l2: float = 1e-7  # torch-Adam style L2 (decay added to the gradient)
    half_lr: int = 3  # halve LR after this many non-improving CV epochs
    early_stop: int = 5  # stop after this many non-improving CV epochs


@dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion hyper-parameters (reference ``utils/params.py:35-50``)."""

    pirorgrad: bool = True  # [sic] reference flag name, kept for parity
    deltamu: bool = False
    ours: bool = False
    fast_sampling: bool = True
    noise_schedule: List[float] = field(
        default_factory=lambda: np.linspace(1e-4, 0.05, 50).tolist()
    )
    inference_noise_schedule: List[float] = field(
        default_factory=lambda: [1e-4, 1e-3, 1e-2, 0.05, 0.2, 0.5]
    )
    # reverse-sampler fixups applied by the reference
    # (trainer/complex_ddpm_trainer.py:460 gamma[0]=0.2, :30 c=11)
    gamma0_override: float = 0.2
    scale_c: float = 11.0
    # Framework extension (no reference counterpart): in pirorgrad mode,
    # condition the residual DDPM on BOTH x_init and the noisy spectrum
    # (cond = concat([x_init, feat/c], channel axis)) instead of x_init
    # alone (reference trainer/complex_ddpm_trainer.py:731).  Motivated
    # by the round-3 predictability probe: the residual the DDPM must
    # generate can carry structure recoverable from the noisy input that
    # the prior discarded.  Off by default (reference semantics).
    cond_noisy: bool = False
    # Framework extension (no reference counterpart): draw training
    # timesteps from the fast inference schedule's aligned (T, alpha_bar)
    # pairs instead of uniform over the full integer grid, so denoiser
    # capacity concentrates on exactly the 6 noise levels the fast
    # sampler queries (round-3 diagnosis: the denoiser was weakest at
    # those levels, docs/diag_residual_r3.md).  Off by default.
    train_t_fast: bool = False
    # Framework extension (no reference counterpart): average this many
    # independent reverse chains at sampling time (vmapped inside the
    # one sampling jit).  The reference's deterministic sampler emits a
    # *sample* of the residual marginal, whose unpredictable component
    # is uncorrelated noise added to the output; averaging N chains
    # shrinks that component's energy by 1/N, approximating the
    # posterior-mean residual.  1 = exact reference semantics.  See
    # diffusion/sampler.py::reverse_sample and
    # docs/residual_capability_r3.md for the derivation.
    n_avg: int = 1
    # Framework extension (no reference counterpart): start the reverse
    # chain from the initial distribution's mean (zeros) instead of a
    # random draw — the n_avg -> inf limit of an affine chain at 1x
    # cost.  At the training optimum for a Gaussian residual this is
    # never worse than prior-only and a strict win whenever any of the
    # residual is predictable (pinned by tests/test_sampler_theory.py)
    # — but real non-affine nets see an off-manifold zeros input and
    # can emit junk (measured: residual_capability_r3.md E8); prefer
    # n_avg unless near the affine optimum.  False = reference
    # semantics.
    zero_init: bool = False
    # Framework extension (no reference counterpart): network output
    # parameterization.  "eps" (reference semantics,
    # trainer/complex_ddpm_trainer.py:733) regresses the mixed-in noise;
    # "x0" regresses the clean-side target directly (the residual
    # label/c - x_init in pirorgrad mode, label/c in conditional mode)
    # and the sampler converts to eps via
    # eps = (x_t - sqrt(ab)*x0_hat) / sqrt(1 - ab) at each queried step.
    # At the training optimum the two define the *same* chain (pinned by
    # tests/test_sampler_theory.py), but their finite-training behavior
    # differs: the conditionally-predictable residual component enters
    # the eps target scaled by sqrt(ab)/sqrt(1-ab) — ~0.07 at the fast
    # schedule's first (highest-noise) step — while it enters the x0
    # target at full strength at every noise level.  Round-3 measurement
    # (docs/residual_capability_r3.md E8): a supervised regressor
    # recovers residual structure (val cos 0.23) that the eps-trained
    # chain never emits (cos ~ 0); "x0" closes that transfer gap.
    # Measured recipe (residual_capability_r3.md E9/E9-TPU): near the
    # net's mean-regression optimum "x0" makes the chain >= prior-only
    # (eps at the same budget is heavily net-negative), but FAR from
    # convergence an undertrained x0 net is riskier than eps — its
    # error enters the chain at full (1-ab) output weight.  Use "eps"
    # while the prior trains jointly, "x0" for a long frozen-prior
    # refinement stage.
    # Not supported in deltamu mode (its state mixes x_init into the
    # noise term, so there is no clean x0 target).
    predict: str = "eps"
    # Framework extension (no reference counterpart): close the x0
    # objective's *identity leak*.  In pirorgrad mode the training input
    # is x_t = sqrt(ab)*r + sqrt(1-ab)*eps, so wherever ab is large the
    # lowest-loss policy for an x0 net is to read the target r straight
    # out of x_t instead of out of the conditioning — but the reverse
    # chain's own states carry the net's *estimate* of r, not r itself,
    # so that policy emits ~0 at inference (measured: sampled residual
    # collapses to 7% energy / cos 0.02 against a weak prior,
    # docs/residual_capability_r3.md E9-TPU).  With probability
    # x0_leak_drop per training sample, the signal term of x_t is
    # hard-zeroed (target unchanged), forcing the net to recover r from
    # the conditioning.  At p=1.0 — the recommended setting for
    # frozen-prior refinement — the training optimum ignores x_t and
    # regresses the posterior-mean residual, which the UNCHANGED
    # reference sampler then emits exactly (the mean-collapse law): at
    # the affine optimum this chain's MSE is e_unpredictable, strictly
    # below both the prior (e_m + e_u) and the reference chain
    # (abar^2*e_m + abar + e_u) whenever anything is predictable.
    # Intermediate p and soft attenuation are *miscalibrated* against
    # the sampler's full-scale x0->eps conversion and can run worse
    # than the prior — both laws pinned by tests/test_sampler_theory.py.
    # 0.0 = reference semantics.  Only meaningful with predict="x0"
    # (the eps target is the noise; dropping the signal distorts its
    # optimum) — the trainer rejects it under predict="eps".
    x0_leak_drop: float = 0.0

    @property
    def num_steps(self) -> int:
        return len(self.noise_schedule)


@dataclass(frozen=True)
class ExperimentConfig:
    """One experiment = one of the reference's ``conf/*.yml`` files."""

    train: TrainConfig = field(default_factory=TrainConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    model_ddpm: Optional[ModelConfig] = None
    optim: OptimConfig = field(default_factory=OptimConfig)
    optim_ddpm: Optional[OptimConfig] = None
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)


@dataclass(frozen=True)
class RunConfig:
    """CLI run flags (reference ``main.py:23-36``)."""

    seed: int = 1234
    trainer: str = "ComplexDDPMTrainer"
    config: str = "diff.yml"
    doc: str = "diff"
    assets: str = "assets_dpm"
    generate: bool = False
    retrain: bool = False
    joint: bool = False
    eval: bool = False
    sigma: bool = False
    noisy: bool = False
    draw: bool = False
    # capture a jax.profiler trace of the first N train steps into
    # <log_dir>/trace (0 = off); TPU-native observability beyond the
    # reference's wandb dashboards
    profile_steps: int = 0
    # paths derived as in main.py:37-40
    data_root: str = "data"

    @property
    def log_dir(self) -> str:
        return f"{self.assets}/log/{self.doc}"

    @property
    def checkpoint_dir(self) -> str:
        return f"{self.assets}/checkpoint/{self.doc}"

    @property
    def generated_wav_dir(self) -> str:
        return f"{self.assets}/wav/{self.doc}"


def _build(cls, data: dict):
    """Recursively build a dataclass from a plain dict, ignoring unknowns."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            continue
        ftype = fields[key].type
        if isinstance(value, dict):
            target = {
                "train": TrainConfig,
                "model": ModelConfig,
                "model_ddpm": ModelConfig,
                "optim": OptimConfig,
                "optim_ddpm": OptimConfig,
                "diffusion": DiffusionConfig,
            }.get(key)
            kwargs[key] = _build(target, value) if target else value
        else:
            kwargs[key] = value
        del ftype
    return cls(**kwargs)


def load_experiment(path: str) -> ExperimentConfig:
    """Load an experiment YAML (same schema as reference ``conf/*.yml``)."""
    with open(path) as f:
        raw = yaml.safe_load(f)
    return _build(ExperimentConfig, raw)


def experiment_from_dict(raw: dict) -> ExperimentConfig:
    return _build(ExperimentConfig, raw)
