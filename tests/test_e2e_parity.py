"""End-to-end pipeline parity vs the executed reference.

The single system-level parity proof (round-1 verdict item 1): run the
reference's full enhancement chain
(``trainer/complex_ddpm_trainer.py:903-1018``: RMS -> stft -> sqrt
compress -> prior -> /c -> 6-step fast reverse loop -> +x_init -> *c ->
decompress -> istft -> de-RMS) in torch with the reference's own
models and ``inference_schedule``, and our production
``ComplexDDPMTrainer.enhance_batch`` on the *same wav*, with the *same
transplanted weights* and the *same initial noise draw*, then compare
output waveforms within float32 tolerance.

The reverse chain is deterministic after the initial draw (the
``new_sigma`` collapse quirk, SURVEY 2.9), so injecting one shared
x_T ~ N(0, I) makes the two systems bit-comparable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_env():
    """Import the reference package with its heavy/absent deps stubbed
    (wandb/librosa/soundfile/pesq/pystoi) so the trainer module loads."""
    sys.path.insert(0, REF)
    stubs = {
        "ptflops": {"get_model_complexity_info": None},
        "soundfile": {"write": None},
        "librosa": {"load": None},
        "librosa.display": {},
        "pesq": {"pesq": None, "PesqError": Exception},
        "joblib": {"Parallel": None, "delayed": None},
        "pystoi": {},
        "pystoi.stoi": {"stoi": None},
        "wandb": {"init": lambda **k: None, "watch": lambda *a, **k: None,
                  "log": lambda *a, **k: None},
    }
    for name, attrs in stubs.items():
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    # `import librosa.display` requires the parent to expose the child
    sys.modules["librosa"].display = sys.modules["librosa.display"]
    import torch

    torch.manual_seed(0)
    yield torch
    sys.path.remove(REF)


def _reference_enhance(torch, dis, ddpm, wav, x_noise, sigma: bool):
    """Execute the reference enhancement chain (:920-1016) on one wav.

    ``x_noise`` [1, 2, T, F] replaces the ``torch.randn_like`` initial
    draw (:950); everything else follows the reference line-for-line in
    behavior (pirorgrad mode, sqrt compression, c=11, gamma[0]=0.2).
    """
    from trainer.complex_ddpm_trainer import ComplexDDPMTrainer as RefTrainer
    from utils.params import params as ref_params

    shell = object.__new__(RefTrainer)
    shell.params = ref_params
    alpha, beta, alpha_cum, sigmas, T = RefTrainer.inference_schedule(
        shell, fast_sampling=True
    )

    c = np.sqrt(np.sum(wav**2) / len(wav))
    feat_wav = torch.FloatTensor(wav / c)
    feat_x = torch.stft(
        feat_wav, n_fft=320, hop_length=160, win_length=320,
        window=torch.hann_window(320), return_complex=False,
    ).permute(2, 1, 0)
    feat_phase = torch.atan2(feat_x[-1], feat_x[0])
    feat_mag = torch.norm(feat_x, dim=0) ** 0.5  # feat_type == sqrt
    feat_x = torch.stack(
        (feat_mag * torch.cos(feat_phase), feat_mag * torch.sin(feat_phase)),
        dim=0,
    )
    batch_feat = feat_x.unsqueeze(0)

    with torch.no_grad():
        init_audio = dis(batch_feat) / 11.0
        audio = x_noise.clone()
        if sigma:
            tmp = torch.flatten(torch.abs(init_audio), start_dim=2)
            tmp = tmp / torch.max(tmp, dim=2, keepdim=True).values
            tmp = tmp / 2 + 0.5
            mask = tmp.view(batch_feat.shape)
            audio = audio * mask**0.5
        gamma = [s for s in sigmas]
        gamma[0] = 0.2
        for n in range(len(alpha) - 1, -1, -1):
            c1 = 1 / alpha[n] ** 0.5
            c2 = beta[n] / (1 - alpha_cum[n]) ** 0.5
            eps = ddpm(audio, init_audio,
                       torch.tensor([T[n]]).repeat(audio.shape[0]))
            audio = c1 * (audio - c2 * eps)
            if n > 0:
                newsigma = max(0, gamma[n] - c1 * gamma[n])  # quirk: == 0
                noise = torch.randn_like(audio)
                if sigma:
                    noise = noise * mask**0.5
                audio = audio + newsigma * noise
        audio = (audio + init_audio) * 11.0
        esti = audio.squeeze(0)
        esti_mag = torch.norm(esti, dim=0) ** 2  # de-compress sqrt
        esti_phase = torch.atan2(esti[-1], esti[0])
        esti_com = torch.stack(
            (esti_mag * torch.cos(esti_phase), esti_mag * torch.sin(esti_phase)),
            dim=0,
        )
        t_esti = torch.istft(
            torch.complex(esti_com[0], esti_com[1]).permute(1, 0),
            n_fft=320, hop_length=160, win_length=320,
            window=torch.hann_window(320), length=len(wav),
        ).numpy()
    return t_esti * c


@pytest.mark.parametrize("sigma", [False, True])
def test_pipeline_parity_transplanted_weights(ref_env, rng, tmp_path, sigma):
    torch = ref_env
    from model.diff import DiffUNet as TorchDiffUNet
    from model.diff3 import DiffUNet1 as TorchDiffUNet1
    from utils.params import params as ref_params

    import jax
    import jax.numpy as jnp

    from test_transplant import _c2d, _lin, _np, _unet_core
    from prior_diffuse_tpu.config import (
        DiffusionConfig, ExperimentConfig, ModelConfig, OptimConfig,
        RunConfig, TrainConfig,
    )
    from prior_diffuse_tpu.data import synthetic
    from prior_diffuse_tpu.training import ComplexDDPMTrainer

    # --- torch reference models (random weights become the shared truth)
    t_dis = TorchDiffUNet().eval()
    t_ddpm = TorchDiffUNet1(ref_params).eval()

    dis_params, dis_stats = _unet_core(t_dis, time_cond=False)
    ddpm_core, ddpm_stats = _unet_core(t_ddpm, time_cond=True)
    ddpm_params = {
        "core": ddpm_core,
        "preprocess": {"kernel": _c2d(_np(t_ddpm.preprocess.conv.weight)),
                       "bias": _np(t_ddpm.preprocess.conv.bias)},
        "time_embedding": {
            "proj1": {"kernel": _lin(_np(t_ddpm.time_embedding.projection1.weight)),
                      "bias": _np(t_ddpm.time_embedding.projection1.bias)},
            "proj2": {"kernel": _lin(_np(t_ddpm.time_embedding.projection2.weight)),
                      "bias": _np(t_ddpm.time_embedding.projection2.bias)},
        },
    }

    # --- our production trainer, state overwritten with the transplant
    corpus = synthetic.write_corpus(
        str(tmp_path / "corpus"), n_train=2, n_test=2,
        min_len=6000, max_len=9000, seed=0,
    )
    exp = ExperimentConfig(
        train=TrainConfig(batch_size=2, n_epochs=1, loss="com_mse_loss",
                          chunk_length=4800),
        model=ModelConfig("DiffUNet"),
        optim=OptimConfig(), optim_ddpm=OptimConfig(lr=2e-4),
        diffusion=DiffusionConfig(),
    )
    run = RunConfig(assets=str(tmp_path / "assets"), doc="e2e",
                    data_root=corpus, sigma=sigma)
    tr = ComplexDDPMTrainer(run, exp)
    cast = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    state = dict(tr.state)
    state["dis"] = {"params": cast({"core": dis_params}),
                    "batch_stats": cast({"core": dis_stats})}
    state["ddpm"] = {"params": cast(ddpm_params),
                     "batch_stats": cast({"core": ddpm_stats})}
    tr.state = tr.put_replicated(state)

    # --- one wav, bucket-aligned so serving adds no padding
    wav = synthetic.make_utterance(np.random.default_rng(5), 16000,
                                   snr_db=5.0)[0].astype(np.float32)
    c = np.sqrt(np.sum(wav.astype(np.float64) ** 2) / len(wav))
    rng_serve = jax.random.PRNGKey(17)
    ours = np.asarray(tr.enhance_batch((wav / c)[None], rng_serve))[0] * c

    # recover the exact initial noise enhance_batch drew inside
    # reverse_sample (init_rng = split(rng)[0]) and hand it to torch
    n_frames = len(wav) // 160 + 1
    init_rng = jax.random.split(rng_serve)[0]
    x0 = np.asarray(jax.random.normal(init_rng, (1, n_frames, 161, 2)))
    x0_t = ref_env.from_numpy(np.moveaxis(x0, -1, 1).copy())

    theirs = _reference_enhance(torch, t_dis, t_ddpm, wav, x0_t, sigma)

    diff = float(np.max(np.abs(ours - theirs)))
    scale = float(np.max(np.abs(theirs)) + 1e-12)
    print(f"\ne2e waveform parity (sigma={sigma}): max|diff| = {diff:.3e} "
          f"(max|ref| = {scale:.3e})")
    assert diff < 2e-3 * max(1.0, scale), (
        f"end-to-end waveform mismatch: {diff}"
    )
