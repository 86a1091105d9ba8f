"""ComplexDDPMTrainer — the full Prior-DiffuSE system.

Re-design of the reference trainer (``trainer/complex_ddpm_trainer.py:23``):
discriminative prior + residual DDPM, joint or DDPM-only training, with
per-epoch full reverse-sampling evaluation, LR-halving on plateau for
both optimizers, early stop, and best/per-epoch checkpointing.

Functional core differences from the reference (deliberate, TPU-first):

* the whole train step — STFT, compression, both model forwards,
  q-sample, loss, backward, both optimizer updates — is **one jit**
  with donated state;
* in joint mode the reference runs the dis forward twice (once for the
  loss, once detached, ``trainer/complex_ddpm_trainer.py:666-669``); we
  run it once and ``stop_gradient`` the conditioning — identical math
  and gradients, half the dis FLOPs (only the BN running-stat double
  update is dropped);
* the 6-step reverse sampling eval is a single ``lax.scan`` jit instead
  of a Python loop of device calls.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prior_diffuse_tpu.config import ExperimentConfig, RunConfig
from prior_diffuse_tpu.diffusion import (
    inference_schedule,
    make_schedule,
    q_sample,
    reverse_sample,
    sigma_mask,
)
from prior_diffuse_tpu.losses import com_mse_loss, com_mse_sigma_loss
from prior_diffuse_tpu.models.fused_forward import dual_train_forward
from prior_diffuse_tpu.metrics.compare import compare_complex
from prior_diffuse_tpu.registry import LOSSES, MODELS, TRAINERS
from prior_diffuse_tpu.training.base import (
    TrainerBase,
    group_grad_norms,
    spec_features,
)
from prior_diffuse_tpu.training.optim import get_lr, set_lr, torch_adam


def _resolve_fused(env: str, serve_dtype) -> str:
    """Serving-formulation selection (measurement-driven defaults):
    empty env -> ``dual`` for non-f32 serving (1.53x on the decoder
    segment, docs/PERF_fwdsplit_r4.json), flax for f32 (exact reference
    numerics); ``flax`` forces the flax path; anything else passes
    through (``xla``/``pallas``/``dual``)."""
    if env == "flax":
        return ""
    if not env:
        return "" if serve_dtype == jnp.float32 else "dual"
    return env


def _mode(diff_cfg) -> str:
    if diff_cfg.pirorgrad:
        return "pirorgrad"
    if diff_cfg.deltamu:
        return "deltamu"
    return "conditional"


@TRAINERS.register("ComplexDDPMTrainer")
class ComplexDDPMTrainer(TrainerBase):
    # per-group grad norms go to the JSONL metrics every N steps (the
    # reference's wandb.watch analog); the norms are computed inside the
    # train-step jit either way, this only gates host-side logging
    grad_log_every = 50

    def __init__(self, run: RunConfig, exp: ExperimentConfig, mesh=None,
                 metrics_logger=None):
        super().__init__(run, exp, mesh, metrics_logger)
        diff = exp.diffusion
        self.mode = _mode(diff)
        # cond_noisy extension (see DiffusionConfig): widen the pirorgrad
        # conditioner to [x_init, feat/c]; meaningless in the other modes
        # (conditional already sees feat, deltamu is unconditional)
        if diff.cond_noisy and self.mode != "pirorgrad":
            raise ValueError("cond_noisy requires pirorgrad mode")
        self.cond_noisy = bool(diff.cond_noisy)
        # predict="x0" extension (see DiffusionConfig): the net regresses
        # the clean-side target instead of the noise; deltamu has no
        # clean x0 target (its noise term mixes in x_init, qsample.py)
        if diff.predict not in ("eps", "x0"):
            raise ValueError(f"unknown predict {diff.predict!r}")
        if diff.predict == "x0" and self.mode == "deltamu":
            raise ValueError("predict='x0' is unsupported in deltamu mode")
        self.predict = diff.predict
        # x0_leak_drop extension (see DiffusionConfig): train-time
        # attenuation of x_t's signal content, closing the x0
        # objective's identity leak; meaningless for the eps target
        self.x0_leak_drop = float(getattr(diff, "x0_leak_drop", 0.0))
        if self.x0_leak_drop and self.predict != "x0":
            raise ValueError("x0_leak_drop requires predict='x0'")
        if not 0.0 <= self.x0_leak_drop <= 1.0:
            raise ValueError("x0_leak_drop must be in [0, 1]")
        self.c = diff.scale_c
        self.sched = make_schedule(diff)
        self.alpha_bar = jnp.asarray(self.sched.alpha_bar, jnp.float32)
        self.num_steps = diff.num_steps
        # train_t_fast extension (see DiffusionConfig): q-sample draws
        # from the fast schedule's aligned (T, alpha_bar) pairs
        if diff.train_t_fast:
            inf = inference_schedule(diff, fast_sampling=True)
            self.t_grid = jnp.asarray(inf.T, jnp.float32)
            self.ab_grid = jnp.asarray(inf.alpha_cum, jnp.float32)
        else:
            self.t_grid = self.ab_grid = None

        cdt = (jnp.bfloat16 if self.cfg.compute_dtype in ("bfloat16", "bf16")
               else None)
        self.cdt = cdt
        # Train-mode forwards through the block-diagonal dual decoder
        # (models/fused_forward.py::dual_train_forward).  Chip-measured
        # at the recommended batch-8 bf16 config
        # (docs/PERF_fusedtrain_r4.json): the full donated train step
        # wins 1.37x (70.2 -> 51.4 ms, value_and_grad segment 1.41x),
        # so bf16 training — already the non-exact fast path — defaults
        # to it, mirroring the bf16 serving adoption
        # (docs/PERF_fwdsplit_r4.json).  f32 keeps the exact flax path.
        # PDT_FUSED_TRAIN=dual|flax overrides either way.  Only batch 8
        # is chip-measured; batch-6 bf16 is a known bad tiling regime
        # (vmapped branch-doubling LOST there, docs/PERF_r4_notes.md) —
        # for b6 bf16 prefer PDT_FUSED_TRAIN=flax until measured.
        # Unlike serving's _resolve_fused (an open formulation registry),
        # train has exactly two paths, so typos raise instead of
        # silently selecting flax.
        _ft_env = os.environ.get("PDT_FUSED_TRAIN", "")
        if _ft_env not in ("", "dual", "flax"):
            raise ValueError(
                f"PDT_FUSED_TRAIN={_ft_env!r}: expected 'dual', 'flax', "
                "or unset (train has only the dual and flax paths)"
            )
        self.fused_train = (_ft_env == "dual" if _ft_env
                            else cdt is not None)
        dis_cls = MODELS.get(exp.model.name)
        dis_kwargs = (
            {"dtype": cdt}
            if cdt is not None
            and "dtype" in getattr(dis_cls, "__dataclass_fields__", {})
            else {}
        )
        self.dis_model = dis_cls(**dis_kwargs)
        # DDPM net is mode-determined, not config-named — the reference
        # ignores conf model_ddpm.name (trainer/complex_ddpm_trainer.py:70-75)
        ddpm_name = "Nocon" if self.mode == "deltamu" else "DiffUNet1"
        ddpm_kwargs = {"dtype": cdt} if cdt is not None else {}
        self.ddpm_model = MODELS.get(ddpm_name)(num_steps=self.num_steps,
                                                **ddpm_kwargs)
        self.loss_fn = LOSSES.get(self.cfg.loss)

        # init params
        k = jax.random.PRNGKey(run.seed)
        k_dis, k_ddpm, self.rng = jax.random.split(k, 3)
        t_frames = self.cfg.chunk_length // self.cfg.win_shift + 1
        dummy = jnp.zeros((1, t_frames, self.cfg.freq_bins, 2))
        self.tx_dis = torch_adam(exp.optim.lr, exp.optim.l2)
        opt_ddpm_cfg = exp.optim_ddpm or exp.optim
        self.tx_ddpm = torch_adam(opt_ddpm_cfg.lr, opt_ddpm_cfg.l2)

        # The whole initial state (both model inits + both optimizer
        # inits) is ONE jitted program: eager flax init / optax init
        # dispatch every layer op as its own device RPC — minutes on
        # the tunneled PJRT — while this is a single call whose outputs
        # are born on-device (no host round trip at all).
        def _build_state(k_dis, k_ddpm, dummy):
            dis_vars = self.dis_model.init(k_dis, dummy)
            if self.mode == "deltamu":
                ddpm_vars = self.ddpm_model.init(k_ddpm, dummy,
                                                 jnp.zeros((1,)))
            else:
                cond_dummy = (jnp.concatenate([dummy, dummy], axis=-1)
                              if self.cond_noisy else dummy)
                ddpm_vars = self.ddpm_model.init(k_ddpm, dummy, cond_dummy,
                                                 jnp.zeros((1,)))
            state = {
                "dis": {
                    "params": dis_vars["params"],
                    "batch_stats": dis_vars.get("batch_stats", {}),
                },
                "ddpm": {
                    "params": ddpm_vars["params"],
                    "batch_stats": ddpm_vars.get("batch_stats", {}),
                },
            }
            state["opt_dis"] = self.tx_dis.init(state["dis"]["params"])
            state["opt_ddpm"] = self.tx_ddpm.init(state["ddpm"]["params"])
            return state

        build = (jax.jit(_build_state)
                 if jax.default_backend() != "cpu" else _build_state)
        self.state = self.put_replicated(build(k_dis, k_ddpm, dummy))

        self._train_step = jax.jit(
            partial(self._train_step_impl, joint=run.joint, sigma=run.sigma),
            static_argnames=("joint", "sigma"),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            partial(self._eval_step_impl, sigma=run.sigma),
            static_argnames=("sigma",),
        )
        # Seeded step: derives the per-step PRNG *inside* the jit from the
        # host step counter, so a training loop needs zero extra
        # host<->device round trips per step (a host-side
        # jax.random.split is a device call; on this tunneled PJRT each
        # call costs real latency — see CLAUDE.md timing notes).
        self._seed_base = jax.random.PRNGKey(run.seed ^ 0x5EED)
        self._train_step_seeded = jax.jit(
            partial(self._train_step_seeded_impl, joint=run.joint,
                    sigma=run.sigma),
            static_argnames=("joint", "sigma"),
            donate_argnums=(0,),
        )

        if run.retrain:
            restored = self.ckpt.restore_latest(self.ckpt_template())
            if restored is not None:
                self.restore_payload(restored)
                last = self.ckpt.latest_epoch()
                self.epoch = 0 if last is None else last + 1
                logging.info("resumed at epoch %d (step %d)",
                             self.epoch, self.step)

    # ---- functional cores -------------------------------------------------
    def _cond(self, feat_sc, x_init):
        """DDPM conditioner: noisy spectrum (conditional mode), x_init
        (pirorgrad, reference trainer/complex_ddpm_trainer.py:731), or
        the concat of both (cond_noisy extension)."""
        if self.mode == "conditional":
            return feat_sc
        if self.cond_noisy:
            return jnp.concatenate(
                [x_init, feat_sc.astype(x_init.dtype)], axis=-1)
        return x_init

    def _dis_apply(self, variables, feat, train):
        if train and self.fused_train and type(self.dis_model).__name__ == "DiffUNet":
            return dual_train_forward(variables, feat, dtype=self.cdt)
        out = self.dis_model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            feat,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            y, updated = out
            return y, updated.get("batch_stats", variables["batch_stats"])
        return out, variables["batch_stats"]

    def _ddpm_apply(self, variables, x, x_init, t, train):
        if train and self.fused_train:
            return dual_train_forward(
                variables, x, None if self.mode == "deltamu" else x_init,
                t, num_steps=self.num_steps, dtype=self.cdt)
        args = (x, t) if self.mode == "deltamu" else (x, x_init, t)
        out = self.ddpm_model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            *args,
            train=train,
            mutable=["batch_stats"] if train else False,
        )
        if train:
            y, updated = out
            return y, updated.get("batch_stats", variables["batch_stats"])
        return out, variables["batch_stats"]

    def _train_step_impl(self, state, noisy, clean, frame_nums, rng,
                         *, joint: bool, sigma: bool):
        cfg = self.cfg
        feat = spec_features(noisy, cfg)
        label = spec_features(clean, cfg)

        def loss_of(params):
            dis_vars = {"params": params["dis"],
                        "batch_stats": state["dis"]["batch_stats"]}
            dis_out, new_dis_stats = self._dis_apply(dis_vars, feat, train=True)
            dis_out = dis_out.astype(jnp.float32)
            if joint:
                loss_dis = self.loss_fn(dis_out, label, frame_nums)
            else:
                loss_dis = jnp.float32(0.0)
            x_init = jax.lax.stop_gradient(dis_out) / self.c
            lbl = label / self.c
            sig = sigma_mask(x_init) if sigma else None
            x_t, noise, t = q_sample(
                rng, lbl, x_init, self.alpha_bar, self.num_steps,
                self.mode, sig, t_grid=self.t_grid, ab_grid=self.ab_grid,
                leak_drop=self.x0_leak_drop,
            )
            ddpm_vars = {"params": params["ddpm"],
                         "batch_stats": state["ddpm"]["batch_stats"]}
            cond = self._cond(feat / self.c, x_init)
            pred, new_ddpm_stats = self._ddpm_apply(
                ddpm_vars, x_t, cond, t, train=True
            )
            pred = pred.astype(jnp.float32)
            if self.predict == "x0":
                # regression target is the chain's clean-side quantity:
                # the residual in pirorgrad mode (what the sampler adds
                # back onto x_init), the clean spectrum in conditional
                # mode.  Same sigma-weighting as the eps objective.
                target = lbl - x_init if self.mode == "pirorgrad" else lbl
            else:
                target = noise
            if sigma:
                loss_ddpm = com_mse_sigma_loss(pred, target, frame_nums, sig)
            else:
                loss_ddpm = self.loss_fn(pred, target, frame_nums)
            total = cfg.lam * loss_ddpm + loss_dis
            return total, (loss_dis, loss_ddpm, new_dis_stats, new_ddpm_stats)

        params = {"dis": state["dis"]["params"], "ddpm": state["ddpm"]["params"]}
        (total, (loss_dis, loss_ddpm, dis_stats, ddpm_stats)), grads = (
            jax.value_and_grad(loss_of, has_aux=True)(params)
        )

        up_ddpm, opt_ddpm = self.tx_ddpm.update(
            grads["ddpm"], state["opt_ddpm"], params["ddpm"]
        )
        new_ddpm = optax.apply_updates(params["ddpm"], up_ddpm)
        if joint:
            up_dis, opt_dis = self.tx_dis.update(
                grads["dis"], state["opt_dis"], params["dis"]
            )
            new_dis = optax.apply_updates(params["dis"], up_dis)
        else:
            opt_dis = state["opt_dis"]
            new_dis = params["dis"]

        new_state = {
            "dis": {"params": new_dis, "batch_stats": dis_stats},
            "ddpm": {"params": new_ddpm, "batch_stats": ddpm_stats},
            "opt_dis": opt_dis,
            "opt_ddpm": opt_ddpm,
        }
        gnorms = {
            **group_grad_norms(grads["dis"], "dis"),
            **group_grad_norms(grads["ddpm"], "ddpm"),
        }
        return new_state, total, loss_dis, loss_ddpm, gnorms

    def _train_step_seeded_impl(self, state, noisy, clean, frame_nums, step,
                                *, joint: bool, sigma: bool):
        rng = jax.random.fold_in(self._seed_base, step)
        return self._train_step_impl(state, noisy, clean, frame_nums, rng,
                                     joint=joint, sigma=sigma)

    def _eval_step_impl(self, state, noisy, clean, frame_nums, rng,
                        *, sigma: bool):
        cfg = self.cfg
        feat = spec_features(noisy, cfg)
        label = spec_features(clean, cfg)
        x_init, _ = self._dis_apply(state["dis"], feat, train=False)
        x_init = x_init / self.c
        feat_sc = feat / self.c
        sig = sigma_mask(x_init) if sigma else None
        sched = inference_schedule(self.exp.diffusion)
        cond = self._cond(feat_sc, x_init)

        def model_fn(x, t):
            eps, _ = self._ddpm_apply(state["ddpm"], x, cond, t, train=False)
            return eps

        audio = reverse_sample(
            model_fn, rng, x_init, x_init.shape, sched, self.mode, sig,
            n_avg=self.exp.diffusion.n_avg,
            zero_init=self.exp.diffusion.zero_init,
            predict=self.predict,
        )
        audio = audio * self.c
        loss = com_mse_loss(audio, label, frame_nums)

        # Residual-DDPM health diagnostics (logged every eval): the DDPM's
        # regression target is the true residual r_true = label/c - x_init
        # (reference trainer/complex_ddpm_trainer.py:726); r_samp is what
        # the sampler actually adds.  The chain helps iff
        # chain_mse (== loss) < prior_mse; energy calibration and cosine
        # say *how* it fails when it fails (noise injection vs wrong
        # direction).
        r_true = label / self.c - x_init
        r_samp = audio / self.c - x_init
        t_idx = jnp.arange(r_true.shape[1])[None, :]
        m = (t_idx < frame_nums[:, None]).astype(jnp.float32)[:, :, None, None]
        n_valid = jnp.sum(m) * r_true.shape[2] * r_true.shape[3]
        e_true = jnp.sum((r_true * m) ** 2) / n_valid
        e_samp = jnp.sum((r_samp * m) ** 2) / n_valid
        cos = jnp.sum(r_samp * r_true * m) / jnp.sqrt(
            jnp.sum((r_samp * m) ** 2) * jnp.sum((r_true * m) ** 2) + 1e-20
        )
        diag = {
            "prior_mse": com_mse_loss(x_init * self.c, label, frame_nums),
            "res_energy_true": e_true,
            "res_energy_sampled": e_samp,
            "res_cos": cos,
        }
        return audio, label, loss, diag

    # ---- drivers ----------------------------------------------------------
    def evaluate(self) -> float:
        losses, results, diags = [], [], []
        for batch in self.cv_loader:
            self.rng, step_rng = jax.random.split(self.rng)
            noisy, clean, frames = self.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            audio, label, loss, diag = self._eval_step(
                self.state, noisy, clean, frames, step_rng
            )
            losses.append(float(loss))
            diags.append({k: float(v) for k, v in diag.items()})
            results.append(
                compare_complex(audio, label, batch.frame_nums, self.cfg.feat_type)
            )
        self.check_cv_nonempty(losses)
        cv_loss = float(np.mean(losses))
        diag_mean = {
            f"test_{k}": float(np.mean([d[k] for d in diags]))
            for k in diags[0]
        }
        diag_mean["test_chain_mse"] = cv_loss
        self.metrics.log(diag_mean, step=self.step)
        logging.info(
            "residual diag: prior_mse %.5f chain_mse %.5f e_true %.6f "
            "e_samp %.6f cos %.3f",
            diag_mean["test_prior_mse"], cv_loss,
            diag_mean["test_res_energy_true"],
            diag_mean["test_res_energy_sampled"], diag_mean["test_res_cos"],
        )
        self.log_eval("test", cv_loss, np.mean(np.asarray(results), axis=0))
        return cv_loss

    def _halve_lrs(self):
        for name, tx in [("opt_dis", self.tx_dis), ("opt_ddpm", self.tx_ddpm)]:
            lr = get_lr(self.state[name]) / 2.0
            self.state[name] = set_lr(self.state[name], lr)
            logging.info("Learning rate of %s adjusted to %f", name, lr)

    def train_ddpm(self, max_epochs: Optional[int] = None,
                   max_steps: Optional[int] = None):
        """The reference's main loop (train + per-epoch sampling eval)."""
        if self.run.draw:  # draw-from-checkpoint mode (main loop skipped)
            self.draw_audio()
            return
        import os

        from prior_diffuse_tpu.utils.profiler import StepTimer, trace

        timer = StepTimer()
        profiling = None
        if self.run.profile_steps and self.step < self.run.profile_steps:
            profiling = trace(os.path.join(self.run.log_dir, "trace"))
            profiling.__enter__()
        n_epochs = max_epochs or self.cfg.n_epochs
        try:
            while self.epoch < n_epochs:
                logging.info("Epoch %d", self.epoch)
                if not self.run.eval:
                    for batch in self.tr_loader:
                        if max_steps is not None and self.step >= max_steps:
                            return
                        self.rng, step_rng = jax.random.split(self.rng)
                        noisy, clean, frames = self.put_batch(
                            batch.noisy, batch.clean, batch.frame_nums
                        )
                        self.state, total, l_dis, l_ddpm, gnorms = (
                            self._train_step(
                                self.state, noisy, clean, frames, step_rng
                            )
                        )
                        total = float(total)  # scalar readback: step complete
                        dt = timer.tick()
                        self.check_nan(total)
                        rec = {"dis_loss": float(l_dis),
                               "ddpm_loss": float(l_ddpm),
                               "loss_sum": total}
                        if dt is not None:
                            rec["step_time_ms"] = dt * 1e3
                            rec["utt_per_sec"] = self.cfg.batch_size / dt
                        if self.step % self.grad_log_every == 0:
                            rec.update(
                                {k: float(v) for k, v in gnorms.items()}
                            )
                        self.metrics.log(rec, step=self.step)
                        self.step += 1
                        if profiling and self.step >= self.run.profile_steps:
                            profiling.__exit__(None, None, None)
                            profiling = None
                cv_loss = self.evaluate()
                if self.run.eval:
                    return
                halve, stop, is_best = self.plateau.update(cv_loss)
                if halve:
                    self._halve_lrs()
                payload = self.ckpt_payload()
                if is_best:
                    logging.info("new best cv loss %.5f; saving best", cv_loss)
                    self.ckpt.save_best(payload)
                self.ckpt.save_epoch(self.epoch, payload)
                self.epoch += 1
                if stop:
                    logging.info("No improvement and apply early stop")
                    break
        finally:
            if profiling:
                profiling.__exit__(None, None, None)

    # parity alias: the reference dispatches train_ddpm from main
    train = train_ddpm

    def draw_audio(self, out_dir: Optional[str] = None, max_batches: int = 1):
        """Eval + plot path: runs reverse sampling on CV batches, writes
        per-utterance noisy/clean/init/enhanced comparison figures and
        logs the 6 metrics.

        Working replacement for the reference ``draw_audio``
        (trainer/complex_ddpm_trainer.py:158-368), which crashes on
        undefined names once it reaches its output blocks (SURVEY 2.9).
        """
        import os

        from prior_diffuse_tpu.metrics.compare import spec_batch_to_wavs
        from prior_diffuse_tpu.viz import draw_comparison

        out_dir = out_dir or os.path.join(self.run.generated_wav_dir, "draw")
        os.makedirs(out_dir, exist_ok=True)
        losses, results = [], []
        for bi, batch in enumerate(self.cv_loader):
            if bi >= max_batches:
                break
            self.rng, step_rng = jax.random.split(self.rng)
            noisy, clean, frames = self.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            audio, label, loss, _ = self._eval_step(
                self.state, noisy, clean, frames, step_rng
            )
            losses.append(float(loss))
            results.append(
                compare_complex(audio, label, batch.frame_nums, self.cfg.feat_type)
            )
            esti_wavs = spec_batch_to_wavs(audio, batch.frame_nums, self.cfg.feat_type)
            label_wavs = spec_batch_to_wavs(label, batch.frame_nums, self.cfg.feat_type)
            for i, (e, l) in enumerate(zip(esti_wavs, label_wavs)):
                n = batch.wav_lens[i]
                draw_comparison(
                    [batch.noisy[i, :n], l, e],
                    ["noisy", "clean", "enhanced"],
                    path=os.path.join(out_dir, f"draw_b{bi}_{i}.png"),
                )
        self.log_eval("draw", float(np.mean(losses)),
                      np.mean(np.asarray(results), axis=0))
        return out_dir

    # serving dtype: bfloat16 measured 2.7x faster than float32 on v5e
    # for this pipeline (47 vs 127 ms / batch-8x3s); set to jnp.bfloat16
    # to opt in (f32 default preserves exact reference numerics)
    serve_dtype = jnp.float32

    def enhance_batch(self, noisy_padded, rng):
        """Full on-device enhance of an RMS-normalized padded batch
        ``[B, L] -> [B, L]`` (wav -> STFT -> prior -> scan sampler ->
        decompress -> ISTFT), model compute in ``serve_dtype``.

        ``PDT_FUSED_ENC=pallas|xla|dual|flax`` routes the DDPM denoiser
        forwards (85 % of the batch, docs/PERF_r3.json) through the
        matmul-chain encoder (``models/fused_forward.py``); ``dual``
        additionally runs both decoder branches as one block-diagonal
        op chain (decoders are 96 % of the forward and dual is 1.53x
        faster there, docs/PERF_fwdsplit_r4.json).  Defaults: bf16
        serving (already the non-exact fast path) uses ``dual``; f32
        serving keeps the flax path for exact reference numerics.
        ``flax`` forces the flax path in any dtype."""
        fused = _resolve_fused(os.environ.get("PDT_FUSED_ENC", ""),
                               self.serve_dtype)
        if getattr(self, "_enhance_key", None) != (self.serve_dtype, fused):
            from prior_diffuse_tpu.signal.compress import decompress_spec
            from prior_diffuse_tpu.signal.stft import istft

            dt = self.serve_dtype

            def impl(state, packed, wav, rng):
                cfg = self.cfg
                feat = spec_features(wav, cfg)
                if fused and packed is not None and "dis" in packed:
                    from prior_diffuse_tpu.models.fused_forward import (
                        fused_unet_forward)

                    x_init = fused_unet_forward(
                        packed["dis"], feat.astype(dt), dtype=dt,
                        use_pallas=fused == "pallas",
                        dual_decoder=fused in ("dual", "dual2"),
                        dual_split=fused == "dual2",
                        interpret=jax.default_backend() == "cpu")
                else:
                    x_init, _ = self._dis_apply(state["dis"],
                                                feat.astype(dt),
                                                train=False)
                x_init = x_init.astype(dt) / jnp.asarray(self.c, dt)
                sig = sigma_mask(x_init) if self.run.sigma else None
                sched = inference_schedule(self.exp.diffusion)
                cond = self._cond(feat.astype(dt) / jnp.asarray(self.c, dt),
                                  x_init)

                if fused:
                    from prior_diffuse_tpu.models.fused_forward import (
                        fused_unet_forward)

                    def model_fn(x, t):
                        args = ((x.astype(dt), None)
                                if self.mode == "deltamu"
                                else (x.astype(dt), cond))
                        eps = fused_unet_forward(
                            packed["ddpm"], *args, t.astype(dt),
                            num_steps=self.ddpm_model.num_steps,
                            dtype=dt, use_pallas=fused == "pallas",
                            dual_decoder=fused in ("dual", "dual2"),
                            dual_split=fused == "dual2",
                            # CPU (tests) has no Mosaic: interpret there
                            interpret=jax.default_backend() == "cpu")
                        return eps.astype(dt)
                else:
                    def model_fn(x, t):
                        eps, _ = self._ddpm_apply(
                            state["ddpm"], x.astype(dt), cond,
                            t.astype(dt), train=False)
                        return eps.astype(dt)

                audio = reverse_sample(
                    model_fn, rng, x_init, x_init.shape, sched, self.mode,
                    sig, dtype=dt, n_avg=self.exp.diffusion.n_avg,
                    zero_init=self.exp.diffusion.zero_init,
                    predict=self.predict,
                )
                spec = decompress_spec(
                    audio.astype(jnp.float32) * self.c, cfg.feat_type
                )
                return istft(spec, length=wav.shape[-1],
                             fft_num=cfg.fft_num, win_size=cfg.win_size,
                             win_shift=cfg.win_shift)

            self._enhance_jit = jax.jit(impl)
            self._enhance_key = (dt, fused)
            self._serve_src = None
        # re-derive the serve state whenever the training state object has
        # changed (train step / load_best / restore all rebind self.state),
        # so serving never runs on stale weights
        if getattr(self, "_serve_src", None) is not self.state:
            dt = self._enhance_key[0]
            if fused:
                from prior_diffuse_tpu.models.diffunet import (
                    DiffUNet, DiffUNet1, Nocon)
                from prior_diffuse_tpu.models.fused_forward import pack_unet

                # ONE jitted pack per net: no per-leaf readbacks,
                # results stay on device and are passed as jit
                # arguments (never closed over — CLAUDE.md
                # constant-reshipping trap)
                packed = {"ddpm": jax.jit(pack_unet)(self.state["ddpm"])}
                if isinstance(self.dis_model, DiffUNet):
                    # the prior shares the UNet spine: serve it on the
                    # same measured-fast formulation
                    packed["dis"] = jax.jit(pack_unet)(self.state["dis"])
                self._serve_packed = packed
            else:
                self._serve_packed = None
            if dt != jnp.float32:
                cast = {
                    "dis": jax.tree.map(lambda p: p.astype(dt), self.state["dis"]),
                    "ddpm": jax.tree.map(lambda p: p.astype(dt), self.state["ddpm"]),
                }
                self._serve_state = {**self.state, **cast}
            else:
                self._serve_state = self.state
            self._serve_src = self.state
        wav = self.put_batch(noisy_padded)[0]
        return self._enhance_jit(self._serve_state, self._serve_packed,
                                 wav, rng)

    def load_best(self):
        restored = self.ckpt.restore_best(self.ckpt_template())
        if restored is not None:
            self.restore_payload(restored)
        return restored is not None

    def generate_wav(self, load_pre_train: bool = True,
                     data_path: Optional[str] = None,
                     out_dir: Optional[str] = None,
                     compare_after: bool = False):
        from prior_diffuse_tpu.serving.enhance import enhance_directory

        if load_pre_train:
            self.load_best()
        data_path = data_path or f"{self.run.data_root}/noisy_testset_wav"
        out_dir = out_dir or self.run.generated_wav_dir
        self.rng, rng = jax.random.split(self.rng)
        rtf = enhance_directory(self, data_path, out_dir, rng)
        if compare_after:
            # the reference's dis-only generate_wav ends with a live
            # directory comparison (trainer/complex_trainer.py:239-246)
            import numpy as np

            from prior_diffuse_tpu.metrics.compare import compare

            clean_dir = f"{self.run.data_root}/clean_testset_wav"
            res = np.mean(np.asarray(compare(clean_dir, out_dir)), axis=0)
            logging.info("ref=%s", clean_dir)
            logging.info("deg=%s", out_dir)
            logging.info(
                "csig:%6.4f cbak:%6.4f covl:%6.4f pesq:%6.4f ssnr:%6.4f stoi:%6.4f",
                *res,
            )
        return rtf
