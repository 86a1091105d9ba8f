"""ComplexTrainer — dis-model-only training in the complex domain
(GCRN / DB-AIAT priors).

Re-design of ``trainer/complex_trainer.py:14-246``: same epoch /
eval / LR-halving / checkpoint scaffold, loss from the experiment
config, per-epoch compare_complex metrics; train step is one jit with
donated state and on-device STFT.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prior_diffuse_tpu.config import ExperimentConfig, RunConfig
from prior_diffuse_tpu.metrics.compare import compare_complex
from prior_diffuse_tpu.registry import LOSSES, MODELS, TRAINERS
from prior_diffuse_tpu.training.base import (
    TrainerBase,
    group_grad_norms,
    spec_features,
)
from prior_diffuse_tpu.training.optim import get_lr, set_lr, torch_adam


@TRAINERS.register("ComplexTrainer")
class ComplexTrainer(TrainerBase):
    def __init__(self, run: RunConfig, exp: ExperimentConfig, mesh=None,
                 metrics_logger=None):
        super().__init__(run, exp, mesh, metrics_logger)
        cdt = (jnp.bfloat16 if self.cfg.compute_dtype in ("bfloat16", "bf16")
               else None)
        model_cls = MODELS.get(exp.model.name)
        kwargs = (
            {"dtype": cdt}
            if cdt is not None
            and "dtype" in getattr(model_cls, "__dataclass_fields__", {})
            else {}
        )
        self.model = model_cls(**kwargs)
        self.loss_fn = LOSSES.get(self.cfg.loss)

        k = jax.random.PRNGKey(run.seed)
        k_init, self.rng = jax.random.split(k)
        t_frames = self.cfg.chunk_length // self.cfg.win_shift + 1
        dummy = jnp.zeros((1, t_frames, self.cfg.freq_bins, 2))
        self.tx = torch_adam(exp.optim.lr, exp.optim.l2)

        # one jitted program for model init + optimizer init: eager
        # init is one high-latency RPC per layer op on the tunneled PJRT
        def _build_state(k_init, dummy):
            variables = self.model.init(k_init, dummy)
            state = {
                "model": {
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                },
            }
            state["opt"] = self.tx.init(state["model"]["params"])
            return state

        build = (jax.jit(_build_state)
                 if jax.default_backend() != "cpu" else _build_state)
        self.state = self.put_replicated(build(k_init, dummy))

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

        if run.retrain:
            restored = self.ckpt.restore_latest(self.ckpt_template())
            if restored is not None:
                self.restore_payload(restored)
                last = self.ckpt.latest_epoch()
                self.epoch = 0 if last is None else last + 1

    def _apply(self, variables, feat, train):
        out = self.model.apply(
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

    def _train_step_impl(self, state, noisy, clean, frame_nums):
        feat = spec_features(noisy, self.cfg)
        label = spec_features(clean, self.cfg)

        def loss_of(params):
            est, new_stats = self._apply(
                {"params": params, "batch_stats": state["model"]["batch_stats"]},
                feat, train=True,
            )
            est = est.astype(jnp.float32)
            return self.loss_fn(est, label, frame_nums), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["model"]["params"]
        )
        up, opt = self.tx.update(grads, state["opt"], state["model"]["params"])
        params = optax.apply_updates(state["model"]["params"], up)
        return (
            {"model": {"params": params, "batch_stats": new_stats}, "opt": opt},
            loss,
            group_grad_norms(grads, "model"),
        )

    def _eval_step_impl(self, state, noisy, clean, frame_nums):
        feat = spec_features(noisy, self.cfg)
        label = spec_features(clean, self.cfg)
        est, _ = self._apply(state["model"], feat, train=False)
        return est, label, self.loss_fn(est, label, frame_nums)

    def evaluate(self) -> float:
        losses, results = [], []
        for batch in self.cv_loader:
            noisy, clean, frames = self.put_batch(
                batch.noisy, batch.clean, batch.frame_nums
            )
            est, label, loss = self._eval_step(self.state, noisy, clean, frames)
            losses.append(float(loss))
            results.append(
                compare_complex(est, label, batch.frame_nums, self.cfg.feat_type)
            )
        self.check_cv_nonempty(losses)
        cv_loss = float(np.mean(losses))
        self.log_eval("test", cv_loss, np.mean(np.asarray(results), axis=0))
        return cv_loss

    grad_log_every = 50

    def train(self, max_epochs: Optional[int] = None,
              max_steps: Optional[int] = None):
        from prior_diffuse_tpu.utils.profiler import StepTimer

        timer = StepTimer()
        n_epochs = max_epochs or self.cfg.n_epochs
        while self.epoch < n_epochs:
            logging.info("Epoch %d", self.epoch)
            for batch in self.tr_loader:
                if max_steps is not None and self.step >= max_steps:
                    return
                noisy, clean, frames = self.put_batch(
                    batch.noisy, batch.clean, batch.frame_nums
                )
                self.state, loss, gnorms = self._train_step(
                    self.state, noisy, clean, frames
                )
                loss = float(loss)
                dt = timer.tick()
                self.check_nan(loss)
                rec = {"train_batch_loss": loss}
                if dt is not None:
                    rec["step_time_ms"] = dt * 1e3
                    rec["utt_per_sec"] = self.cfg.batch_size / dt
                if self.step % self.grad_log_every == 0:
                    rec.update({k: float(v) for k, v in gnorms.items()})
                self.metrics.log(rec, step=self.step)
                self.step += 1
            cv_loss = self.evaluate()
            halve, stop, is_best = self.plateau.update(cv_loss)
            if halve:
                lr = get_lr(self.state["opt"]) / 2.0
                self.state["opt"] = set_lr(self.state["opt"], lr)
                logging.info("Learning rate adjusted to %f", lr)
            payload = self.ckpt_payload()
            if is_best:
                self.ckpt.save_best(payload)
            self.ckpt.save_epoch(self.epoch, payload)
            self.epoch += 1
            if stop:
                logging.info("No improvement and apply early stop")
                break

    # parity alias (main.py dispatches train_ddpm on every trainer)
    train_ddpm = train

    def load_best(self):
        restored = self.ckpt.restore_best(self.ckpt_template())
        if restored is not None:
            self.restore_payload(restored)
        return restored is not None

    def enhance_batch(self, noisy_padded, rng):
        if not hasattr(self, "_enhance_jit"):
            from prior_diffuse_tpu.signal.compress import decompress_spec
            from prior_diffuse_tpu.signal.stft import istft

            def impl(state, wav):
                cfg = self.cfg
                feat = spec_features(wav, cfg)
                est, _ = self._apply(state["model"], feat, train=False)
                spec = decompress_spec(est, cfg.feat_type)
                return istft(spec, length=wav.shape[-1],
                             fft_num=cfg.fft_num, win_size=cfg.win_size,
                             win_shift=cfg.win_shift)

            self._enhance_jit = jax.jit(impl)
        wav = self.put_batch(noisy_padded)[0]
        return self._enhance_jit(self.state, wav)

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
