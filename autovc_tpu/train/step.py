"""The jitted train step — the framework's hot loop.

Loss formulas per variant follow the reference solver exactly
(solver_encoder.py:227-290), with the documented fixes:
- content-consistency encode runs on the postnet output (spmel/stft) /
  reconstructed waveform (wav), in train mode, updating batch stats like the
  reference's second forward does (solver_encoder.py:235,274)
- the wav-branch SI-SNR uses the eps-stabilized form (losses.si_snr_loss)
- EMA is a real per-step decay (state.ema_update)

Parallelism: the step is jit-compiled with GSPMD shardings — batch over the
'data' mesh axis, params replicated (or TP-sharded over 'model'); XLA inserts
the gradient all-reduce over ICI. Donated state avoids double-buffering the
~28.5M params in HBM.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from autovc_tpu.config import Config
from autovc_tpu.losses import l1, mse, si_snr_loss
from autovc_tpu.train import schedule as sched
from autovc_tpu.train.state import TrainState, ema_update


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam(lr) over all params (solver_encoder.py:130), with the LR exposed
    as an injected hyperparameter so Cosine/Plateau scaling composes."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.train.lr)


def loss_fn(model, cfg: Config, params, batch_stats, x, emb, train: bool = True,
            spk=None):
    """Returns (total_loss, (metrics, new_batch_stats)).

    spk: optional (dvector_model, dvector_params) pair enabling the
    speaker-consistency auxiliary (cfg.train.lambda_spk): the batch is
    cross-converted within itself (embeddings rolled by one), the postnet
    output re-embedded by the FROZEN d-vector encoder, and a cosine loss
    pulls the conversion toward its target embedding. The encoder's params
    are captured constants — no gradient flows into it.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    mt = cfg.model.model_type

    if mt in ("spmel", "stft"):
        (x_identic, x_psnt, codes), upd = model.apply(
            variables, x, emb, emb, train=train, mutable=["batch_stats"] if train else []
        )
        g_loss_id = mse(x, x_identic)
        g_loss_id_psnt = mse(x, x_psnt)
        # second forward (content consistency) continues from updated stats
        variables2 = {"params": params, "batch_stats": upd["batch_stats"] if train else batch_stats}
        code_reconst, upd2 = model.apply(
            variables2, x_psnt, emb, train=train,
            method=type(model).encode,
            mutable=["batch_stats"] if train else [],
        )
        g_loss_cd = l1(codes, code_reconst)
        total = g_loss_id + g_loss_id_psnt + cfg.train.lambda_cd * g_loss_cd
        metrics = {
            "g_loss": total,
            "g_loss_id": g_loss_id,
            "g_loss_id_psnt": g_loss_id_psnt,
            "g_loss_cd": g_loss_cd,
        }
        if spk is not None and cfg.train.lambda_spk > 0:
            assert mt == "spmel", "lambda_spk requires mel-domain outputs"
            dvec_model, dvec_params = spk
            emb_trg = jnp.roll(emb, 1, axis=0)  # within-batch cross-pairs
            x_conv = model.apply(
                variables, x, emb, emb_trg, train=False
            )[1]  # postnet output, eval-mode BN (running stats, no mutation)
            e_conv = dvec_model.apply({"params": dvec_params}, x_conv)
            e_trg = emb_trg / (
                jnp.linalg.norm(emb_trg, axis=-1, keepdims=True) + 1e-8
            )
            g_loss_spk = jnp.mean(1.0 - jnp.sum(e_conv * e_trg, axis=-1))
            total = total + cfg.train.lambda_spk * g_loss_spk
            metrics = dict(metrics, g_loss=total, g_loss_spk=g_loss_spk)
        new_stats = upd2["batch_stats"] if train else batch_stats
        return total, (metrics, new_stats)

    if mt == "wav":
        (lat, x_identic, x_dec, codes), upd = model.apply(
            variables, x, emb, emb, train=train, mutable=["batch_stats"] if train else []
        )
        g_loss_id = mse(x, x_identic)
        g_loss_gen = mse(lat, x_dec)
        variables2 = {"params": params, "batch_stats": upd["batch_stats"] if train else batch_stats}
        code_reconst, upd2 = model.apply(
            variables2, x_identic, emb, train=train,
            method=type(model).encode,
            mutable=["batch_stats"] if train else [],
        )
        g_loss_cd = l1(codes, code_reconst)
        g_loss_sisnr = si_snr_loss(x_identic[..., 0], x[..., 0])
        total = (
            g_loss_id
            + cfg.train.lambda_sisnr * g_loss_sisnr
            + g_loss_gen
            + cfg.train.lambda_cd * g_loss_cd
        )
        metrics = {
            "g_loss": total,
            "g_loss_id": g_loss_id,
            "g_loss_gen": g_loss_gen,
            "g_loss_cd": g_loss_cd,
            "g_loss_sisnr": g_loss_sisnr,
        }
        new_stats = upd2["batch_stats"] if train else batch_stats
        return total, (metrics, new_stats)

    raise ValueError(f"unknown model_type {mt!r}")


def make_train_step(
    model, cfg: Config, optimizer: optax.GradientTransformation, spk=None
) -> Callable:
    """Build the jitted step: (state, x, emb, lr_scale) -> (state, metrics).

    spk: optional (dvector_model, dvector_params) for the lambda_spk
    speaker-consistency auxiliary (see loss_fn)."""

    use_cosine = cfg.train.lr_scheduler == "Cosine"
    use_cosine_decay = cfg.train.lr_scheduler == "CosineDecay"

    def step_fn(state: TrainState, x, emb, lr_scale):
        (_, (metrics, new_stats)), grads = jax.value_and_grad(
            lambda p: loss_fn(
                model, cfg, p, state.batch_stats, x, emb, spk=spk
            ),
            has_aux=True,
        )(state.params)

        # learning rate: base * (cosine(step) if enabled) * host scale (plateau)
        scale = lr_scale
        if use_cosine:
            scale = scale * sched.cosine_annealing(state.step, cfg.train.cosine_t_max)
        if use_cosine_decay:
            scale = scale * sched.cosine_decay(
                state.step, cfg.train.num_iters, cfg.train.cosine_eta_min_ratio
            )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = cfg.train.lr * scale

        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, cfg.train.ema_decay)
        metrics = dict(
            metrics, lr=cfg.train.lr * scale, grad_norm=optax.global_norm(grads)
        )
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                ema_params=ema,
            ),
            metrics,
        )

    return step_fn


def make_eval_loss(model, cfg: Config) -> Callable:
    """Jittable eval-mode loss (running-average BN), for validation."""

    @functools.partial(jax.jit)
    def eval_fn(params, batch_stats, x, emb):
        _, (metrics, _) = loss_fn(model, cfg, params, batch_stats, x, emb, train=False)
        return metrics

    return eval_fn
