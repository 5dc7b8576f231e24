"""Training orchestration (reference Solver, solver_encoder.py:52-421),
rebuilt around functional state + GSPMD sharding + orbax checkpointing.

Capabilities preserved: variant selection, Adam, Cosine/Plateau schedules
(bug-fixed), checkpoint every `checkpoint_step` with resume restoring
model/optimizer/step (solver_encoder.py:147-153,332-346), metrics logging,
EMA weights (real). New capabilities: multi-chip data parallelism over a
device mesh, optional tensor parallelism, async-capable orbax checkpoints.
"""

from __future__ import annotations

import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from autovc_tpu.config import Config
from autovc_tpu.models import build_generator
from autovc_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from autovc_tpu.parallel.mesh import put_global_batch
from autovc_tpu.train.metrics import MetricsLogger
from autovc_tpu.train.schedule import ReduceLROnPlateau
from autovc_tpu.train.state import TrainState, init_ema
from autovc_tpu.train.step import make_optimizer, make_train_step
from autovc_tpu.train.step import loss_fn as _loss_fn


class Solver:
    def __init__(
        self,
        cfg: Config,
        data_iter: Iterator,
        run_dir: str | None = None,
        mesh=None,
        use_wandb: bool = False,
    ):
        self.cfg = cfg
        self.data_iter = data_iter
        self.run_dir = run_dir or os.path.join(cfg.main_dir, "runs", cfg.run_name)
        os.makedirs(self.run_dir, exist_ok=True)

        self.mesh = mesh or make_mesh(
            data=cfg.train.data_parallel, model=cfg.train.model_parallel
        )
        if jax.process_count() > 1 and not any(
            d.process_index == jax.process_index()
            for d in self.mesh.devices.flat
        ):
            raise ValueError(
                f"mesh {dict(self.mesh.shape)} holds no device of process "
                f"{jax.process_index()}/{jax.process_count()} — in multi-"
                f"process runs the mesh must span every process's devices "
                f"(e.g. data_parallel={jax.device_count()})"
            )
        self.model = build_generator(cfg.model)
        self.optimizer = make_optimizer(cfg)
        self.metrics = MetricsLogger(
            self.run_dir, cfg.run_name, use_wandb, cfg, run_id=cfg.run_id
        )
        if jax.default_backend() == "cpu":
            # the reference fires a wandb alert on CPU fallback
            # (solver_encoder.py:106-109)
            self.metrics.alert(
                "CPU fallback", "training on CPU — no accelerator detected"
            )
        self.plateau = (
            ReduceLROnPlateau(cfg.train.plateau_factor, cfg.train.plateau_patience)
            if cfg.train.lr_scheduler == "Plateau"
            else None
        )

        self.ckpt_dir = os.path.abspath(os.path.join(self.run_dir, "checkpoints"))
        self.ckptr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=3,
                # async: save() returns after the D2H snapshot; the disk write
                # runs in a background thread (the train loop only blocks on a
                # still-unfinished PREVIOUS save). Single-process only:
                # orbax's async finalize issues its own cross-process syncs
                # (jax device collectives) from background threads, which
                # interleave nondeterministically with train-step collectives
                # across processes — multi-process runs save synchronously.
                enable_async_checkpointing=jax.process_count() == 1,
            ),
        )
        self.save_stall_ms: list[float] = []  # wall time train loop lost per save
        self._snap_fn = None  # jitted on-device state copy (built lazily)
        self._save_thread = None  # at most one orbax save in flight
        self._save_error: Exception | None = None
        self._saves_skipped = 0  # periodic saves dropped while one in flight
        self._last_saved_step = -1  # last step actually handed to orbax
        self._watch_fn = None  # param/grad histogram observer (train/watch.py)

        self.state = self._init_state()
        self._step_fn = self._compile_step()

    # ------------------------------------------------------------------ init

    def _example_batch(self):
        x, emb = next(self.data_iter)
        return jnp.asarray(x), jnp.asarray(emb)

    def _init_state(self) -> TrainState:
        x, emb = self._example_batch()
        rng = jax.random.PRNGKey(self.cfg.train.seed)

        def init_fn(x, emb):
            variables = self.model.init(rng, x, emb, emb, train=True)
            params = variables["params"]
            return TrainState(
                step=jnp.asarray(0, jnp.int32),
                params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.optimizer.init(params),
                ema_params=init_ema(params),
            )

        # Initialize INSIDE one jitted program with out_shardings: params are
        # born on the mesh (replicated or TP-sharded) instead of eager
        # single-device init followed by per-leaf reshard copies — minutes vs
        # seconds on wide meshes, and persistent-cacheable.
        tp = (
            self.cfg.train.model_parallel > 1
            or dict(self.mesh.shape).get("model", 1) > 1
        )
        rep = replicated(self.mesh)
        shapes = jax.eval_shape(init_fn, x, emb)
        psh = param_shardings(shapes.params, self.mesh, tensor_parallel=tp)
        state_sh = TrainState(
            step=rep,
            params=psh,
            batch_stats=jax.tree_util.tree_map(lambda _: rep, shapes.batch_stats),
            opt_state=jax.tree_util.tree_map(lambda _: rep, shapes.opt_state),
            ema_params=psh,
        )
        state = jax.jit(init_fn, out_shardings=state_sh)(x, emb)
        # resume (reference checkpoint-existence semantics,
        # solver_encoder.py:92-98,147-153)
        latest = self.ckptr.latest_step()
        if latest is not None:
            state = self.restore(latest, state)
            print(f"Continue from iteration: {int(state.step)}")
        return state

    def _recon(self, x, emb):
        """Eval-mode reconstruction for figure logging."""
        if not hasattr(self, "_recon_fn"):
            self._recon_fn = jax.jit(
                lambda variables, x, emb: self.model.apply(
                    variables, x, emb, emb, train=False
                )[1]
            )
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        return np.asarray(self._recon_fn(variables, x, emb))

    def _speaker_aux_windowed(self, dvec_params):
        """Build the lambda_spk v2 tables: unit-norm train.pkl conditioning
        rows (speaker lookup) and eval-protocol centroids (the targets),
        computed ONCE on the host with the same eval.SpeakerEmbedder the
        similarity evaluation uses — so training optimizes the quantity the
        eval measures (cli/evaluate_conversion.py's centroids)."""
        from autovc_tpu.data.manifest import load_train_manifest
        from autovc_tpu.eval import (
            SpeakerEmbedder,
            load_speaker_mels,
            speaker_centroids,
        )
        from autovc_tpu.models.dvector import dvector_for_params
        from autovc_tpu.train.step import SpeakerAux

        mel_dir = os.path.join(self.cfg.main_dir, "spmel")
        entries = load_train_manifest(os.path.join(mel_dir, "train.pkl"))
        embedder = SpeakerEmbedder(dvec_params)
        mels = load_speaker_mels(mel_dir, entries, self.cfg.speaker.num_uttrs)
        cents = speaker_centroids(embedder, mels)
        table = np.stack([e.embedding for e in entries]).astype(np.float32)
        table /= np.linalg.norm(table, axis=-1, keepdims=True) + 1e-8
        print(
            f"[solver] lambda_spk windowed protocol: eval centroids for "
            f"{len(entries)} speakers (margin {self.cfg.train.spk_margin})"
        )
        return SpeakerAux(
            # sized to the checkpoint (like SpeakerEmbedder): a DVector() at
            # default dims would ScopeParamShapeError on e.g. a dim_cell=256
            # encoder the first train step
            dvector_for_params(dvec_params),
            dvec_params,
            emb_table=jnp.asarray(table),
            centroids=jnp.asarray(
                np.stack([cents[e.speaker_id] for e in entries]).astype(np.float32)
            ),
        )

    def _build_spk_aux(self):
        """SpeakerAux for lambda_spk, built once and shared by the train
        step, the watch observer, and eval_loss (an eval g_loss without the
        speaker term would not be comparable to the training g_loss)."""
        if hasattr(self, "_spk_aux"):
            return self._spk_aux
        spk = None
        if self.cfg.train.lambda_spk > 0:
            assert self.cfg.train.spk_ckpt, "lambda_spk > 0 requires spk_ckpt"
            from autovc_tpu.models.dvector import dvector_for_params
            from autovc_tpu.train.ge2e import GE2ETrainer

            dvec_params = GE2ETrainer.load_params(self.cfg.train.spk_ckpt)
            dvec_params = dvec_params.get("dvector", dvec_params)
            if self.cfg.train.spk_protocol == "windowed":
                spk = self._speaker_aux_windowed(dvec_params)
            else:
                from autovc_tpu.train.step import SpeakerAux

                spk = SpeakerAux(dvector_for_params(dvec_params), dvec_params)
            print(
                f"[solver] speaker-consistency aux on "
                f"(lambda_spk={self.cfg.train.lambda_spk}, "
                f"protocol={self.cfg.train.spk_protocol}, "
                f"frozen encoder: {self.cfg.train.spk_ckpt})"
            )
        self._spk_aux = spk
        return spk

    def _compile_step(self):
        spk = self._build_spk_aux()
        raw = make_train_step(self.model, self.cfg, self.optimizer, spk=spk)
        bsh = batch_sharding(self.mesh)
        return jax.jit(
            raw,
            in_shardings=(None, bsh, bsh, None),
            donate_argnums=(0,),
        )

    # ----------------------------------------------------------------- train

    def train(self, num_iters: int | None = None, prefetch: int = 2):
        cfg = self.cfg
        num_iters = num_iters if num_iters is not None else cfg.train.num_iters
        lr_scale = jnp.asarray(1.0, jnp.float32)
        bsh = batch_sharding(self.mesh)

        data_iter = self.data_iter
        prefetcher = None
        if prefetch:
            from autovc_tpu.data.prefetch import DevicePrefetcher

            prefetcher = DevicePrefetcher(self.data_iter, bsh, depth=prefetch)
            data_iter = prefetcher
        log_keys = ["g_loss_id", "g_loss_id_psnt", "g_loss_cd"] if cfg.model.model_type != "wav" else [
            "g_loss_id", "g_loss_gen", "g_loss_cd", "g_loss_sisnr"
        ]
        if cfg.train.lambda_spk > 0 and cfg.model.model_type != "wav":
            log_keys.append("g_loss_spk")
            if cfg.train.spk_protocol == "windowed":
                log_keys.append("g_spk_margin")

        # failure handling (SURVEY §5.3): save a checkpoint on SIGTERM/SIGINT
        # (preemption-safe), retry transient data errors, halt on non-finite
        # loss WITHOUT checkpointing — the params already absorbed the bad
        # update, so resume points at the last good periodic checkpoint.
        import signal

        stop_requested = {"flag": False}

        def _on_term(signum, frame):
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # not the main thread
                pass

        print("Starting training...", flush=True)
        i = int(self.state.step)
        last_metrics = {}
        m = None
        self.history: list[dict] = []
        data_failures = 0
        try:
            while i < num_iters:
                if stop_requested["flag"]:
                    # same finite gate as periodic saves: a SIGTERM that lands
                    # after a NaN step must not overwrite the last good
                    # checkpoint with poisoned params
                    if m is not None and not np.isfinite(float(m["g_loss"])):
                        latest = self.ckptr.latest_step()
                        print(
                            f"[solver] termination at step {i} with non-finite "
                            f"loss; NOT checkpointing (last good: {latest})"
                        )
                    else:
                        print(f"[solver] termination requested at step {i}; checkpointing")
                        self.save(i, wait=True)
                    break
                try:
                    x, emb = next(data_iter)
                    data_failures = 0
                except StopIteration:
                    raise
                except Exception as exc:  # transient data error: retry, bounded
                    data_failures += 1
                    if data_failures > 3:
                        raise
                    print(f"[solver] data error ({exc}); retry {data_failures}/3")
                    continue
                if prefetcher is None:  # prefetcher already sharded the batch
                    x = put_global_batch(jnp.asarray(x), bsh)
                    emb = put_global_batch(jnp.asarray(emb), bsh)
                self.state, m = self._step_fn(self.state, x, emb, lr_scale)
                i += 1

                # host syncs (loss fetch) only at log_step boundaries so the
                # dispatch pipeline stays async between them; the plateau
                # controller's patience granularity becomes log_step
                if i % cfg.train.log_step == 0:
                    loss_val = float(m["g_loss"])
                    if not np.isfinite(loss_val):
                        # do NOT checkpoint — the params already absorbed the
                        # non-finite update; the latest PERIODIC checkpoint is
                        # the last good state to resume from
                        latest = self.ckptr.latest_step()
                        raise FloatingPointError(
                            f"non-finite loss at step {i}; resume from the last "
                            f"good checkpoint (step {latest})"
                        )
                    if self.plateau is not None:
                        lr_scale = jnp.asarray(self.plateau.step(loss_val), jnp.float32)
                    last_metrics = {k: float(v) for k, v in m.items()}
                    self.history.append(dict(last_metrics, step=i))
                    self.metrics.log(i, last_metrics)
                    self.metrics.console(i, num_iters, last_metrics, keys=log_keys)
                    if (
                        cfg.train.log_spectrograms
                        and cfg.model.model_type != "wav"
                        and jax.process_count() == 1
                        # multi-process: x is a global array whose shards live
                        # on other hosts — x[0]/np.asarray would raise; figure
                        # logging is a single-host convenience
                    ):
                        recon = self._recon(x, emb)
                        self.metrics.log_spectrogram_pair(i, x[0], recon[0])
                if cfg.train.watch_step and i % cfg.train.watch_step == 0:
                    # wandb.watch equivalent (solver_encoder.py:203): param/grad
                    # histograms, built on device (train/watch.py)
                    if self._watch_fn is None:
                        from autovc_tpu.train.watch import make_watch_fn

                        self._watch_fn = make_watch_fn(
                            self.model, cfg, spk=self._build_spk_aux()
                        )
                    self.metrics.log_histograms(i, self._watch_fn(self.state, x, emb))
                if i % cfg.train.checkpoint_step == 0:
                    # never persist a non-finite state (would poison auto-resume)
                    if np.isfinite(float(m["g_loss"])):
                        self.save(i)
                    else:
                        latest = self.ckptr.latest_step()
                        raise FloatingPointError(
                            f"non-finite loss at checkpoint step {i}; last good "
                            f"checkpoint is step {latest}"
                        )
        finally:
            # runs on ANY exit (FloatingPointError, save re-raise, data
            # exhaustion): stop the prefetcher thread and restore the
            # process signal handlers so a long-lived caller keeps Ctrl-C
            if prefetcher is not None:
                prefetcher.close()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)
        # checkpoint-boundary saves skipped because the previous one was
        # still in flight must not leave the END of the run unpersisted:
        # if the last boundary crossed has no save at-or-after it, persist
        # the final state (any step id is fine for orbax), gated on the
        # same finite-loss rule as periodic saves
        cs = cfg.train.checkpoint_step
        if (
            not stop_requested["flag"]
            and m is not None
            and i >= cs
            and self._last_saved_step < (i // cs) * cs
            and np.isfinite(float(m["g_loss"]))
        ):
            self.save(i, wait=True)
        self.finish_saves()
        return last_metrics

    # ------------------------------------------------------------ checkpoint

    def save(self, step: int, wait: bool = False):
        import time as _time

        t0 = _time.time()
        self._save(step, wait=wait)
        stall = (_time.time() - t0) * 1000.0
        self.save_stall_ms.append(stall)
        if stall > 2000:
            print(f"[solver] checkpoint save blocked the loop {stall:.0f} ms")

    def _save(self, step: int, wait: bool = False):
        """Snapshot-then-save: orbax's "async" save still performs the
        device-to-host fetch synchronously — ~20s of train-loop stall for this
        model's 456MB state on a tunnel-attached TPU (measured; only the disk
        write happens in orbax's background thread). We instead take an
        ON-DEVICE copy of the state (milliseconds of HBM bandwidth) and run
        the whole orbax save — D2H fetch included — in a worker thread. The
        copy is required for correctness: the train step donates the state
        buffers, so by the time the thread fetches them the originals have
        been reused; the snapshot gives the thread its own buffers. One save
        in flight at a time. A periodic save that finds the previous one
        still in flight is SKIPPED (wait=False) instead of blocking the
        train loop — through a tunnel-attached TPU a save can take 80-98 s
        wall, so a small checkpoint_step would otherwise make the loop
        save-bound (measured round 3). Final saves (SIGTERM, end of run)
        pass wait=True and block until the slot frees.

        Multi-process runs save synchronously: orbax's save() begins with a
        sync_global_processes collective, and collectives issued from a
        background thread interleave nondeterministically with the main
        thread's train-step collectives across processes (observed as
        'sync_global_devices name mismatch' aborts)."""
        if jax.process_count() > 1:
            self._orbax_save(step, self.state)
            self._last_saved_step = step
            return
        if self._save_thread is not None:
            if self._save_thread.is_alive() and not wait:
                self._saves_skipped += 1
                return
            self._save_thread.join()
            self._save_thread = None
        if self._saves_skipped:
            print(
                f"[solver] {self._saves_skipped} checkpoint(s) skipped while "
                f"the previous save was in flight"
            )
            self._saves_skipped = 0
        if self._save_error is not None:
            # A failed background save (disk full, bad perms, ...) must stop
            # training NOW: checkpoints are the recovery path, and deferring
            # the error to finish_saves() would let a multi-hour run continue
            # with zero persisted state.
            exc, self._save_error = self._save_error, None
            self.metrics.alert(
                "checkpoint save failed", f"background orbax save raised: {exc!r}"
            )
            raise exc
        if self._snap_fn is None:
            self._snap_fn = jax.jit(
                lambda s: jax.tree_util.tree_map(jnp.copy, s)
            )
        snap = self._snap_fn(self.state)

        def _bg():
            try:
                self._orbax_save(step, snap)
            except Exception as exc:  # pragma: no cover - surfaced at join
                self._save_error = exc

        import threading

        self._save_thread = threading.Thread(target=_bg, daemon=True)
        self._save_thread.start()
        self._last_saved_step = step

    def _orbax_save(self, step: int, state: TrainState):
        self.ckptr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                        "ema_params": state.ema_params,
                        "step": state.step,
                    }
                )
            ),
        )

    def finish_saves(self):
        """Block until every in-flight checkpoint (thread + orbax background
        write) has committed; re-raise a save error if one occurred."""
        if self._save_thread is not None:
            self._save_thread.join()
            self._save_thread = None
        self.ckptr.wait_until_finished()
        if self._save_error is not None:
            exc, self._save_error = self._save_error, None
            raise exc

    def restore(self, step: int, like: TrainState) -> TrainState:
        target = {
            "params": like.params,
            "batch_stats": like.batch_stats,
            "opt_state": like.opt_state,
            "ema_params": like.ema_params,
            "step": like.step,
        }
        restored = self.ckptr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(target))
        )["state"]
        return TrainState(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            ema_params=restored["ema_params"],
        )

    # ------------------------------------------------------------------ eval

    def eval_loss(self, x, emb) -> dict:
        _, (metrics, _) = _loss_fn(
            self.model, self.cfg, self.state.params, self.state.batch_stats,
            jnp.asarray(x), jnp.asarray(emb), train=False,
            spk=self._build_spk_aux(),
        )
        return {k: float(v) for k, v in metrics.items()}
