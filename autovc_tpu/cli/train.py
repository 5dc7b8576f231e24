"""Training CLI (reference main.py:43-82).

Idempotent orchestration like the reference main(): build features if the
feature dir is missing, build metadata if train.pkl is missing, then train.

Usage: python -m autovc_tpu.cli.train --main_dir DIR --run_name NAME
           [--model_type spmel|stft|wav] [--num_iters N] [--batch_size B]
           [--len_crop T] [--lr LR] [--lambda_cd W] [--lambda_SISNR W]
           [--lr_scheduler Cosine|Plateau] [--depth D] [--ema DECAY]
           [--resume] [--data_parallel N] [--model_parallel N] [--wandb]
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from autovc_tpu.config import AudioConfig, Config, ModelConfig, TrainConfig
from autovc_tpu.data import BatchIterator, UtteranceDataset


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    # model configuration (main.py:47-53,65)
    ap.add_argument("--lambda_cd", type=float, default=1.0)
    ap.add_argument("--lambda_SISNR", type=float, default=1.0)
    ap.add_argument(
        "--lambda_spk", type=float, default=0.0,
        help="speaker-consistency auxiliary weight: within-batch cross-"
        "conversions re-embedded by a FROZEN GE2E encoder and pulled toward "
        "the target embedding (spmel only; 0 = reference objective)",
    )
    ap.add_argument(
        "--spk_ckpt", default=None,
        help="GE2E .npz for --lambda_spk (cli.train_speaker_encoder output)",
    )
    ap.add_argument(
        "--spk_protocol", default="windowed", choices=["windowed", "crop"],
        help="lambda_spk protocol: 'windowed' (v2) hinges the evaluation's "
        "own margin criterion against eval-protocol speaker centroids; "
        "'crop' (v1) is the round-3 single-window cosine pull (Goodharts — "
        "kept for the documented study)",
    )
    ap.add_argument(
        "--spk_margin", type=float, default=1.5,
        help="hinge target for --spk_protocol windowed: pressure stops once "
        "cos(target centroid) - cos(source centroid) >= this. Default 1.5 "
        "is the setting behind the shipped 100%% all-pairs result; values "
        "<= ~1.1 are inert on the bundled corpus (crop margins already "
        "sit there)",
    )
    ap.add_argument("--dim_neck", type=int, default=32)
    ap.add_argument("--dim_emb", type=int, default=256)
    ap.add_argument("--dim_pre", type=int, default=512)
    ap.add_argument("--freq", type=int, default=32)
    ap.add_argument("--depth", type=int, default=1)
    # training configuration (main.py:56-71)
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--num_iters", type=int, default=10_000_000)
    ap.add_argument(
        "--len_crop",
        type=int,
        default=None,
        help="sequence crop: 128 frames for spmel/stft (default); "
        "(127*256)+1024=33536 samples for wav (auto-selected; main.py:59)",
    )
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft", "wav"])
    ap.add_argument("--run_name", required=True)
    ap.add_argument(
        "--lr_scheduler",
        default=None,
        choices=[None, "Cosine", "CosineDecay", "Plateau"],
        help="Cosine = reference-faithful periodic CosineAnnealingLR(T_max); "
        "CosineDecay = one-shot anneal over num_iters (convergence runs)",
    )
    ap.add_argument("--ema", type=float, default=0.9999)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--run_id",
        default=None,
        help="wandb run id to resume into (reference main.py:67-68; requires "
        "--wandb; wandb.init(resume='must', id=run_id))",
    )
    ap.add_argument("--log_step", type=int, default=100)
    ap.add_argument("--checkpoint_step", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    # parallelism (new capability; SURVEY §2.2)
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument(
        "--multihost",
        action="store_true",
        help="initialize jax.distributed (TPU pod slices); each host feeds its "
        "shard of the global batch",
    )
    ap.add_argument("--bf16", action="store_true", help="bfloat16 compute (MXU-native)")
    ap.add_argument(
        "--pallas", action="store_true",
        help="Pallas fused LSTM kernels (forward + custom-VJP backward; "
        "much faster TPU compiles at equal step time)",
    )
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument(
        "--watch_step", type=int, default=0,
        help="log param/grad histograms every N steps (wandb.watch "
        "equivalent, reference solver_encoder.py:203); 0 = off",
    )
    ap.add_argument(
        "--export",
        default=None,
        help="after training, write final params to this .npz (process 0 "
        "only) — a distributable artifact like cli.export_ckpt's, but taken "
        "straight from memory (no orbax round-trip, topology-independent)",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    if args.multihost:
        import jax

        # generous shutdown barrier: the checkpoint-writing process (0) can
        # lag the others by minutes on slow/contended filesystems, and the
        # default 300s barrier kills every process when it trips
        kw = dict(shutdown_timeout_seconds=1800)
        coord = os.environ.get("AUTOVC_COORDINATOR")
        if coord:
            # explicit coordination (CPU tests / non-TPU clusters); TPU pods
            # auto-detect from metadata when these env vars are absent
            kw.update(
                coordinator_address=coord,
                num_processes=int(os.environ["AUTOVC_NUM_PROCESSES"]),
                process_id=int(os.environ["AUTOVC_PROCESS_ID"]),
            )
            if args.platform == "cpu":
                jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(**kw)
        if args.data_parallel == 1:
            # multihost default: the mesh must span every process's devices
            # (a 1x1 mesh would pin all state to global device 0, leaving the
            # other processes with nothing addressable); data-parallel over
            # all devices not claimed by model parallelism
            args.data_parallel = jax.device_count() // args.model_parallel
            print(
                f"[train] multihost: data_parallel -> {args.data_parallel} "
                f"({jax.process_count()} processes, {jax.device_count()} devices)"
            )

    if args.len_crop is None:
        from autovc_tpu.config import wav_len_crop

        args.len_crop = wav_len_crop(AudioConfig()) if args.model_type == "wav" else 128

    run_name = args.run_name
    if not args.resume:
        run_name += datetime.now().strftime("_%y%B%d_%H%M_%S")  # main.py:76

    cfg = Config(
        audio=AudioConfig(),
        model=ModelConfig(
            model_type=args.model_type,
            dim_neck=args.dim_neck,
            dim_emb=args.dim_emb,
            dim_pre=args.dim_pre,
            freq=args.freq,
            convtas_depth=args.depth,
            compute_dtype="bfloat16" if args.bf16 else "float32",
            use_pallas_lstm=args.pallas,
        ),
        train=TrainConfig(
            lambda_cd=args.lambda_cd,
            lambda_sisnr=args.lambda_SISNR,
            lambda_spk=args.lambda_spk,
            spk_ckpt=args.spk_ckpt,
            spk_protocol=args.spk_protocol,
            spk_margin=args.spk_margin,
            batch_size=args.batch_size,
            num_iters=args.num_iters,
            len_crop=args.len_crop,
            lr=args.lr,
            lr_scheduler=args.lr_scheduler,
            ema_decay=args.ema,
            log_step=args.log_step,
            checkpoint_step=args.checkpoint_step,
            watch_step=args.watch_step,
            seed=args.seed,
            data_parallel=args.data_parallel,
            model_parallel=args.model_parallel,
        ),
        main_dir=args.main_dir,
        run_name=run_name,
        run_id=args.run_id,
    )

    feature_dir = os.path.join(args.main_dir, args.model_type)
    if not os.path.isdir(feature_dir):  # main.py:19-24
        print("Did not find folder with spectrograms - creating...")
        from autovc_tpu.cli.make_spect import extract_all

        extract_all(args.main_dir, model_type=args.model_type)
    if not os.path.exists(os.path.join(feature_dir, "train.pkl")):  # main.py:27-33
        print("Metadata does not exist - creating...")
        from autovc_tpu.cli.make_metadata import main as mm

        mm(["--main_dir", args.main_dir, "--model_type", args.model_type])

    ds = UtteranceDataset(feature_dir)
    if args.multihost:
        import jax

        it = BatchIterator(
            ds,
            cfg.train.batch_size,
            cfg.train.len_crop,
            seed=cfg.train.seed,
            host_index=jax.process_index(),
            host_count=jax.process_count(),
        )
    else:
        it = BatchIterator(ds, cfg.train.batch_size, cfg.train.len_crop, seed=cfg.train.seed)

    from autovc_tpu.train import Solver  # deferred: jax init after data checks

    solver = Solver(cfg, it, use_wandb=args.wandb)
    solver.train()
    if args.export:
        import jax
        import numpy as np

        from autovc_tpu.vocoder.wavenet import flatten_params

        params = solver.state.params
        stats = solver.state.batch_stats
        if jax.process_count() > 1:
            # collective: EVERY process participates; gathers TP-sharded
            # leaves to full host arrays
            from jax.experimental import multihost_utils as mhu

            params = mhu.process_allgather(params, tiled=True)
            stats = mhu.process_allgather(stats, tiled=True)
        if jax.process_index() == 0:
            # same artifact schema as cli.export_ckpt: params + batch_stats
            # (BN eval mode needs them) + __step__, so load_artifact consumers
            # (convert --artifact, evaluate_conversion, export_serving) work
            flat = {
                k: np.asarray(v)
                for k, v in flatten_params(params, "params").items()
            }
            flat.update(
                (k, np.asarray(v))
                for k, v in flatten_params(stats, "batch_stats").items()
            )
            flat["__step__"] = np.asarray(int(solver.state.step), np.int64)
            np.savez(args.export, **flat)
            print(f"[train] exported params -> {args.export}")
    if args.multihost:
        # orderly exit: every process reaches this barrier with all
        # checkpoint work finished (solver.train ends in finish_saves), then
        # disconnects gracefully — otherwise the fastest process's abrupt
        # exit aborts peers' in-flight collectives
        import jax
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("autovc:train_exit")
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
