"""Torch-checkpoint migration CLI.

Converts a reference-trained checkpoint (solver_encoder.py:334-346 format:
{'epoch', 'state_dict', 'optimizer', 'loss'} — or the upstream autovc.ckpt
{'model'} format) into an orbax run directory that autovc_tpu.cli.convert /
evaluate consume directly. This is the "switch to this framework" path for
users with existing trained models.

Usage: python -m autovc_tpu.cli.import_torch --ckpt chkpnt_spmel_run.ckpt
           --out_run_dir runs/imported [--model_type spmel|stft|wav]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--ckpt", required=True, help="torch .ckpt from the reference")
    ap.add_argument("--out_run_dir", required=True)
    ap.add_argument("--model_type", default="spmel", choices=["spmel", "stft", "wav"])
    args = ap.parse_args(argv)
    apply_platform(args)

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    import torch

    from autovc_tpu.interop import (
        generator_params_from_torch,
        generator_wav_params_from_torch,
    )

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    # our-format ('state_dict') or upstream autovc.ckpt ('model')
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    step = int(ckpt.get("epoch", 0))

    if args.model_type == "wav":
        params, stats = generator_wav_params_from_torch(sd)
    else:
        params, stats = generator_params_from_torch(sd)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    stats = jax.tree_util.tree_map(jnp.asarray, stats)

    # torch Adam moments aren't portable, but Solver.restore StandardRestores
    # against the FULL optimizer pytree — an empty opt_state would crash
    # --resume with a tree-structure mismatch. Write freshly initialized
    # moments instead (make_optimizer's structure is cfg-independent:
    # inject_hyperparams(adam), train/step.py:83-86).
    from autovc_tpu.config import Config
    from autovc_tpu.train.step import make_optimizer

    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, model_type=args.model_type))
    opt_state = make_optimizer(cfg).init(params)

    ckpt_dir = os.path.abspath(os.path.join(args.out_run_dir, "checkpoints"))
    mgr = ocp.CheckpointManager(ckpt_dir)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(
                {
                    "params": params,
                    "batch_stats": stats,
                    "opt_state": opt_state,
                    "ema_params": params,
                    "step": jnp.asarray(step, jnp.int32),
                }
            )
        ),
    )
    mgr.wait_until_finished()
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[import_torch] step {step}, {n/1e6:.1f}M params -> {ckpt_dir}")


if __name__ == "__main__":
    main()
