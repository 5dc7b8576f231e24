"""Export a training-run orbax checkpoint to a flat .npz artifact.

The bench (bench.py) and lightweight inference tools load these single-file
artifacts instead of a full orbax run directory, so trained weights can be
checked into the repo / shipped. Counterpart of the reference's torch.save
checkpoint dict (solver_encoder.py:332-346) for distribution purposes.

Usage: python -m autovc_tpu.cli.export_ckpt --run_dir RUNDIR --out FILE.npz
           [--use_ema] [--dtype float32|float16|bfloat16]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export(run_dir: str, out: str, use_ema: bool = False, dtype: str = "float32"):
    from autovc_tpu.cli.convert import load_solver_checkpoint
    from autovc_tpu.vocoder.wavenet import flatten_params

    restored, step = load_solver_checkpoint(run_dir)
    params = restored["ema_params" if use_ema else "params"]
    stats = restored["batch_stats"]

    flat = {}
    for k, v in flatten_params(params, "params").items():
        a = np.asarray(v)
        if dtype != "float32" and a.dtype == np.float32:
            # bfloat16 keeps f32's exponent range; numpy lacks it, so round
            # through the f32 container (values quantized, storage f16-sized
            # only for float16)
            if dtype == "bfloat16":
                import jax.numpy as jnp

                a = np.asarray(jnp.asarray(a, jnp.bfloat16), np.float32)
            else:
                a = a.astype(np.float16)
        flat[k] = a
    # batch_stats stay float32 — they are tiny and BN eval-mode accuracy
    # depends on them directly
    flat.update(flatten_params(stats, "batch_stats"))
    flat["__step__"] = np.asarray(step, np.int64)

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez_compressed(out, **flat)
    size_mb = os.path.getsize(out) / 1e6
    print(f"[export_ckpt] step {step} -> {out} ({size_mb:.1f} MB, {dtype})")


def load_artifact(path: str):
    """(variables, step) from an exported artifact; f32 compute dtypes."""
    import jax
    import jax.numpy as jnp

    from autovc_tpu.vocoder.wavenet import unflatten_params

    flat = dict(np.load(path))
    step = int(flat.pop("__step__", -1))
    tree = unflatten_params(
        {k: v.astype(np.float32) if v.dtype == np.float16 else v for k, v in flat.items()}
    )
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, tree.get("params", {})),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, tree.get("batch_stats", {})),
    }
    return variables, step


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "bfloat16"])
    args = ap.parse_args(argv)
    apply_platform(args)
    export(args.run_dir, args.out, use_ema=args.use_ema, dtype=args.dtype)


if __name__ == "__main__":
    main()
