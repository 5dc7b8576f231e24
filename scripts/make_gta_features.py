"""Ground-truth-aligned (GTA) features for vocoder fine-tuning.

Runs the trained AutoVC generator in identity mode (src -> src, eval-mode
BN, EMA weights) over every corpus utterance and saves the RECONSTRUCTED
mel next to the original wav name. Fine-tuning the vocoder on (GTA mel,
original wav) pairs closes the train/test mismatch that makes a vocoder
trained on real features underperform on generated ones — the standard
Tacotron/WaveNet GTA recipe, applied to AutoVC's conversion path.

Usage: python scripts/make_gta_features.py --main_dir _data \
           --artifact artifacts/generator_spmel.npz --out_dir _data/spmel_gta
"""

from __future__ import annotations

import os
import sys

# Detached drivers run `python scripts/<name>.py`, which puts scripts/ (not
# the repo root) on sys.path; make autovc_tpu importable regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import pickle

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--main_dir", required=True)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--out_dir", required=True)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.config import Config
    from autovc_tpu.models import build_generator

    cfg = Config()
    model = build_generator(cfg.model)
    variables, step = load_artifact(args.artifact)
    print(f"[gta] generator step {step}")

    spmel = os.path.join(args.main_dir, "spmel")
    with open(os.path.join(spmel, "train.pkl"), "rb") as f:
        meta = pickle.load(f)
    emb_by_spk = {row[0]: np.asarray(row[1], np.float32) for row in meta}

    @jax.jit
    def recon(x, e):
        out = model.apply(variables, x, e, e, train=False)
        return out[1] if isinstance(out, tuple) else out

    n = 0
    for spk in sorted(os.listdir(spmel)):
        d = os.path.join(spmel, spk)
        if not os.path.isdir(d) or spk not in emb_by_spk:
            continue
        os.makedirs(os.path.join(args.out_dir, spk), exist_ok=True)
        e = jnp.asarray(emb_by_spk[spk][None])
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".npy"):
                continue
            mel = np.load(os.path.join(d, fn))
            t = mel.shape[0]
            # pad exactly as the dense Converter does (to freq=32, the
            # reference-faithful default): the backward LSTM sees the same
            # zero-frame tail here as at inference, so GTA mels match what
            # conversion actually produces. More compile buckets, but the
            # programs are small and the train/test match is the point.
            pad = (-t) % 32
            x = np.pad(mel, ((0, pad), (0, 0)))[None]
            y = np.asarray(recon(jnp.asarray(x), e))[0, :t]
            np.save(os.path.join(args.out_dir, spk, fn), y.astype(np.float32))
            n += 1
    print(f"[gta] wrote {n} reconstructions -> {args.out_dir}")


if __name__ == "__main__":
    main()
