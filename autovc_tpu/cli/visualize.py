"""Feature/result visualization CLI (replaces the reference's analysis
notebooks: visualize_melspect.ipynb, ad-hoc.ipynb).

Plots any mix of feature .npy files and results_*.pkl manifests as
spectrogram PNGs, and prints the structure of pickled manifests.

Usage: python -m autovc_tpu.cli.visualize --out_dir DIR path1 [path2 ...]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def describe_pickle(path: str) -> None:
    """metadata/train/results pkl spelunking (ad-hoc.ipynb equivalent)."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    print(f"{path}: {type(obj).__name__} of {len(obj)} entries")
    for i, row in enumerate(obj[:5]):
        if isinstance(row, (list, tuple)):
            parts = []
            for el in row:
                if isinstance(el, np.ndarray):
                    parts.append(f"ndarray{el.shape}:{el.dtype}")
                elif isinstance(el, (list, tuple)):
                    parts.append(f"{type(el).__name__}[{len(el)}]")
                else:
                    parts.append(repr(el)[:40])
            print(f"  [{i}] " + ", ".join(parts))
        else:
            print(f"  [{i}] {type(row).__name__}")


def plot_features(path: str, out_dir: str, arr: np.ndarray | None = None, tag=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if arr is None:
        arr = np.load(path)
    name = tag or os.path.basename(path).rsplit(".", 1)[0]
    fig, ax = plt.subplots(figsize=(10, 4))
    if arr.ndim == 2 and arr.shape[1] > 1:  # spectrogram-like
        im = ax.imshow(arr.T * 100 - 100, origin="lower", aspect="auto")
        ax.set(title=f"{name} {arr.shape}", xlabel="frames", ylabel="bins")
        fig.colorbar(im, ax=ax)
    else:  # waveform
        ax.plot(arr.reshape(-1))
        ax.set(title=f"{name} {arr.shape}", xlabel="samples")
    out = os.path.join(out_dir, f"{name}.png")
    fig.savefig(out, dpi=90)
    plt.close(fig)
    print(f"[visualize] {out}")


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("paths", nargs="+", help=".npy features or .pkl manifests")
    ap.add_argument("--out_dir", default=".")
    args = ap.parse_args(argv)
    apply_platform(args)
    os.makedirs(args.out_dir, exist_ok=True)

    for p in args.paths:
        if p.endswith(".npy"):
            plot_features(p, args.out_dir)
        elif p.endswith(".pkl"):
            describe_pickle(p)
            with open(p, "rb") as f:
                obj = pickle.load(f)
            # plot results-manifest spectrograms
            for row in obj if isinstance(obj, list) else []:
                if (
                    isinstance(row, (list, tuple))
                    and len(row) == 2
                    and isinstance(row[1], np.ndarray)
                ):
                    plot_features(p, args.out_dir, arr=row[1], tag=f"result_{row[0]}")
        else:
            print(f"[visualize] skipping unknown file type: {p}")


if __name__ == "__main__":
    main()
