"""Metrics/observability (reference solver_encoder.py:313-421).

The reference's backbone is wandb (scalars + spectrogram images). Here the
primary sink is a local JSONL stream (always available, machine-readable) with
optional wandb mirroring when the package + token exist, plus the reference's
console log line format.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Any, Mapping


class MetricsLogger:
    def __init__(
        self,
        run_dir: str,
        run_name: str,
        use_wandb: bool = False,
        config=None,
        run_id: str | None = None,
    ):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, f"metrics_{run_name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.start_time = time.time()
        self._wandb = None
        if use_wandb:
            try:  # wandb is optional in this environment
                import wandb  # type: ignore

                token_file = "wandb.token"
                if os.path.exists(token_file):
                    with open(token_file) as fh:
                        wandb.login(key=fh.readline().strip())
                # resume-by-run-id (reference solver_encoder.py:96-98:
                # wandb.init(resume='must', id=run_id) when resuming)
                kw = {}
                if run_id:
                    kw = dict(id=run_id, resume="must")
                wandb.init(project="autovc-tpu", name=run_name, config=config, **kw)
                self._wandb = wandb
            except Exception as e:  # pragma: no cover
                print(f"[metrics] wandb unavailable ({e}); logging to JSONL only")

    def alert(self, title: str, text: str) -> None:
        """Out-of-band alert (reference solver_encoder.py:106-109 fires a
        wandb.alert when training falls back to CPU). Console + wandb."""
        print(f"[alert] {title}: {text}", flush=True)
        if self._wandb is not None:
            try:
                self._wandb.alert(title=title, text=text)
            except Exception:  # pragma: no cover - alert is best-effort
                pass

    def log(self, step: int, metrics: Mapping[str, Any]) -> None:
        rec = {"step": step, "time": time.time() - self.start_time}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def console(self, step: int, num_iters: int, metrics: Mapping[str, Any], keys=None):
        """Reference log-line format (solver_encoder.py:324-329)."""
        et = str(datetime.timedelta(seconds=time.time() - self.start_time))[:-7]
        line = f"Elapsed [{et}], Iteration [{step}/{num_iters}]"
        for k in keys or sorted(metrics):
            line += f", {k}: {float(metrics[k]):.4f}"
        print(line, flush=True)

    def log_histograms(self, step: int, hists: Mapping[str, Mapping[str, Any]]):
        """Param/grad histogram sink (the wandb.watch equivalent; see
        train/watch.py). hists: {'param/encoder': {counts, lo, hi, rms}, ...}.
        JSONL gets compact summaries + counts; wandb gets real Histograms."""
        import numpy as np

        rec: dict[str, Any] = {"step": step, "histograms": {}}
        wb = {}
        for name, h in hists.items():
            counts = np.asarray(h["counts"])
            lo, hi = float(h["lo"]), float(h["hi"])
            rec["histograms"][name] = {
                "lo": lo,
                "hi": hi,
                "rms": float(h["rms"]),
                "counts": counts.tolist(),
            }
            if self._wandb is not None:
                edges = np.linspace(lo, max(hi, lo + 1e-12), len(counts) + 1)
                wb[name] = self._wandb.Histogram(np_histogram=(counts, edges))
        self._f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(wb, step=step)

    def log_spectrogram_pair(self, step: int, original, reconstructed, tag="train"):
        """Original-vs-reconstructed spectrogram figures every log_step
        (reference solver_encoder.py:348-412; PNGs under <run>/figures plus
        a wandb Image when mirroring)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        fig_dir = os.path.join(os.path.dirname(self.path), "figures")
        os.makedirs(fig_dir, exist_ok=True)
        fig, axs = plt.subplots(2, 1, sharex=True, figsize=(8, 6))
        # same dB rescale the reference displays (x*100 - 100)
        axs[0].imshow(np.asarray(original).T * 100 - 100, origin="lower", aspect="auto")
        axs[0].set(title="Original spectrogram")
        im = axs[1].imshow(
            np.asarray(reconstructed).T * 100 - 100, origin="lower", aspect="auto"
        )
        axs[1].set(title="Converted spectrogram")
        fig.colorbar(im, ax=axs)
        out = os.path.join(fig_dir, f"{tag}_step{step}.png")
        fig.savefig(out, dpi=80)
        plt.close(fig)
        if self._wandb is not None:
            self._wandb.log({"Train spectrograms": self._wandb.Image(out)}, step=step)
        return out

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
