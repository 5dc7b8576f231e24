"""Param/grad histogram watching (train/watch.py + MetricsLogger sink) —
the wandb.watch equivalent (reference solver_encoder.py:203)."""

import json

import numpy as np

import jax.numpy as jnp

from autovc_tpu.train.watch import tree_histograms


def test_tree_histograms_counts_and_range():
    tree = {
        "encoder": {"w": jnp.arange(128, dtype=jnp.float32), "b": jnp.zeros(4)},
        "decoder": {"w": jnp.ones((3, 3))},
        "empty": {},
    }
    h = tree_histograms(tree, bins=16)
    assert set(h) == {"encoder", "decoder"}  # empty module skipped
    enc = h["encoder"]
    assert int(np.sum(np.asarray(enc["counts"]))) == 132  # every element binned
    assert float(enc["lo"]) == 0.0 and float(enc["hi"]) == 127.0
    # rms over [0..127] + 4 zeros
    expect_rms = np.sqrt(np.mean(np.concatenate([np.arange(128.0), np.zeros(4)]) ** 2))
    np.testing.assert_allclose(float(enc["rms"]), expect_rms, rtol=1e-5)
    # degenerate all-equal module must not NaN
    dec = h["decoder"]
    assert int(np.sum(np.asarray(dec["counts"]))) == 9
    assert np.isfinite(float(dec["rms"]))


def test_metrics_logger_histogram_sink(tmp_path):
    from autovc_tpu.train.metrics import MetricsLogger

    ml = MetricsLogger(str(tmp_path), "w")
    hists = tree_histograms({"m": {"w": jnp.arange(10.0)}}, bins=8)
    ml.log_histograms(3, {"param/m": hists["m"], "grad/m": hists["m"]})
    ml.close()
    (line,) = open(ml.path).read().splitlines()
    rec = json.loads(line)
    assert rec["step"] == 3
    assert set(rec["histograms"]) == {"param/m", "grad/m"}
    pm = rec["histograms"]["param/m"]
    assert sum(pm["counts"]) == 10 and pm["lo"] == 0.0 and pm["hi"] == 9.0
