"""CLI integration tests: the five user-facing entry points exercised on a
tiny 2-speaker corpus built from the bundled reference wavs (the reference's
de-facto verification strategy — SURVEY §4.1 — automated)."""

import json
import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_corpus(reference_dir, tmp_path_factory):
    """2 speakers x 2 utterances."""
    root = tmp_path_factory.mktemp("corpus")
    for spk in ("p225", "p228"):
        d = root / "wavs" / spk
        d.mkdir(parents=True)
        src = os.path.join(reference_dir, "wavs", spk)
        for f in sorted(os.listdir(src))[:2]:
            shutil.copy(os.path.join(src, f), d / f)
    shutil.copy(os.path.join(reference_dir, "speaker_info.txt"), root / "speaker_info.txt")
    # features extracted here so every test is independently runnable
    from autovc_tpu.cli.make_spect import main as ms

    ms(["--platform", "cpu", "--main_dir", str(root)])
    return str(root)


def test_make_spect_cli(tiny_corpus):
    from autovc_tpu.cli.make_spect import main

    main(["--platform", "cpu", "--main_dir", tiny_corpus])  # idempotent re-run
    out = os.path.join(tiny_corpus, "spmel", "p225")
    files = [f for f in os.listdir(out) if f.endswith(".npy")]
    assert len(files) == 2
    a = np.load(os.path.join(out, files[0]))
    assert a.shape[1] == 80 and a.dtype == np.float32


def test_make_spect_cli_legacy(tiny_corpus, reference_dir):
    """--model_type legacy: the old-code 512-pt/257-bin pipeline
    ("old code/make_spect_old.py"); p225_003's output must stay inside the
    golden-test tolerance envelope of the bundled test_data/STFT fixtures'
    pipeline (tests/test_dsp.py::test_golden_legacy_stft_parity pins the
    numerics; this pins the CLI wiring and the (T, 257) layout)."""
    from autovc_tpu.cli.make_spect import main

    main(["--platform", "cpu", "--main_dir", tiny_corpus, "--model_type", "legacy"])
    out = os.path.join(tiny_corpus, "legacy", "p225")
    files = sorted(f for f in os.listdir(out) if f.endswith(".npy"))
    assert len(files) == 2
    a = np.load(os.path.join(out, files[0]))
    assert a.shape[1] == 257 and a.dtype == np.float32
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_make_metadata_cli_one_hot(tiny_corpus):
    from autovc_tpu.cli.make_metadata import main
    from autovc_tpu.data.manifest import load_conversion_metadata, load_train_manifest

    main(["--platform", "cpu", "--main_dir", tiny_corpus, "--one_hot", "--dim_emb", "8"])
    entries = load_train_manifest(os.path.join(tiny_corpus, "spmel", "train.pkl"))
    assert len(entries) == 2
    assert entries[0].embedding.shape == (8,)
    specs = load_conversion_metadata(os.path.join(tiny_corpus, "spmel", "metadata.pkl"))
    assert specs and specs[0].src_features.shape[1] == 80
    assert os.path.exists(os.path.join(tiny_corpus, "spmel", "metadata.log"))


@pytest.mark.slow
def test_train_convert_synthesize_evaluate_cli(tiny_corpus, capsys):
    from autovc_tpu.cli.convert import main as convert_main
    from autovc_tpu.cli.evaluate import main as evaluate_main
    from autovc_tpu.cli.synthesize import main as synthesize_main
    from autovc_tpu.cli.train import main as train_main

    train_main(
        [
            "--platform", "cpu", "--main_dir", tiny_corpus, "--run_name", "t",
            "--num_iters", "2", "--log_step", "1", "--checkpoint_step", "2",
            "--len_crop", "64", "--dim_emb", "8",
        ]
    )
    run_dir = os.path.join(tiny_corpus, "runs", sorted(os.listdir(os.path.join(tiny_corpus, "runs")))[0])

    convert_main(["--platform", "cpu", "--main_dir", tiny_corpus, "--run_dir", run_dir])
    results = [f for f in os.listdir(os.path.join(tiny_corpus, "spmel")) if f.startswith("results_")]
    assert results

    # the shipped-artifact path: export .npz, convert from it, same outputs
    from autovc_tpu.cli.export_ckpt import main as export_main
    from autovc_tpu.data.manifest import load_results

    art = os.path.join(tiny_corpus, "gen.npz")
    export_main(["--platform", "cpu", "--run_dir", run_dir, "--out", art])
    art_out = os.path.join(tiny_corpus, "spmel", "results_artifact.pkl")
    convert_main(
        ["--platform", "cpu", "--main_dir", tiny_corpus, "--artifact", art, "--out", art_out]
    )
    a = load_results(os.path.join(tiny_corpus, "spmel", results[0]))
    b = load_results(art_out)
    np.testing.assert_allclose(
        np.asarray(a[0][1]), np.asarray(b[0][1]), atol=1e-5
    )

    out_dir = os.path.join(tiny_corpus, "out")
    synthesize_main(
        [
            "--platform", "cpu",
            "--results", os.path.join(tiny_corpus, "spmel", results[0]),
            "--out_dir", out_dir, "--gl_iters", "4",
        ]
    )
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert wavs and os.path.exists(os.path.join(out_dir, "readme.md"))

    report = evaluate_main(
        ["--platform", "cpu", "--main_dir", tiny_corpus, "--run_dir", run_dir, "--max_utts", "2"]
    )
    assert report["utterances"] == 2 and np.isfinite(report["recon_l1_mean"])


def test_visualize_cli(tiny_corpus, tmp_path):
    from autovc_tpu.cli.visualize import main

    feat = os.path.join(tiny_corpus, "spmel", "p225")
    npy = os.path.join(feat, sorted(os.listdir(feat))[0])
    main([npy, "--out_dir", str(tmp_path)])
    assert list(tmp_path.glob("*.png"))


def test_batched_synthesis_helper():
    """Batched vocoder call: sorted-by-length grouping, pad, trim — each
    output equals per-item synthesis of an upsample-by-hop 'vocoder'."""
    from autovc_tpu.cli.synthesize import batched_synthesis

    hop = 4
    rng = np.random.default_rng(0)
    results = [
        (str(i), rng.normal(size=(t, 3)).astype(np.float32))
        for i, t in enumerate([7, 3, 5, 3])
    ]

    def fake_synth(mels):  # (B, T, 3) -> (B, T*hop): repeat frame means
        b, t, _ = mels.shape
        return np.repeat(mels.mean(-1), hop, axis=-1).reshape(b, t * hop)

    wavs = batched_synthesis(fake_synth, results, batch=2, hop=hop)
    for (name, mel), wav in zip(results, wavs):
        expect = np.repeat(mel.mean(-1), hop)
        assert wav.shape == expect.shape
        np.testing.assert_allclose(wav, expect, atol=1e-6)


def test_make_spect_device_path(tiny_corpus, tmp_path):
    """The --device (float32 accelerator) extraction stays close to the
    exact host path."""
    import shutil

    root = str(tmp_path / "dev_corpus")
    shutil.copytree(os.path.join(tiny_corpus, "wavs"), os.path.join(root, "wavs"))
    from autovc_tpu.cli.make_spect import main

    main(["--platform", "cpu", "--main_dir", root, "--device"])
    for spk in ("p225",):
        d = os.path.join(root, "spmel", spk)
        ref_d = os.path.join(tiny_corpus, "spmel", spk)
        for f in sorted(os.listdir(d)):
            a = np.load(os.path.join(d, f))
            b = np.load(os.path.join(ref_d, f))
            assert a.shape == b.shape
            # ~2e-4 f32-vs-f64 residual; 1e-3 would catch a reintroduced
            # double-highpass (the --device path once pre-filtered on host
            # AND let the frontend filter again)
            assert np.abs(a - b).max() < 1e-3


def test_evaluate_vocoder_cli(tiny_corpus, tmp_path, capsys):
    from autovc_tpu.cli.evaluate_vocoder import main

    out = tmp_path / "voc_eval.jsonl"
    main([
        "--platform", "cpu",
        "--spmel_dir", os.path.join(tiny_corpus, "spmel"),
        "--vocoder", "griffinlim", "--gl_iters", "4",
        "--max_utts", "1", "--out", str(out),
    ])
    rec = json.loads(out.read_text().strip())
    assert rec["vocoder"] == "griffinlim" and rec["utterances"] == 1
    assert 0.0 < rec["mel_l1_mean"] < 0.2  # GL at 4 iters is rough but sane


@pytest.mark.slow
def test_train_export_artifact_is_complete(tiny_corpus):
    """cli.train --export must write the full export_ckpt schema (params +
    batch_stats + __step__): BN eval mode needs the stats, so an artifact
    without them crashes every load_artifact consumer."""
    from autovc_tpu.cli.convert import main as convert_main
    from autovc_tpu.cli.export_ckpt import load_artifact
    from autovc_tpu.cli.train import main as train_main

    art = os.path.join(tiny_corpus, "train_export.npz")
    train_main(
        [
            "--platform", "cpu", "--main_dir", tiny_corpus, "--run_name", "texp",
            "--num_iters", "1", "--log_step", "1", "--checkpoint_step", "1",
            "--len_crop", "64", "--dim_emb", "8", "--export", art,
        ]
    )
    variables, step = load_artifact(art)
    assert step >= 1
    assert variables["batch_stats"], "exported artifact is missing batch_stats"
    # and the consumer path actually runs: convert straight from the artifact
    out = os.path.join(tiny_corpus, "spmel", "results_train_export.pkl")
    convert_main(
        ["--platform", "cpu", "--main_dir", tiny_corpus, "--artifact", art, "--out", out]
    )
    assert os.path.exists(out)


def test_make_spect_digitless_speaker_dir(tiny_corpus, tmp_path, reference_dir):
    """Speaker dirs without digits (non-VCTC naming) get a stable hashed
    dither seed instead of int('') crashing the whole extraction."""
    from autovc_tpu.cli.make_spect import main

    root = tmp_path / "named_corpus"
    d = root / "wavs" / "alice"
    d.mkdir(parents=True)
    src = os.path.join(reference_dir, "wavs", "p225")
    f = sorted(os.listdir(src))[0]
    shutil.copy(os.path.join(src, f), d / f)
    main(["--platform", "cpu", "--main_dir", str(root)])
    out = root / "spmel" / "alice"
    assert [p for p in os.listdir(out) if p.endswith(".npy")]
