"""End-to-end conversion benchmark (driver contract: ONE JSON line on stdout).

Measures the north-star metric (BASELINE.md): end-to-end p225 -> p228 voice
conversion throughput per chip, as a real-time factor — seconds of audio
produced per wall-clock second, steady-state (post-compile), batched.

Pipeline timed: normalized mel features -> AutoVC Generator conversion ->
HiFi-GAN waveform synthesis (the parallel vocoder path; WaveNet
autoregressive samples/sec is reported separately on stderr).

vs_baseline is the ratio against the 50x-realtime north-star target.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from autovc_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    import jax.numpy as jnp

    from autovc_tpu.config import Config
    from autovc_tpu.data.manifest import load_train_manifest
    from autovc_tpu.models import build_generator
    from autovc_tpu.vocoder.hifigan import HiFiGANVocoder

    cfg = Config()
    log(f"devices: {jax.devices()}")

    # --- inputs: real p225 features + GE2E embeddings from the bundled corpus
    # (synthetic fallback keeps the bench runnable anywhere; compute cost is
    # identical since shapes and weights drive it, not values)
    try:
        feats = np.load("/root/reference/spmel/p225/p225_003.npy")  # (376, 80)
        entries = load_train_manifest("/root/reference/spmel/train.pkl")
        emb = {e.speaker_id: e.embedding for e in entries}
        emb_src, emb_trg = emb["p225"], emb["p228"]
    except (FileNotFoundError, OSError) as exc:
        log(f"reference corpus unavailable ({exc}); using synthetic inputs")
        rng = np.random.RandomState(0)
        feats = rng.rand(376, 80).astype(np.float32)
        emb_src = rng.randn(256).astype(np.float32)
        emb_trg = rng.randn(256).astype(np.float32)

    T_real = feats.shape[0]
    T_pad = 512  # bucket (multiple of freq=32)
    B = 32  # batch sweep on v5e: 506x RT @ B=8 -> 779x @ B=32 (LSTM weight
    # streaming amortizes across the batch)
    x = np.zeros((B, T_pad, 80), np.float32)
    x[:, :T_real] = feats
    e_src = np.tile(emb_src, (B, 1)).astype(np.float32)
    e_trg = np.tile(emb_trg, (B, 1)).astype(np.float32)

    # --- models: trained artifacts when present (artifacts/ is the documented
    # path, produced by cli.export_ckpt + cli.train_vocoder), random init
    # fallback (identical compute cost — shapes and weights drive it)
    import os

    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    gen_art = os.path.join(art_dir, "generator_spmel.npz")
    if not os.path.exists(gen_art):  # the repo ships the f16 artifact
        gen_art = os.path.join(art_dir, "generator_spmel_f16.npz")
    voc_art = os.path.join(art_dir, "hifigan.npz")

    model = build_generator(cfg.model)
    if os.path.exists(gen_art):
        from autovc_tpu.cli.export_ckpt import load_artifact

        variables, step = load_artifact(gen_art)
        log(f"generator weights: {gen_art} (trained, step {step})")
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x[:1]), jnp.asarray(e_src[:1]),
            jnp.asarray(e_trg[:1]), train=False,
        )
        log("generator weights: random init (no artifact found)")
    voc = HiFiGANVocoder.from_checkpoint(
        cfg.hifigan, voc_art if os.path.exists(voc_art) else None
    )
    log(f"vocoder weights: {voc_art if os.path.exists(voc_art) else 'random init'}")

    @jax.jit
    def e2e(variables, voc_params, x, es, et):
        _, mel_out, _ = model.apply(variables, x, es, et, train=False)
        wav = voc.model.apply({"params": voc_params}, mel_out)
        return wav

    xj, esj, etj = jnp.asarray(x), jnp.asarray(e_src), jnp.asarray(e_trg)

    log("compiling end-to-end program...")
    t0 = time.time()
    out = e2e(variables, voc.params, xj, esj, etj)
    _ = np.asarray(out[:, :16])  # real D2H sync (block_until_ready can lie
    # through the remote-device tunnel in this environment)
    log(f"compile+first run: {time.time() - t0:.1f}s, out {out.shape}")

    # --- steady-state timing, each iteration synced by a host fetch
    n_iters = 10
    t0 = time.time()
    for _ in range(n_iters):
        out = e2e(variables, voc.params, xj, esj, etj)
        _ = np.asarray(out[:, :16])
    wall = (time.time() - t0) / n_iters

    audio_seconds = B * T_real * cfg.audio.hop_length / cfg.audio.sample_rate
    rt_factor = audio_seconds / wall
    log(
        f"batch {B} x {T_real} frames ({audio_seconds:.1f}s audio) in "
        f"{wall*1000:.1f}ms -> {rt_factor:.1f}x realtime"
    )

    # --- secondary: WaveNet autoregressive samples/sec. Opt-in: the 24-layer
    # scan body is a long AOT compile on tunneled-TPU environments and must
    # not jeopardize the headline bench (run BENCH_WAVENET=1 python bench.py).
    import os

    if os.environ.get("BENCH_WAVENET"):
        try:
            from autovc_tpu.vocoder.wavenet import WaveNetVocoder

            wn = WaveNetVocoder(cfg.wavenet)
            mel_small = jnp.asarray(x[:1, :16])  # 16 frames -> 4096 samples
            t0 = time.time()
            np.asarray(wn.generate(mel_small[0]))
            compile_s = time.time() - t0
            t0 = time.time()
            np.asarray(wn.generate(mel_small[0]))
            gen_s = time.time() - t0
            sps = 4096 / gen_s
            log(f"wavenet: compile {compile_s:.1f}s, {sps:.0f} samples/s (batch 1)")
        except Exception as exc:  # pragma: no cover
            log(f"wavenet probe skipped: {exc}")

    print(
        json.dumps(
            {
                "metric": "e2e_conversion_realtime_factor",
                "value": round(rt_factor, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rt_factor / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
