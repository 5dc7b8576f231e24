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
    import os

    import jax

    from autovc_tpu.compile_cache import enable as _enable_cache

    # Repo-local persistent cache (same one __graft_entry__ uses): warmed
    # entries for the exact bench shapes are committed with the repo, so the
    # driver sandbox — where ~/.cache does not persist — gets cache hits
    # instead of the 925 s cold compile BENCH_r02 recorded.
    _enable_cache(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"))
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
    except Exception as exc:
        # ANY corpus problem (missing file, speakers absent from a rebuilt
        # train.pkl, pickle drift) must fall back, not crash: the driver
        # contract is one JSON line on stdout no matter what
        log(f"reference corpus unavailable ({exc}); using synthetic inputs")
        rng = np.random.RandomState(0)
        feats = rng.rand(376, 80).astype(np.float32)
        emb_src = rng.randn(256).astype(np.float32)
        emb_trg = rng.randn(256).astype(np.float32)

    T_real = feats.shape[0]
    T_pad = 512  # bucket (multiple of freq=32)
    # batch sweep on v5e: 506x RT @ B=8 -> 779x @ B=32 (LSTM weight
    # streaming amortizes across the batch). BENCH_B overrides for sweep
    # experiments; 32 stays the protocol default (committed warm-cache
    # entries and cross-round comparability are tied to it).
    B = int(os.environ.get("BENCH_B", "32"))
    x = np.zeros((B, T_pad, 80), np.float32)
    x[:, :T_real] = feats
    e_src = np.tile(emb_src, (B, 1)).astype(np.float32)
    e_trg = np.tile(emb_trg, (B, 1)).astype(np.float32)

    # --- models: trained artifacts when present (artifacts/ is the documented
    # path, produced by cli.export_ckpt + cli.train_vocoder), random init
    # fallback (identical compute cost — shapes and weights drive it)
    art_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
    gen_art = os.path.join(art_dir, "generator_spmel.npz")
    if not os.path.exists(gen_art):  # the repo ships the f16 artifact
        gen_art = os.path.join(art_dir, "generator_spmel_f16.npz")
    voc_art = os.path.join(art_dir, "hifigan.npz")

    from dataclasses import replace as _dc_replace

    model = build_generator(cfg.model)  # f32 compute
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

    def make_e2e(gen_model, bf16: bool):
        @jax.jit
        def e2e(variables, voc_params, x, es, et):
            _, mel_out, _ = gen_model.apply(variables, x, es, et, train=False)
            mel32 = mel_out.astype(jnp.float32)
            wav = voc.model.apply(
                {"params": voc_params},
                mel32.astype(jnp.bfloat16) if bf16 else mel32,
            )
            return mel32, wav.astype(jnp.float32)

        return e2e

    xj, esj, etj = jnp.asarray(x), jnp.asarray(e_src), jnp.asarray(e_trg)

    # --- precision selection. bf16 is the headline (MXU-native); its parity
    # vs f32 (mel max-abs delta on [0,1]-normalized mels) is measured ONCE on
    # hardware and committed to artifacts/bf16_parity.json, so the driver run
    # compiles a single program. Set BENCH_DTYPE=f32 to force f32; delete the
    # parity file to re-measure (compiles both programs).
    parity_path = os.path.join(art_dir, "bf16_parity.json")
    want_bf16 = os.environ.get("BENCH_DTYPE", "bf16") != "f32"
    use_bf16 = False
    e2e = gen_model = voc_params = None  # reused from a fresh parity measure
    if want_bf16:
        if os.path.exists(parity_path):
            with open(parity_path) as f:
                parity = json.load(f)
            use_bf16 = bool(parity.get("ok"))
            log(f"bf16 parity (recorded): {parity}")
        else:
            log("measuring bf16-vs-f32 parity (two compiles)...")
            e2e_f32 = make_e2e(model, bf16=False)
            mel32, wav32 = e2e_f32(variables, voc.params, xj, esj, etj)
            mel32, wav32 = np.asarray(mel32), np.asarray(wav32)
            model_bf16 = build_generator(
                _dc_replace(cfg.model, compute_dtype="bfloat16")
            )
            voc_params_bf16 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.bfloat16), voc.params
            )
            e2e_bf16 = make_e2e(model_bf16, bf16=True)
            melb, wavb = e2e_bf16(variables, voc_params_bf16, xj, esj, etj)
            melb, wavb = np.asarray(melb), np.asarray(wavb)
            mel_max = float(np.abs(melb - mel32).max())
            mel_mean = float(np.abs(melb - mel32).mean())
            wav_max = float(np.abs(wavb - wav32).max())
            parity = {
                "mel_maxabs_delta": mel_max,
                "mel_meanabs_delta": mel_mean,
                "wav_maxabs_delta": wav_max,
                "ok": mel_max <= 0.06,
            }
            log(f"bf16 parity (measured): {parity}")
            try:
                with open(parity_path, "w") as f:
                    json.dump(parity, f)
            except OSError:
                pass
            use_bf16 = parity["ok"]
            # the winning program is already compiled — reuse it instead of
            # rebuilding an identical closure (a full redundant AOT compile
            # on this tunnel when the persistent cache is cold)
            if use_bf16:
                gen_model, voc_params, e2e = model_bf16, voc_params_bf16, e2e_bf16
            else:
                gen_model, voc_params, e2e = model, voc.params, e2e_f32

    if e2e is None:
        if use_bf16:
            gen_model = build_generator(
                _dc_replace(cfg.model, compute_dtype="bfloat16")
            )
            voc_params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.bfloat16), voc.params
            )
        else:
            gen_model, voc_params = model, voc.params
        e2e = make_e2e(gen_model, bf16=use_bf16)
    dtype_name = "bf16" if use_bf16 else "f32"
    log(f"compiling end-to-end program ({dtype_name})...")
    t0 = time.time()
    _, out = e2e(variables, voc_params, xj, esj, etj)
    _ = np.asarray(out[:, :16])  # real D2H sync (block_until_ready can lie
    # through the remote-device tunnel in this environment)
    log(f"compile+first run: {time.time() - t0:.1f}s, out {out.shape}")

    # --- steady-state timing, each iteration synced by a host fetch
    n_iters = 10
    t0 = time.time()
    for _ in range(n_iters):
        _, out = e2e(variables, voc_params, xj, esj, etj)
        _ = np.asarray(out[:, :16])
    wall = (time.time() - t0) / n_iters

    audio_seconds = B * T_real * cfg.audio.hop_length / cfg.audio.sample_rate
    rt_factor = audio_seconds / wall
    log(
        f"batch {B} x {T_real} frames ({audio_seconds:.1f}s audio, {dtype_name}) "
        f"in {wall*1000:.1f}ms -> {rt_factor:.1f}x realtime"
    )

    # --- secondary: WaveNet autoregressive samples/sec. Opt-in: the 24-layer
    # scan body is a long AOT compile on tunneled-TPU environments and must
    # not jeopardize the headline bench (run BENCH_WAVENET=1 python bench.py).
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
