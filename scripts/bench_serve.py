"""Serving throughput: micro-batched vs serial request handling.

Starts `cli.serve` twice on the same AOT bundle (batching off, then on),
drives N concurrent clients posting real corpus utterances over HTTP, and
reports requests/s, latency percentiles, and the server's observed batch
sizes (/stats). This measures the full production surface — HTTP + npz
parse + device call — not just the program call, so the batching win is
what a deployment would actually see.

Usage: python scripts/bench_serve.py --bundle DIR [--platform tpu]
           [--clients 16] [--requests 64] [--frames 256]
"""

from __future__ import annotations

import os
import sys

# Detached drivers run `python scripts/<name>.py`, which puts scripts/ (not
# the repo root) on sys.path; make autovc_tpu importable regardless of cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import io
import json
import subprocess
import threading
import time
import urllib.request

import numpy as np


def wait_healthy(base: str, proc, timeout_s: float = 1200.0) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(1.0)
        if proc.poll() is not None:
            sys.exit(f"server died:\n{proc.stdout.read()}")
        try:
            if urllib.request.urlopen(base + "/healthz", timeout=2).read() == b"ok":
                return
        except Exception:
            continue
    sys.exit("server never became healthy")


def run_side(args, batch_window_ms: float, payloads) -> dict:
    port = args.port + (1 if batch_window_ms > 0 else 0)
    cmd = [
        sys.executable, "-u", "-m", "autovc_tpu.cli.serve",
        "--bundle", args.bundle, "--port", str(port),
        "--warmup", str(args.frames),
    ]
    if args.platform:
        cmd += ["--platform", args.platform]
    if batch_window_ms > 0:
        cmd += ["--batch_window", str(batch_window_ms),
                "--max_batch", str(args.max_batch),
                "--bucket", str(args.bucket)]
    # the child resolves `-m autovc_tpu.cli.serve` from ITS environment, not
    # the parent's sys.path — export the repo root so a detached driver can
    # run this script from any cwd
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        wait_healthy(base, proc)
        latencies = [None] * len(payloads)

        # one warm pass to specialize the batched (b, tb) combos before timing
        def post(i, sink):
            t0 = time.monotonic()
            try:
                resp = urllib.request.urlopen(
                    base + "/convert", data=payloads[i], timeout=1800
                )
                resp.read()
            except Exception as exc:
                # record the failure instead of leaving None in the sink (a
                # single bad request must not crash the percentile math after
                # the whole bench already ran)
                sink[i] = exc
                return
            sink[i] = time.monotonic() - t0

        warm = [None] * len(payloads)
        sem = threading.Semaphore(args.clients)

        def bounded(i, sink):
            with sem:
                post(i, sink)

        warm_stats = None
        for sink in (warm, latencies):
            threads = [
                threading.Thread(target=bounded, args=(i, sink))
                for i in range(len(payloads))
            ]
            t_start = time.monotonic()
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            wall = time.monotonic() - t_start
            if sink is warm:
                # snapshot so the timed pass's batch stats can be isolated
                # (the server accumulates across both passes)
                warm_stats = json.loads(
                    urllib.request.urlopen(base + "/stats").read()
                )

        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        if warm_stats and stats.get("batching"):
            calls = stats["program_calls"] - warm_stats["program_calls"]
            reqs = stats["requests"] - warm_stats["requests"]
            stats = dict(
                stats,
                program_calls=calls,
                requests=reqs,
                mean_batch=round(reqs / calls, 2) if calls else None,
                note="timed pass only (warm pass subtracted)",
            )
        failures = [x for x in latencies if not isinstance(x, float)]
        lat = sorted(x for x in latencies if isinstance(x, float))
        if not lat:
            sys.exit(f"all {len(latencies)} timed requests failed: {failures[:3]}")
        return {
            "batch_window_ms": batch_window_ms,
            "requests": len(payloads),
            "failed": len(failures),
            "wall_s": round(wall, 3),
            "req_per_s": round(len(lat) / wall, 2),
            "p50_s": round(lat[len(lat) // 2], 3),
            "p95_s": round(lat[min(int(len(lat) * 0.95), len(lat) - 1)], 3),
            "server_stats": stats,
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--port", type=int, default=8941)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--window_ms", type=float, default=20.0)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(0)
    with open(args.bundle + "/manifest.json") as f:
        manifest = json.load(f)
    payloads = []
    for _ in range(args.requests):
        feats = rng.rand(args.frames, manifest["n_bins"]).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, features=feats,
                 emb_org=rng.rand(manifest["dim_emb"]).astype(np.float32),
                 emb_trg=rng.rand(manifest["dim_emb"]).astype(np.float32))
        payloads.append(buf.getvalue())

    serial = run_side(args, 0.0, payloads)
    print("serial :", json.dumps(serial))
    batched = run_side(args, args.window_ms, payloads)
    print("batched:", json.dumps(batched))
    speedup = batched["req_per_s"] / serial["req_per_s"]
    rec = {"serial": serial, "batched": batched,
           "speedup": round(speedup, 2), "clients": args.clients,
           "frames": args.frames, "bundle": args.bundle}
    print(json.dumps({"speedup": rec["speedup"]}))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
