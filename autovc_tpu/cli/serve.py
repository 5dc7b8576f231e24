"""Conversion server: load an AOT bundle, serve conversions over HTTP.

The deployment counterpart of cli.export_serving: a long-lived process that
deserializes the exported StableHLO programs once (autovc_tpu.serve) and
answers conversion requests — the production-shaped replacement for the
reference's rerun-the-scripts workflow (conversion.py + vocoder.py per
batch of conversions).

Protocol (stdlib-only, binary npz in / npy out):

  GET  /healthz    -> 200 "ok" once the bundle is loaded and warmed
  GET  /manifest   -> 200 manifest.json of the loaded bundle
  POST /convert    -> body: npz with arrays
                        features (T, n_bins) f32   normalized features
                        emb_org (dim_emb,)   f32   source speaker d-vector
                        emb_trg (dim_emb,)   f32   target speaker d-vector
                      response: .npy — converted features (T, n_bins), or
                      the waveform (T*hop,) f32 for with_vocoder bundles

Client sketch::

    buf = io.BytesIO(); np.savez(buf, features=f, emb_org=a, emb_trg=b)
    wav = np.load(io.BytesIO(urlopen(url + "/convert", buf.getvalue()).read()))

Requests are serialized through one device; each distinct padded length
XLA-specializes once and is cached by the runtime thereafter (pair with
--warmup to pre-specialize the common buckets before serving traffic).

Usage: python -m autovc_tpu.cli.serve --bundle DIR [--port 8765]
           [--warmup 256,512] [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import io
import json
import threading


def make_handler(srv, lock):
    """HTTP handler bound to a loaded ServingConverter (kept importable and
    server-free for tests)."""
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/manifest":
                self._send(
                    200, json.dumps(srv.manifest).encode(), "application/json"
                )
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            import numpy as np

            if self.path != "/convert":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = np.load(io.BytesIO(self.rfile.read(n)))
                feats = np.asarray(data["features"], np.float32)
                eo = np.asarray(data["emb_org"], np.float32)
                et = np.asarray(data["emb_trg"], np.float32)
                if feats.ndim != 2 or feats.shape[1] != srv.manifest["n_bins"]:
                    raise ValueError(
                        f"features must be (T, {srv.manifest['n_bins']}), "
                        f"got {feats.shape}"
                    )
                with lock:  # one device; serialize calls
                    out = srv.convert(feats, eo, et)
            except Exception as exc:  # malformed request -> 400, not a crash
                self._send(400, f"{type(exc).__name__}: {exc}".encode(), "text/plain")
                return
            buf = io.BytesIO()
            np.save(buf, np.asarray(out, np.float32))
            self._send(200, buf.getvalue())

        def log_message(self, fmt, *args):  # route to stdout, not stderr spam
            print(f"[serve] {self.address_string()} {fmt % args}")

    return Handler


def main(argv=None):
    from autovc_tpu.cli._common import add_platform_arg, apply_platform

    ap = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(ap)
    ap.add_argument("--bundle", required=True, help="export_serving output dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument(
        "--warmup",
        default="",
        help="comma-separated frame counts to pre-specialize (e.g. 256,512)",
    )
    args = ap.parse_args(argv)
    apply_platform(args)

    import numpy as np
    from http.server import ThreadingHTTPServer

    from autovc_tpu.serve import ServingConverter

    srv = ServingConverter(args.bundle)
    emb = np.zeros((srv.manifest["dim_emb"],), np.float32)
    for tok in args.warmup.split(","):
        if tok.strip():
            t = int(tok)
            srv.convert(np.zeros((t, srv.manifest["n_bins"]), np.float32), emb, emb)
            print(f"[serve] warmed T={t}")

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(srv, threading.Lock()))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(bundle: {args.bundle}, vocoder: {srv.manifest['with_vocoder']})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        httpd.server_close()


if __name__ == "__main__":
    main()
