"""Minimal production serving entrypoint over the HairFast API.

The reference ships no serving surface at all (its L4 orchestrator is a
Python class, hair_swap.py:27-133); this closes the gap with a
dependency-free HTTP server wired to the uint8 fused-output swap program —
the measured-fastest through-tunnel serving path (bench.py serving
metrics; the quantization runs INSIDE the swap program, one dispatch).

Endpoints
  GET  /healthz          -> {"status": "ok", "devices": [...], ...}
  POST /swap             -> image/png of the transfer
      multipart/form-data fields: face, shape, color (png/jpeg bytes)
      query params: upload_res=512  ship encoder inputs at 512^2
                    output_res=512  serve a 512^2 response
                    poisson=1       seamless-clone post-process
                    align=1         FFHQ-align in-the-wild photos first
                    seed=N          stochastic-noise mode under seed N

Usage
  python scripts/serve.py --zoo_dir pretrained_models_jax --port 8080 \
      --warmup                      # compile before accepting traffic
  curl -F face=@f.png -F shape=@s.png -F color=@c.png \
      "localhost:8080/swap?output_res=512" -o out.png

Design notes: requests serialize through one lock — a single chip runs one
swap at a time anyway (~0.1 s device p50; concurrent jit calls would just
queue in the runtime with worse tail latency). Batched throughput serving
belongs to `HairFast.swap_batch` behind a real queueing tier; this script
is the latency tier. ThreadingHTTPServer keeps decode/encode of other
requests off the critical path.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from email.parser import BytesParser
from email.policy import HTTP
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_multipart(headers, body: bytes) -> dict:
    """content-type aware multipart/form-data -> {field: bytes} (stdlib)."""
    msg = BytesParser(policy=HTTP).parsebytes(
        b"Content-Type: " + headers.get("Content-Type", "").encode() +
        b"\r\n\r\n" + body)
    if not msg.is_multipart():
        raise ValueError("expected multipart/form-data")
    out = {}
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        if name:
            out[name] = part.get_payload(decode=True)
    return out


def make_handler(hf, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        server_version = "hairfast-tpu"

        def log_message(self, fmt, *args):  # route access logs to stderr
            sys.stderr.write("%s - %s\n" % (self.address_string(),
                                            fmt % args))

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                import jax

                self._json(200, {
                    "status": "ok",
                    "devices": [str(d) for d in jax.devices()],
                    "generator_size": hf.cfg.stylegan.size,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/swap":
                self._json(404, {"error": "not found"})
                return
            try:
                body = self.rfile.read(int(self.headers["Content-Length"]))
                parts = parse_multipart(self.headers, body)
                missing = [k for k in ("face", "shape", "color")
                           if not parts.get(k)]
                if missing:
                    self._json(400, {"error": f"missing fields: {missing}"})
                    return
                from PIL import Image

                imgs = [Image.open(io.BytesIO(parts[k])).convert("RGB")
                        for k in ("face", "shape", "color")]
            except Exception as e:  # bad multipart / undecodable image
                self._json(400, {"error": f"bad request: {e!r}"})
                return

            q = parse_qs(url.query)

            def qint(k):
                return int(q[k][0]) if k in q else None

            try:
                with lock:  # one swap on the chip at a time (see docstring)
                    out = hf.swap(*imgs, output="uint8",
                                  upload_res=qint("upload_res"),
                                  output_res=qint("output_res"),
                                  poisson=bool(qint("poisson")),
                                  align=bool(qint("align")),
                                  seed=qint("seed"))
                buf = io.BytesIO()
                Image.fromarray(out).save(buf, format="PNG")
            except Exception as e:  # surface failures as 500, keep serving
                self._json(500, {"error": f"swap failed: {e!r}"})
                return
            self._send(200, buf.getvalue(), "image/png")

    return Handler


def build_server(hf, host: str = "127.0.0.1", port: int = 8080):
    return ThreadingHTTPServer((host, port), make_handler(hf,
                                                          threading.Lock()))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--zoo_dir", type=Path,
                    default=Path("pretrained_models_jax"))
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--warmup", action="store_true",
                    help="compile the uint8 'distinct' program before "
                         "accepting traffic (first request otherwise pays "
                         "the ~3 min full-pipeline TPU compile)")
    ap.add_argument("--tiny", action="store_true",
                    help="128-res random-weight config (CI smoke runs)")
    ap.add_argument("--micro", action="store_true",
                    help="--tiny with 0.25x trunk widths (cheapest CI "
                         "smoke; program structure only)")
    args = ap.parse_args(argv)

    import dataclasses

    import jax

    from hairfastgan_tpu.api import HairFast
    from hairfastgan_tpu.config import HairFastConfig

    if args.micro:
        from hairfastgan_tpu.zoo import init_micro_zoo_fast

        zoo, cfg = init_micro_zoo_fast(0)
        cfg = dataclasses.replace(cfg, compute_dtype="float32",
                                  compile_cache_dir=None)
        hf = HairFast(cfg, zoo=zoo)
    elif args.tiny:
        from hairfastgan_tpu.zoo import init_tiny_zoo

        zoo, cfg = init_tiny_zoo(jax.random.PRNGKey(0))
        cfg = dataclasses.replace(cfg, compute_dtype="float32",
                                  compile_cache_dir=None)
        hf = HairFast(cfg, zoo=zoo)
    else:
        cfg = dataclasses.replace(HairFastConfig(),
                                  checkpoint_dir=args.zoo_dir)
        hf = HairFast(cfg)

    if args.warmup:
        print("warming up (uint8 'distinct' program)...", flush=True)
        hf.warmup(cases=("distinct",), output="uint8")

    srv = build_server(hf, args.host, args.port)
    print(f"serving on {args.host}:{srv.server_address[1]} "
          f"(generator {hf.cfg.stylegan.size}^2)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
