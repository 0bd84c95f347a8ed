"""scripts/serve.py behavior: healthz, multipart swap round-trip, error paths.

Runs the server in-process on an ephemeral port against the micro zoo (the
serving surface is pure plumbing over HairFast.swap, whose numerics are
covered elsewhere)."""

import dataclasses
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from hairfastgan_tpu.api import HairFast
from hairfastgan_tpu.zoo import init_micro_zoo_fast


@pytest.fixture(scope="module")
def server():
    from scripts.serve import build_server

    zoo, cfg = init_micro_zoo_fast(0)
    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    hf = HairFast(cfg, zoo=zoo)
    srv = build_server(hf, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", hf
    srv.shutdown()


def _png_bytes(rng, size):
    from PIL import Image

    buf = io.BytesIO()
    arr = rng.randint(0, 255, (size, size, 3), np.uint8)
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _multipart(fields):
    boundary = b"xXhairfastXx"
    body = b""
    for name, data in fields.items():
        body += (b"--" + boundary + b"\r\n"
                 b'Content-Disposition: form-data; name="' + name.encode()
                 + b'"; filename="' + name.encode() + b'.png"\r\n'
                 b"Content-Type: image/png\r\n\r\n" + data + b"\r\n")
    body += b"--" + boundary + b"--\r\n"
    return body, {"Content-Type":
                  "multipart/form-data; boundary=" + boundary.decode()}


def _post(url, body, headers):
    req = urllib.request.Request(url, data=body, headers=headers)
    return urllib.request.urlopen(req, timeout=600)


def test_healthz(server):
    base, hf = server
    with urllib.request.urlopen(base + "/healthz", timeout=60) as r:
        d = json.loads(r.read())
    assert d["status"] == "ok"
    assert d["generator_size"] == hf.cfg.stylegan.size


def test_swap_roundtrip_png(server):
    from PIL import Image

    base, hf = server
    rng = np.random.RandomState(0)
    size = hf.cfg.stylegan.size
    fields = {k: _png_bytes(rng, size) for k in ("face", "shape", "color")}
    body, headers = _multipart(fields)
    with _post(base + "/swap", body, headers) as r:
        assert r.headers["Content-Type"] == "image/png"
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (size, size)
    assert np.asarray(img).shape == (size, size, 3)


def test_swap_missing_field_400(server):
    base, hf = server
    rng = np.random.RandomState(1)
    fields = {"face": _png_bytes(rng, hf.cfg.stylegan.size)}
    body, headers = _multipart(fields)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/swap", body, headers)
    assert e.value.code == 400
    assert "missing" in json.loads(e.value.read())["error"]


def test_swap_bad_image_400(server):
    base, _ = server
    fields = {"face": b"not a png", "shape": b"nope", "color": b"nope"}
    body, headers = _multipart(fields)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/swap", body, headers)
    assert e.value.code == 400
