"""Minimal stdlib HTTP server around :class:`PredictionService`.

No web-framework dependency (the environment is hermetic): requests are npz
payloads over plain HTTP, which any client can build with numpy alone.

Endpoints:

* ``GET /healthz`` — JSON: status + the compiled request contract
  (batch_size, num_context, num_preds, resolution).
* ``POST /predict`` — body: an ``.npz`` archive with
    - ``frames``: (B, num_context, H, W, 3) uint8 or float32 in [0, 1]
    - ``captions``: (B,) array of strings
  reply: an ``.npz`` archive with ``pred_frames`` (B, num_preds, H, W, 3)
  uint8.

Client example::

    import io, urllib.request, numpy as np
    buf = io.BytesIO()
    np.savez(buf, frames=frames, captions=np.array(captions))
    req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                 headers={"Content-Type": "application/npz"})
    with urllib.request.urlopen(req) as r:
        out = np.load(io.BytesIO(r.read()))["pred_frames"]
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from textocvp_tpu.core.logger import print_


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route access logs to logs.txt
            print_(f"serve: {self.address_string()} {fmt % args}")

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj: dict):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply_json(404, {"error": "unknown path"})
            h, w = service.resolution
            return self._reply_json(200, {
                "status": "ok",
                "batch_size": service.batch_size,
                "num_context": service.num_context,
                "num_preds": service.num_preds,
                "resolution": [h, w],
                "max_tokens": service.max_tokens,
            })

        def do_POST(self):
            # always drain the request body first: replying without reading
            # it would desync HTTP/1.1 keep-alive (the leftover bytes get
            # parsed as the next request line)
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length) if length else b""
            if self.path != "/predict":
                return self._reply_json(404, {"error": "unknown path"})
            try:
                payload = np.load(io.BytesIO(body), allow_pickle=False)
                frames = payload["frames"]
                captions = [str(c) for c in payload["captions"]]
                preds = service.predict(frames, captions)
                buf = io.BytesIO()
                np.savez(buf, pred_frames=np.rint(preds * 255).astype(np.uint8))
                return self._reply(200, buf.getvalue(), "application/npz")
            except (KeyError, ValueError) as e:
                return self._reply_json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - surface to the client
                return self._reply_json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service, host: str = "127.0.0.1", port: int = 8000,
          warmup: bool = True) -> ThreadingHTTPServer:
    """Create (and return) the HTTP server; caller runs serve_forever()."""
    if warmup:
        print_("serve: compiling (warmup request)...")
        service.warmup()
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print_(f"serve: listening on http://{host}:{httpd.server_address[1]} "
           f"(batch {service.batch_size}, {service.num_context} seed -> "
           f"{service.num_preds} predicted frames)")
    return httpd
