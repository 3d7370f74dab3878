"""HTTP frame server (role of all-is-cubes-server's axum webserver).

The reference serves its wasm client + static files (webserver.rs); a
TPU-hosted engine instead serves *rendered frames* and a minimal HTML
viewer that polls them — the session runs next to the device, browsers
are thin. Endpoints:

  GET /            — HTML viewer (canvas polling /frame.png, sending keys)
  GET /frame.png   — current frame (steps the session, renders)
  GET /info        — JSON session diagnostics (info_text, tick)
  POST /input      — JSON {keys: [..], look: [dyaw, dpitch]} input state

Uses only the standard library (http.server) per the environment's
no-new-dependencies rule.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = """<!doctype html>
<title>all-is-cubes (TPU)</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}</style>
<h3>all-is-cubes — TPU frame server</h3>
<img id=f width=640><div id=t></div>
<script>
const keys = new Set();
onkeydown = e => { keys.add(e.key.toLowerCase()); send(); };
onkeyup = e => { keys.delete(e.key.toLowerCase()); send(); };
function send(){ fetch('/input', {method:'POST', body: JSON.stringify({keys:[...keys]})}); }
document.addEventListener('click', e => {
  const img = document.getElementById('f');
  if (e.target !== img) return;
  const r = img.getBoundingClientRect();
  const x = (e.clientX - r.left) / r.width, y = (e.clientY - r.top) / r.height;
  fetch('/click', {method:'POST', body: JSON.stringify({x: x * img.naturalWidth, y: y * img.naturalHeight})});
});
async function loop(){
  document.getElementById('f').src = '/frame.png?' + Date.now();
  const r = await fetch('/info'); const j = await r.json();
  document.getElementById('t').textContent = j.info_text;
  setTimeout(loop, 100);
}
loop();
</script>
"""


class SessionServer:
    """Serve a Session over HTTP. `serve_forever` blocks; `start`
    backgrounds it (the webserver.rs role, stdlib-only)."""

    def __init__(self, session, host: str = "127.0.0.1", port: int = 8080):
        self.session = session
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, ctype, body: bytes):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _PAGE.encode())
                elif path == "/frame.png":
                    with outer.lock:
                        outer.session.maybe_step()
                        r = (
                            outer.session.render_with_ui()
                            if getattr(outer.session, "ui_state", None) is not None
                            else outer.session.render()
                        )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(r.data, "RGBA").save(buf, "PNG")
                    self._send(200, "image/png", buf.getvalue())
                elif path == "/info":
                    with outer.lock:
                        body = json.dumps(
                            dict(
                                info_text=outer.session.info_text,
                                paused=outer.session.paused,
                            )
                        ).encode()
                    self._send(200, "application/json", body)
                else:
                    self._send(404, "text/plain", b"not found")

            def do_POST(self):
                path = self.path.split("?")[0]
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if path == "/input":
                    with outer.lock:
                        outer.session.input.keys = set(payload.get("keys", []))
                    self._send(200, "application/json", b"{}")
                elif path == "/click":
                    with outer.lock:
                        result = outer.session.click(
                            float(payload.get("x", 0)),
                            float(payload.get("y", 0)),
                            int(payload.get("button", 0)),
                        )
                    self._send(
                        200, "application/json",
                        json.dumps({"result": repr(result)}).encode(),
                    )
                else:
                    self._send(404, "text/plain", b"not found")

        self.httpd = ThreadingHTTPServer((host, port), Handler)

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
