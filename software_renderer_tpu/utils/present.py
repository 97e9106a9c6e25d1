"""Live present surface: an HTTP viewer for the frame loop.

The reference presents frames on screen through an MTKView drawable at
vsync (renderer/App.swift:17-109 — Coordinator.draw blits the render
target and calls present). A TPU host is headless, so the native
"screen" is a browser tab: :class:`PresentServer` holds the latest
encoded frame and serves

  /            a viewer page that repaints at the display refresh rate
               (requestAnimationFrame, the vsync analogue) and shows the
               render/present FPS counters,
  /frame.png   the most recent frame (no-cache),
  /stats.json  {"frame": n, "fps": render-side FPS}.

Everything is stdlib (``http.server`` + the in-memory PNG encoder in
utils/image_io.py); the server thread only ever touches the latest
encoded bytes, so a slow viewer drops frames instead of back-pressuring
the render loop — the same policy as the reference's triple-buffered
drawable pool, where a missed vsync reuses the newest complete frame.

Usage::

    loop = FrameLoop(scene_fn, transform_fn)
    with PresentServer() as srv:        # prints the URL
        loop.run(600, present=srv)
"""

from __future__ import annotations

import json
import threading
import time as _time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..framebuffer import to_rgba8
from .image_io import encode_png
from .log import get_logger

log = get_logger("present")

_PAGE = b"""<!doctype html>
<html><head><title>software-renderer-tpu</title><style>
 body { background:#111; color:#ddd; font:13px monospace; margin:16px }
 img { image-rendering:pixelated; border:1px solid #333; max-width:100% }
</style></head><body>
<div id=s>connecting...</div><p><img id=v></p>
<script>
const v = document.getElementById('v'), s = document.getElementById('s');
let shown = 0, t0 = performance.now(), last = -1;
async function stats() {
  try {
    const r = await (await fetch('stats.json')).json();
    if (r.frame !== last) {
      last = r.frame;
      v.src = 'frame.png?' + r.frame;   // cache-bust per new frame only
      shown++;
    }
    const pfps = shown / ((performance.now() - t0) / 1000);
    s.textContent = 'frame ' + r.frame + ' | render ' +
      r.fps.toFixed(1) + ' FPS | present ' + pfps.toFixed(1) + ' FPS';
  } catch (e) { s.textContent = 'stream ended'; return; }
  requestAnimationFrame(stats);
}
stats();
</script></body></html>
"""


class PresentServer:
    """Serves the latest rendered frame over HTTP (the MTKView analogue).

    Thread-safe: :meth:`present` may be called from the frame loop while
    any number of viewer requests are in flight. Holding only the newest
    frame (not a queue) is deliberate — present never blocks rendering.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 png_level: int = 1):
        self._lock = threading.Lock()
        self._png = encode_png(np.zeros((2, 2, 4), np.uint8))
        self._frame = -1
        self._fps = 0.0
        self._t_last = None
        self._png_level = png_level  # speed over size: it's a localhost wire
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through our logger
                log.debug("http: " + fmt, *args)

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/" or path == "/index.html":
                    self._reply(200, "text/html", _PAGE)
                elif path == "/frame.png":
                    with server._lock:
                        body = server._png
                    self._reply(200, "image/png", body)
                elif path == "/stats.json":
                    with server._lock:
                        body = json.dumps({"frame": server._frame,
                                           "fps": server._fps}).encode()
                    self._reply(200, "application/json", body)
                else:
                    self._reply(404, "text/plain", b"not found")

            def _reply(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                try:
                    self.wfile.write(body)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # viewer navigated away mid-frame

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/"

    def start(self) -> "PresentServer":
        self._thread.start()
        log.info("present surface live at %s", self.url)
        print(f"[present] viewer: {self.url}", flush=True)
        return self

    def present(self, color) -> None:
        """Publish a frame ([H, W, 4] float or uint8 array / device array).

        Called by FrameLoop.run(present=...) with the PREVIOUS frame's
        framebuffer, so encoding overlaps the device rendering the next
        frame (utils/display.py's encode-behind-device pipelining).
        """
        img = np.asarray(to_rgba8(color))
        png = encode_png(img, level=self._png_level)
        now = _time.perf_counter()
        with self._lock:
            if self._t_last is not None:
                dt = now - self._t_last
                inst = 1.0 / dt if dt > 0 else 0.0
                # EMA so the counter is readable, not jittery.
                self._fps = inst if self._fps == 0.0 else (
                    0.9 * self._fps + 0.1 * inst)
            self._t_last = now
            self._frame += 1
            self._png = png

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "PresentServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
