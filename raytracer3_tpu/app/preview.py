"""MJPEG-over-HTTP live preview for the interactive viewer.

The reference presents every frame to a real window through a swapchain with
IMMEDIATE present (src/renderer/vulkan/swapchain.rs:50-62,181-194); a TPU
host has no display, so the "swapchain" is a tiny in-process HTTP server:

- ``/``          minimal HTML page wrapping the stream
- ``/stream``    multipart/x-mixed-replace MJPEG — any browser renders it live
- ``/frame.jpg`` single latest frame

Frames are *pulled by demand*: ``publish`` encodes and fans out only when at
least one client is connected and ``min_interval`` has elapsed — so an
unattended render never pays the device→host transfer or JPEG encode.
"""

from __future__ import annotations

import io
import threading
import time

import numpy as np

_BOUNDARY = b"rt3frame"

_INDEX_HTML = b"""<!doctype html>
<html><head><title>raytracer3_tpu live</title>
<style>body{margin:0;background:#111;display:grid;place-items:center;height:100vh}
img{max-width:100vw;max-height:100vh;image-rendering:pixelated}</style></head>
<body><img src="/stream" alt="live render"></body></html>
"""


class PreviewServer:
    """Threaded MJPEG sink. ``start()`` then ``publish(img)`` per frame."""

    def __init__(
        self, port: int = 8787, quality: int = 85, min_interval: float = 0.2
    ):
        self.port = port
        self.quality = quality
        self.min_interval = min_interval
        self._cond = threading.Condition()
        self._jpeg: bytes | None = None
        self._seq = 0
        self._clients = 0
        self._last_pub = 0.0
        self._httpd = None
        self._thread = None

    # -- publishing --------------------------------------------------------

    def wants_frame(self) -> bool:
        """True when a client is connected and the rate limiter allows —
        callers skip the device pull entirely otherwise."""
        return (
            self._clients > 0
            and (time.perf_counter() - self._last_pub) >= self.min_interval
        )

    def publish(self, img) -> bool:
        """Encode [H,W,3] float (0..1) or uint8 and wake streaming clients.
        Returns False (and does nothing) when no client wants a frame."""
        if not self.wants_frame():
            return False
        from PIL import Image

        a = np.asarray(img)
        if a.dtype != np.uint8:
            a = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(a).save(buf, format="JPEG", quality=self.quality)
        with self._cond:
            self._jpeg = buf.getvalue()
            self._seq += 1
            self._last_pub = time.perf_counter()
            self._cond.notify_all()
        return True

    # -- server ------------------------------------------------------------

    def start(self):
        import http.server
        import socketserver

        server = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(_INDEX_HTML)))
                    self.end_headers()
                    self.wfile.write(_INDEX_HTML)
                elif self.path == "/frame.jpg":
                    with server._cond:
                        data = server._jpeg
                    if data is None:
                        self.send_response(503)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        f"multipart/x-mixed-replace; boundary={_BOUNDARY.decode()}",
                    )
                    self.end_headers()
                    server._clients += 1
                    last = -1
                    try:
                        while True:
                            with server._cond:
                                server._cond.wait_for(
                                    lambda: server._seq != last, timeout=5.0
                                )
                                if server._seq == last or server._jpeg is None:
                                    continue  # keepalive tick
                                data = server._jpeg
                                last = server._seq
                            self.wfile.write(
                                b"--" + _BOUNDARY + b"\r\n"
                                b"Content-Type: image/jpeg\r\n"
                                + f"Content-Length: {len(data)}\r\n\r\n".encode()
                            )
                            self.wfile.write(data)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    finally:
                        server._clients -= 1
                else:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()

        class Srv(socketserver.ThreadingMixIn, http.server.HTTPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._httpd = Srv(("0.0.0.0", self.port), Handler)
        self.port = self._httpd.server_address[1]  # resolve port 0
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None
