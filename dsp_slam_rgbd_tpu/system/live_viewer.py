"""Live map viewer: the reference Viewer's role, TPU-host-native.

The reference opens a Pangolin GL window on the SLAM machine
(`src/Viewer.cc:60`, drawing via MapDrawer/ObjectDrawer each frame).  TPU
hosts are headless — the equivalent surface is an HTTP endpoint: a
background thread renders the CURRENT map (camera trajectory + point
cloud + object boxes, top-down) to PNG at a fixed rate and serves it with
an auto-refreshing page.  Point any browser at http://host:port/ while a
run is live.

The render thread reads the system's adopted state (an atomic pytree
reference — bounded-stale by design, like every consumer of the map) and
fetches only what it draws; the SLAM loop is never blocked.

Usage::

    viewer = LiveViewer(system, port=8765)
    ...  # tracking loop
    viewer.close()

or `tools/run_slam.py --live-port 8765`.
"""
from __future__ import annotations

import io
import threading

import numpy as np

_PAGE = b"""<!doctype html>
<html><head><title>dsp-slam-rgbd-tpu live map</title>
<meta http-equiv="refresh" content="2">
<style>body{background:#111;color:#ddd;font-family:monospace;margin:1em}
img{max-width:95vw;border:1px solid #333}</style></head>
<body><h3>dsp-slam-rgbd-tpu &mdash; live map</h3>
<div id="s"></div><img src="/map.png"></body></html>
"""


def _render_png(system) -> bytes:
    """Render the current map to PNG bytes (MapDrawer role)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.ops import lie

    st = system.state  # adopted (bounded-stale) snapshot
    kv = np.asarray(st.kf_valid)
    poses = np.asarray(st.kf_pose)[kv]
    pts = np.asarray(st.pt_pos)[np.asarray(st.pt_valid)]
    ov = np.asarray(st.obj_valid)
    obj_c = np.asarray(st.obj_pose)[ov][:, :3, 3] if ov.any() else None

    centers = np.stack(
        [np.asarray(lie.inv_se3(jnp.asarray(T)))[:3, 3] for T in poses]
    ) if len(poses) else np.zeros((0, 3))
    fig, ax = plt.subplots(figsize=(7, 7))
    fig.patch.set_facecolor("#111111")
    ax.set_facecolor("#111111")
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=0.4, c="gray", alpha=0.4)
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], "-", c="#7fd34f", lw=1.5)
        ax.plot(centers[-1, 0], centers[-1, 2], "o", c="#ff5f56", ms=5)
    if obj_c is not None and len(obj_c):
        ax.scatter(obj_c[:, 0], obj_c[:, 2], marker="s", s=60,
                   facecolors="none", edgecolors="#56b6ff")
    ax.set_aspect("equal")
    for sp in ax.spines.values():
        sp.set_color("#444444")
    ax.tick_params(colors="#888888")
    ax.set_title(
        f"kf={int(kv.sum())}  pts={len(pts)}  "
        f"objs={0 if obj_c is None else len(obj_c)}  "
        f"loops={system.loop_closures}  status={system.tracker.status}",
        color="#dddddd", fontsize=9)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight",
                facecolor=fig.get_facecolor())
    plt.close(fig)
    return buf.getvalue()


class LiveViewer:
    """Serve a live top-down map view over HTTP (Viewer/MapDrawer role)."""

    def __init__(self, system, port: int = 8765, refresh_s: float = 1.5):
        import http.server

        self._system = system
        self._refresh = refresh_s
        self._png = b""
        self._png_lock = threading.Lock()
        self._stop = threading.Event()
        viewer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path.startswith("/map.png"):
                    with viewer._png_lock:
                        body = viewer._png
                    ctype = "image/png"
                else:
                    body, ctype = _PAGE, "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._httpd = http.server.ThreadingHTTPServer(("0.0.0.0", port),
                                                      Handler)
        self.port = self._httpd.server_address[1]
        self._render_thread = threading.Thread(target=self._render_loop,
                                               daemon=True,
                                               name="live-viewer-render")
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True,
            name="live-viewer-http")
        self._render_thread.start()
        self._serve_thread.start()

    def _render_loop(self):
        while not self._stop.is_set():
            try:
                png = _render_png(self._system)
                with self._png_lock:
                    self._png = png
            except Exception:
                pass  # transient (state mid-swap / empty map): keep last
            self._stop.wait(self._refresh)

    def close(self):
        self._stop.set()
        self._httpd.shutdown()
        self._render_thread.join(timeout=5.0)
