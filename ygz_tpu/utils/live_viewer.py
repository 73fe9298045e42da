"""Live viewer: a background HTTP server streaming the current map and
frame renders to a browser.

The reference runs a Pangolin GUI thread repainting at ~30 fps
(/root/reference/src/Viewer.cc:49-206, MapDrawer/FrameDrawer). A TPU pod
host has no display, so the TPU-native equivalent is a zero-dependency
web viewer: a render thread snapshots the tracker at its own pace
(never blocking the tracking loop, same decoupling as the reference's
viewer thread) and an `http.server` serves the latest PNGs + a stats
JSON to any browser. Start with `--viewer PORT` on any dataset CLI.

Endpoints:
  /            auto-refreshing dashboard page
  /map.png     map points + keyframe frusta + covisibility (utils.viewer)
  /frame.png   current frame with tracked features
  /stats.json  state / keyframe / map-point / inlier counters
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = b"""<!doctype html>
<html><head><title>ygz_tpu live</title>
<style>body{background:#111;color:#ddd;font-family:monospace}
img{max-width:48%;border:1px solid #333;margin:4px}
button{background:#222;color:#ddd;border:1px solid #555;margin:2px;
padding:4px 10px;cursor:pointer}
button.on{background:#375a37}</style>
<script>
async function ctl(cmd){
  const r = await fetch('/control?cmd=' + cmd);
  const s = await r.json();
  for (const k of ['follow','localization']){
    const b = document.getElementById(k);
    if (b) b.className = s[k] ? 'on' : '';
  }
}
async function tick(){
  try{
    const r = await fetch('/stats.json'); const s = await r.json();
    document.getElementById('stats').textContent = JSON.stringify(s);
    for (const id of ['map','frame'])
      document.getElementById(id).src = '/' + id + '.png?t=' + Date.now();
  }catch(e){}
  setTimeout(tick, 1000);
}
window.onload = () => { tick(); ctl('noop'); };
</script></head>
<body><h3>ygz_tpu live viewer</h3>
<div>
<button id=follow onclick="ctl('follow')">follow camera</button>
<button id=localization onclick="ctl('localization')">localization
mode</button>
<button onclick="if(confirm('reset the map?'))ctl('reset')">reset</button>
</div>
<pre id=stats></pre>
<img id=frame src=/frame.png><img id=map src=/map.png>
</body></html>"""


class LiveViewer:
    """Render-thread + HTTP-server pair. `update(tracker, frame)` is
    cheap (stores a reference); rendering happens on the viewer thread."""

    def __init__(self, port: int = 8765, period: float = 1.0,
                 system=None):
        self.port = port
        self.period = period
        self.system = system        # enables the interactive controls
        self.follow = False         # follow-camera map view
        self._pending_cmds: list = []   # applied on the TRACKING thread
        self._lock = threading.Lock()
        self._latest = None            # (tracker, frame)
        self._map_png: Optional[bytes] = None
        self._frame_png: Optional[bytes] = None
        self._stats: dict = {}
        self._stop = threading.Event()
        self._render_thread = threading.Thread(
            target=self._render_loop, daemon=True)
        viewer_self = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    self._send(200, "text/html", _PAGE)
                elif path == "/map.png":
                    self._send_png(viewer_self._map_png)
                elif path == "/frame.png":
                    self._send_png(viewer_self._frame_png)
                elif path == "/stats.json":
                    self._send(200, "application/json",
                               json.dumps(viewer_self._stats).encode())
                elif path == "/control":
                    q = self.path.split("?cmd=")
                    cmd = q[1].split("&")[0] if len(q) > 1 else "noop"
                    self._send(200, "application/json",
                               json.dumps(
                                   viewer_self._control(cmd)).encode())
                else:
                    self._send(404, "text/plain", b"not found")

            def _send_png(self, data):
                if data is None:
                    self._send(404, "text/plain", b"no render yet")
                else:
                    self._send(200, "image/png", data)

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._http_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True)

    # ------------------------------------------------------------------
    def start(self):
        self._render_thread.start()
        self._http_thread.start()
        print(f"[viewer] live at http://localhost:{self.port}/")
        return self

    def stop(self):
        self._stop.set()
        self._httpd.shutdown()

    def update(self, tracker, frame=None):
        """Called from the tracking loop; O(1) — stores the latest
        snapshot reference for the render thread, and applies queued
        control commands HERE so map mutations (reset, localization
        switch) happen on the tracking thread, exactly as the reference
        viewer requests them via System flags checked in the tracking
        loop (/root/reference/src/Viewer.cc:139-180 menuReset /
        menuLocalizationMode -> System::Reset/...LocalizationMode)."""
        with self._lock:
            self._latest = (tracker, frame)
            cmds, self._pending_cmds = self._pending_cmds, []
        for cmd in cmds:
            if self.system is None:
                continue
            if cmd == "reset":
                self.system.reset()
            elif cmd == "localization":
                if self.system.localization_only:
                    self.system.deactivate_localization_mode()
                else:
                    self.system.activate_localization_mode()

    def _control(self, cmd: str) -> dict:
        """HTTP-thread side of the controls: view-only toggles apply
        immediately; map-mutating commands queue for the tracking
        thread. Returns the current toggle states for the UI."""
        if cmd == "follow":
            self.follow = not self.follow
        elif cmd in ("reset", "localization") and self.system is not None:
            with self._lock:
                self._pending_cmds.append(cmd)
        loc = bool(self.system.localization_only) if self.system else False
        # localization reflects the PENDING toggle for instant UI feedback
        with self._lock:
            if "localization" in self._pending_cmds:
                loc = not loc
        return {"follow": self.follow, "localization": loc}

    # ------------------------------------------------------------------
    def _render_loop(self):
        import matplotlib
        matplotlib.use("Agg")
        from ygz_tpu.utils import viewer as offline
        import tempfile
        import os

        while not self._stop.is_set():
            time.sleep(self.period)
            with self._lock:
                snap = self._latest
            if snap is None:
                continue
            tracker, frame = snap
            try:
                self._stats = dict(
                    state=int(tracker.state),
                    n_kf=int(tracker.n_kf),
                    n_mp=int(np.asarray(tracker.ms.mp_mask).sum()),
                    inliers=int(getattr(tracker, "last_inliers", 0)),
                    frames=len(tracker.trajectory),
                    time=time.strftime("%H:%M:%S"),
                )
                self._stats["follow"] = self.follow
                if self.system is not None:
                    self._stats["localization_only"] = \
                        bool(self.system.localization_only)
                with tempfile.TemporaryDirectory() as d:
                    if tracker.n_kf > 0:
                        p = os.path.join(d, "map.png")
                        offline.draw_map(tracker, p,
                                         show_covisibility=False,
                                         follow=self.follow)
                        self._map_png = open(p, "rb").read()
                    if frame is not None and frame.extracted:
                        p = os.path.join(d, "frame.png")
                        offline.draw_frame(frame, p)
                        self._frame_png = open(p, "rb").read()
                    elif frame is not None and frame.pyramid is not None:
                        # direct frames carry no descriptors; render raw
                        import matplotlib.pyplot as plt
                        fig, ax = plt.subplots(figsize=(6, 4))
                        ax.imshow(np.asarray(frame.pyramid[0]), cmap="gray")
                        if frame.uv is not None and frame.feat_mask is not None:
                            m = np.asarray(frame.feat_mask)
                            uv = np.asarray(frame.uv)[m]
                            ax.plot(uv[:, 0], uv[:, 1], "g+", ms=4)
                        ax.set_axis_off()
                        buf = io.BytesIO()
                        fig.savefig(buf, format="png",
                                    bbox_inches="tight", dpi=80)
                        plt.close(fig)
                        self._frame_png = buf.getvalue()
            except Exception as e:  # rendering must never kill the run
                self._stats = dict(error=repr(e))
