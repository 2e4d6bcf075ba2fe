"""Interactive browser viewer (counterpart of the viser/nerfview stack in
/root/reference/flow3d/vis/viewer.py + playback_panel.py).

viser is not available in this image, so this is a dependency-free
replacement built on the stdlib http.server: it serves a single-page app
with orbit-drag camera controls, a time slider, playback, and a canonical
checkbox; the browser POSTs camera state and receives JPEG frames rendered
by the Renderer callback. Same DynamicViewer surface: pause/resume state
and a training lock so the train loop can cooperate
(trainer.py:204-207,265-269)."""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html><html><head><title>deblur4dgs_tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font-family:sans-serif}
#bar{padding:8px}#img{display:block;margin:auto}</style></head><body>
<div id=bar>
 t: <input id=t type=range min=0 max=TMAX value=0 style="width:200px">
 <span id=tv>0</span>
 <label><input id=play type=checkbox>play</label>
 <label><input id=cano type=checkbox>canonical</label>
 <span>drag to orbit, wheel to zoom</span>
</div><img id=img width=WIDTH height=HEIGHT>
<script>
let az=0, el=0, dist=3, target=[0,0,0];
const img=document.getElementById('img');
let dragging=false, lx=0, ly=0;
img.onmousedown=e=>{dragging=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>dragging=false;
window.onmousemove=e=>{if(!dragging)return;az+=(e.clientX-lx)*0.01;
 el+=(e.clientY-ly)*0.01;el=Math.max(-1.5,Math.min(1.5,el));
 lx=e.clientX;ly=e.clientY};
img.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001);e.preventDefault()};
function c2w(){
 const ca=Math.cos(az),sa=Math.sin(az),ce=Math.cos(el),se=Math.sin(el);
 const eye=[target[0]+dist*ce*sa, target[1]+dist*se, target[2]-dist*ce*ca];
 let f=[target[0]-eye[0],target[1]-eye[1],target[2]-eye[2]];
 const fn=Math.hypot(...f); f=f.map(v=>v/fn);
 let up=[0,-1,0];
 let r=[f[1]*up[2]-f[2]*up[1],f[2]*up[0]-f[0]*up[2],f[0]*up[1]-f[1]*up[0]];
 const rn=Math.hypot(...r); r=r.map(v=>v/rn);
 const d=[f[1]*r[2]-f[2]*r[1],f[2]*r[0]-f[0]*r[2],f[0]*r[1]-f[1]*r[0]];
 return [[r[0],d[0],f[0],eye[0]],[r[1],d[1],f[1],eye[1]],
         [r[2],d[2],f[2],eye[2]],[0,0,0,1]];
}
let inflight=false;
async function tick(){
 if(document.getElementById('play').checked){
  const s=document.getElementById('t');
  s.value=(parseInt(s.value)+1)%(parseInt(s.max)+1);
 }
 document.getElementById('tv').textContent=document.getElementById('t').value;
 if(!inflight){
  inflight=true;
  try{
   const res=await fetch('/render',{method:'POST',body:JSON.stringify({
    c2w:c2w(), t:parseInt(document.getElementById('t').value),
    canonical:document.getElementById('cano').checked})});
   const blob=await res.blob();
   img.src=URL.createObjectURL(blob);
  }finally{inflight=false;}
 }
 setTimeout(tick,100);
}
tick();
</script></body></html>"""


class ViewerState:
    def __init__(self):
        self.status = "training"  # | "paused"
        self.num_train_rays_per_sec = 0.0


class DynamicViewer:
    """render_fn: (CameraState, img_wh, t | None) -> (H, W, 3) uint8."""

    def __init__(self, render_fn, num_frames: int, img_wh=(512, 288),
                 port: int = 8890, mode: str = "training"):
        self.render_fn = render_fn
        self.num_frames = num_frames
        self.img_wh = img_wh
        self.mode = mode
        self.state = ViewerState()
        self.lock = threading.Lock()
        self._server = None
        self._port = port

    def update(self, step: int, num_rays: int):
        pass  # training-progress hook (kept for API parity)

    def serve_forever(self, background: bool = True):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                W, H = viewer.img_wh
                page = (
                    _PAGE.replace("TMAX", str(viewer.num_frames - 1))
                    .replace("WIDTH", str(W))
                    .replace("HEIGHT", str(H))
                )
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(page.encode())

            def do_POST(self):
                import imageio.v3 as iio

                from deblur4dgs_tpu.vis.renderer import CameraState

                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                cam = CameraState(
                    fov=np.pi / 3,
                    aspect=viewer.img_wh[0] / viewer.img_wh[1],
                    c2w=np.array(req["c2w"], np.float32),
                )
                t = None if req.get("canonical") else int(req.get("t", 0))
                with viewer.lock:
                    img = viewer.render_fn(cam, viewer.img_wh, t)
                buf = io.BytesIO()
                iio.imwrite(buf, img, extension=".jpeg")
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.end_headers()
                self.wfile.write(buf.getvalue())

        self._server = ThreadingHTTPServer(("0.0.0.0", self._port), Handler)
        if background:
            threading.Thread(
                target=self._server.serve_forever, daemon=True
            ).start()
        else:
            self._server.serve_forever()
        return self._server


class TrainingViewer(DynamicViewer):
    """Live viewer attached to a running TrainLoop (trainer.py:180-207,
    :265-269 parity): renders sharp mid-exposure views from the CURRENT
    training scene under the viewer lock; the train loop holds the same
    lock during each optimization step so renders always see a consistent
    scene, and honors state.status == 'paused'."""

    def __init__(self, num_frames: int, img_wh=(512, 288), port: int = 8890,
                 num_exposure: int = 11, cap: int = 512,
                 use_pallas: bool = True):
        from deblur4dgs_tpu.vis.renderer import Renderer

        self._renderer = Renderer(
            None, num_frames, num_exposure=num_exposure, cap=cap,
            use_pallas=use_pallas,
        )
        super().__init__(self._render, num_frames, img_wh, port,
                         mode="training")

    def set_scene(self, scene, num_frames: int | None = None):
        """Called by the train loop (holding self.lock) after each step."""
        self._renderer.scene = scene
        if num_frames is not None:
            self.num_frames = num_frames
            self._renderer.num_frames = num_frames

    def _render(self, camera_state, img_wh, t):
        if self._renderer.scene is None:
            W, H = img_wh
            return np.zeros((H, W, 3), np.uint8)
        t = None if t is None else min(int(t), self.num_frames - 1)
        return self._renderer.render_fn(camera_state, img_wh, t)

    def update(self, step: int, num_rays_per_sec: float):
        self.state.num_train_rays_per_sec = num_rays_per_sec
