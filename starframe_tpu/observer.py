"""Headless observer: render collider outlines + contacts from state.

Stands in for starframe's wgpu debug/line renderer (SURVEY.md §2 row 17,
§7.7): a dependency-free SVG writer (always available) plus an optional
matplotlib raster path. Pulls device state to host once per rendered frame —
never call this on the hot path.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np

from .state import World


@dataclasses.dataclass
class Camera:
    """2D view transform for every viewer (SURVEY.md §2 row 15: starframe's
    camera with zoom/pan controls). ``zoom`` is pixels per world unit;
    ``center`` is the world point at the viewport middle; ``rotation``
    rotates the world clockwise on screen (radians)."""

    center: tuple = (0.0, 0.0)
    zoom: float = 40.0
    rotation: float = 0.0

    def world_to_screen(self, p, size_px):
        """[..., 2] world points -> pixel coords (y-down)."""
        p = np.asarray(p, np.float64) - np.asarray(self.center)
        if self.rotation:
            c, s = math.cos(-self.rotation), math.sin(-self.rotation)
            p = p @ np.array([[c, s], [-s, c]])
        w, h = size_px
        return np.stack([w / 2 + p[..., 0] * self.zoom,
                         h / 2 - p[..., 1] * self.zoom], axis=-1)

    def screen_to_world(self, q, size_px):
        """Inverse of :meth:`world_to_screen` (mouse picking)."""
        w, h = size_px
        q = np.asarray(q, np.float64)
        p = np.stack([(q[..., 0] - w / 2) / self.zoom,
                      (h / 2 - q[..., 1]) / self.zoom], axis=-1)
        if self.rotation:
            c, s = math.cos(self.rotation), math.sin(self.rotation)
            p = p @ np.array([[c, s], [-s, c]])
        return p + np.asarray(self.center)

    def view(self, size_px):
        """Axis-aligned (xmin, ymin, xmax, ymax) covering the viewport
        (conservative bounding box when rotated)."""
        w, h = size_px
        corners = self.screen_to_world(
            np.array([[0.0, 0.0], [w, 0.0], [0.0, h], [w, h]]), size_px)
        lo = corners.min(0)
        hi = corners.max(0)
        return (lo[0], lo[1], hi[0], hi[1])

    def pan(self, dx_px: float, dy_px: float) -> "Camera":
        """Camera moved by a screen-space drag (content follows the mouse)."""
        c, s = math.cos(self.rotation), math.sin(self.rotation)
        dw = np.array([-dx_px, dy_px]) / self.zoom
        dw = dw @ np.array([[c, s], [-s, c]])
        return dataclasses.replace(self, center=tuple(np.asarray(self.center) + dw))

    def zoomed(self, factor: float) -> "Camera":
        return dataclasses.replace(self, zoom=self.zoom * factor)

    @staticmethod
    def fit(lo, hi, size_px=(1280, 720), pad: float = 0.05) -> "Camera":
        """Camera framing the world box [lo, hi]."""
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        span = np.maximum(hi - lo, 1e-6) * (1 + 2 * pad)
        zoom = min(size_px[0] / span[0], size_px[1] / span[1])
        return Camera(center=tuple((lo + hi) / 2), zoom=float(zoom))


def _world_outlines(world: World, segments_per_arc: int = 8):
    """Host-side polyline outline per active collider (rounded polygons)."""
    b = world.bodies
    c = world.colliders
    pos = np.asarray(b.pos)
    ang = np.asarray(b.angle)
    verts = np.asarray(c.verts)
    nverts = np.asarray(c.nverts)
    radius = np.asarray(c.radius)
    body_idx = np.asarray(c.body_idx)
    active = np.asarray(c.active)

    outlines = []
    for i in range(len(nverts)):
        if not active[i]:
            continue
        nv = int(nverts[i])
        r = float(radius[i])
        core = verts[i, :nv]
        a = ang[body_idx[i]]
        rot = np.array([[math.cos(a), -math.sin(a)], [math.sin(a), math.cos(a)]])
        w = core @ rot.T + pos[body_idx[i]]
        if r <= 1e-9 and nv >= 3:
            outlines.append(np.vstack([w, w[:1]]))
            continue
        # rounded: sample edge offsets + vertex arcs
        pts = []
        if nv == 1:
            th = np.linspace(0, 2 * np.pi, 4 * segments_per_arc + 1)
            pts = w[0] + r * np.stack([np.cos(th), np.sin(th)], -1)
            outlines.append(pts)
            continue
        for k in range(nv):
            v0 = w[k]
            v1 = w[(k + 1) % nv]
            e = v1 - v0
            ln = np.linalg.norm(e)
            if ln < 1e-12:
                continue
            n = np.array([e[1], -e[0]]) / ln
            pts.append(v0 + n * r)
            pts.append(v1 + n * r)
            # arc at v1 from this edge normal to the next edge normal
            v2 = w[(k + 2) % nv]
            e2 = v2 - v1
            l2 = np.linalg.norm(e2)
            if l2 < 1e-12:
                n2 = -n
            else:
                n2 = np.array([e2[1], -e2[0]]) / l2
            a0 = math.atan2(n[1], n[0])
            a1 = math.atan2(n2[1], n2[0])
            while a1 < a0:
                a1 += 2 * np.pi
            th = np.linspace(a0, a1, segments_per_arc)
            for t in th:
                pts.append(v1 + r * np.array([math.cos(t), math.sin(t)]))
        pts = np.asarray(pts)
        outlines.append(np.vstack([pts, pts[:1]]))
    return outlines


@dataclasses.dataclass
class MeshInstance:
    """A drawable triangle mesh: ``verts`` are body-local when ``body`` is a
    body index (pose applied at draw time — skinned verts from
    :class:`~starframe_tpu.mesh.Animator` go here), world-space when None."""

    verts: np.ndarray  # [V, 2]
    tris: np.ndarray  # [F, 3] i32
    body: Optional[int] = None
    color: str = "#e0a458"


def _mesh_world_tris(world: World, meshes: Sequence) -> list:
    """World-space [3, 2] triangles for every mesh instance."""
    pos = np.asarray(world.bodies.pos)
    ang = np.asarray(world.bodies.angle)
    out = []
    for m in meshes:
        if not isinstance(m, MeshInstance):
            m = MeshInstance(*m) if isinstance(m, tuple) else MeshInstance(**m)
        v = np.asarray(m.verts, np.float64)
        if m.body is not None:
            a = float(ang[m.body])
            rot = np.array([[math.cos(a), -math.sin(a)],
                            [math.sin(a), math.cos(a)]])
            v = v @ rot.T + pos[m.body]
        for f in np.asarray(m.tris):
            out.append((v[f], m.color))
    return out


def render_svg(
    world: World,
    path: str,
    view: Optional[tuple] = None,
    size: int = 800,
    contacts=None,
    camera: Optional[Camera] = None,
    meshes: Optional[Sequence] = None,
) -> str:
    """Write the scene as an SVG file; returns the path. ``view`` is
    (xmin, ymin, xmax, ymax); a :class:`Camera` overrides it; default =
    fit all active colliders. ``meshes`` draws :class:`MeshInstance`
    triangle meshes (e.g. skinned characters) under the collider outlines."""
    outlines = _world_outlines(world)
    if camera is not None:
        view = camera.view((size, size))
    if view is None:
        if outlines:
            allpts = np.vstack(outlines)
            lo = allpts.min(0) - 1
            hi = allpts.max(0) + 1
        else:
            lo, hi = np.array([-10.0, -10.0]), np.array([10.0, 10.0])
        view = (lo[0], lo[1], hi[0], hi[1])
    xmin, ymin, xmax, ymax = view
    w = xmax - xmin
    h = ymax - ymin
    scale = size / max(w, h)

    def tx(p):
        return (p[0] - xmin) * scale, (ymax - p[1]) * scale  # y-up world

    lines = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{int(w * scale)}" '
        f'height="{int(h * scale)}" viewBox="0 0 {w * scale:.1f} {h * scale:.1f}">',
        f'<rect width="100%" height="100%" fill="#101018"/>',
    ]
    if meshes:
        for tri, color in _mesh_world_tris(world, meshes):
            pts = " ".join(f"{tx(p)[0]:.2f},{tx(p)[1]:.2f}" for p in tri)
            lines.append(
                f'<polygon points="{pts}" fill="{color}" fill-opacity="0.45" '
                f'stroke="{color}" stroke-width="0.6"/>'
            )
    for poly in outlines:
        pts = " ".join(f"{tx(p)[0]:.2f},{tx(p)[1]:.2f}" for p in poly)
        lines.append(
            f'<polyline points="{pts}" fill="rgba(90,160,255,0.15)" '
            f'stroke="#7fb0ff" stroke-width="1.2"/>'
        )
    if contacts is not None:
        pm = np.asarray(contacts.point_mask)
        ba = np.asarray(contacts.body_a)
        anchors = np.asarray(contacts.anchor_a)
        pos = np.asarray(world.bodies.pos)
        ang = np.asarray(world.bodies.angle)
        for p in range(pm.shape[0]):
            for k in range(2):
                if pm[p, k]:
                    a = ang[ba[p]]
                    rot = np.array([[math.cos(a), -math.sin(a)], [math.sin(a), math.cos(a)]])
                    wpt = anchors[p, k] @ rot.T + pos[ba[p]]
                    x, y = tx(wpt)
                    lines.append(f'<circle cx="{x:.2f}" cy="{y:.2f}" r="2.5" fill="#ff5f5f"/>')
    lines.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def render_png(world: World, path: str, view: Optional[tuple] = None, contacts=None) -> str:
    """Raster render via matplotlib if available (falls back to SVG)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return render_svg(world, path.replace(".png", ".svg"), view, contacts=contacts)

    fig, ax = plt.subplots(figsize=(8, 8))
    for poly in _world_outlines(world):
        ax.fill(poly[:, 0], poly[:, 1], alpha=0.15, color="#4a90d9")
        ax.plot(poly[:, 0], poly[:, 1], color="#4a90d9", lw=1.0)
    ax.set_aspect("equal")
    if view is not None:
        ax.set_xlim(view[0], view[2])
        ax.set_ylim(view[1], view[3])
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


# ---------------------------------------------------------------------------
# interactive viewers (SURVEY.md §7.7 "optional interactive viewer"):
# a dependency-free HTML canvas player fed by recorded snapshots, and a
# matplotlib live window for attended sessions.
# ---------------------------------------------------------------------------


def export_html(path: str, frames, fps: int = 60, title: str = "starframe-tpu",
                camera: Optional[Camera] = None, meshes_per_frame=None):
    """Write a standalone HTML canvas player for a recorded trajectory.

    ``frames`` is a sequence of :class:`~starframe_tpu.state.World` snapshots
    (or anything accepted by ``_world_outlines``). Outlines are embedded as
    JSON; the page plays at ``fps`` with play/pause/scrub, wheel-zoom and
    drag-pan (the :class:`Camera` controls of SURVEY.md §2 row 15; ``camera``
    sets the initial framing, default = fit). ``meshes_per_frame`` is an
    optional per-frame sequence of :class:`MeshInstance` lists (e.g. skinned
    characters) drawn as filled triangles under the outlines.
    """
    import json

    frame_data = []
    mesh_data = []
    lo = np.array([np.inf, np.inf])
    hi = np.array([-np.inf, -np.inf])
    for fi, w in enumerate(frames):
        outlines = _world_outlines(w)
        polys = [np.round(o, 4).tolist() for o in outlines]
        frame_data.append(polys)
        for o in outlines:
            lo = np.minimum(lo, o.min(0))
            hi = np.maximum(hi, o.max(0))
        if meshes_per_frame is not None:
            tris = _mesh_world_tris(w, meshes_per_frame[fi])
            mesh_data.append([[np.round(t, 4).tolist(), c] for t, c in tris])
    if not np.all(np.isfinite(lo)):
        lo, hi = np.array([-1.0, -1.0]), np.array([1.0, 1.0])
    if camera is None:
        camera = Camera.fit(lo, hi)
    cam = dict(cx=float(camera.center[0]), cy=float(camera.center[1]),
               zoom=float(camera.zoom))

    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{background:#111;color:#ddd;font-family:monospace;margin:0}}
#bar{{padding:6px}} #cv{{cursor:grab}}</style></head><body>
<div id="bar"><button id="play">pause</button>
<input id="scrub" type="range" min="0" value="0" style="width:60%%">
<span id="info"></span>
<span style="opacity:.6"> wheel: zoom &nbsp; drag: pan</span></div>
<canvas id="cv" width="1280" height="720"></canvas>
<script>
const FRAMES = {json.dumps(frame_data)};
const MESHES = {json.dumps(mesh_data)};
const CAM = {json.dumps(cam)};
const FPS = {fps};
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const scrub = document.getElementById('scrub'); scrub.max = FRAMES.length-1;
let f = 0, playing = true;
function world2px(p) {{
  return [cv.width/2 + (p[0]-CAM.cx)*CAM.zoom,
          cv.height/2 - (p[1]-CAM.cy)*CAM.zoom];
}}
function draw() {{
  ctx.fillStyle = '#111'; ctx.fillRect(0,0,cv.width,cv.height);
  if (MESHES.length) {{
    for (const [tri, color] of MESHES[f]) {{
      ctx.beginPath();
      tri.forEach((p,i) => {{ const q = world2px(p);
        if (i===0) ctx.moveTo(q[0],q[1]); else ctx.lineTo(q[0],q[1]); }});
      ctx.closePath();
      ctx.globalAlpha = 0.5; ctx.fillStyle = color; ctx.fill();
      ctx.globalAlpha = 1.0;
    }}
  }}
  ctx.strokeStyle = '#6cf'; ctx.lineWidth = 1.2;
  for (const poly of FRAMES[f]) {{
    ctx.beginPath();
    poly.forEach((p,i) => {{ const q = world2px(p);
      if (i===0) ctx.moveTo(q[0],q[1]); else ctx.lineTo(q[0],q[1]); }});
    ctx.stroke();
  }}
  document.getElementById('info').textContent =
    ` frame ${{f}}/${{FRAMES.length-1}} zoom ${{CAM.zoom.toFixed(1)}}`;
  scrub.value = f;
}}
cv.addEventListener('wheel', e => {{
  e.preventDefault();
  const k = Math.exp(-e.deltaY * 0.001);
  // zoom about the mouse: keep the world point under the cursor fixed
  const r = cv.getBoundingClientRect();
  const mx = e.clientX - r.left, my = e.clientY - r.top;
  const wx = CAM.cx + (mx - cv.width/2)/CAM.zoom;
  const wy = CAM.cy - (my - cv.height/2)/CAM.zoom;
  CAM.zoom *= k;
  CAM.cx = wx - (mx - cv.width/2)/CAM.zoom;
  CAM.cy = wy + (my - cv.height/2)/CAM.zoom;
  draw();
}}, {{passive: false}});
let dragging = null;
cv.addEventListener('mousedown', e => {{ dragging = [e.clientX, e.clientY];
  cv.style.cursor = 'grabbing'; }});
window.addEventListener('mouseup', () => {{ dragging = null;
  cv.style.cursor = 'grab'; }});
window.addEventListener('mousemove', e => {{
  if (!dragging) return;
  CAM.cx -= (e.clientX - dragging[0])/CAM.zoom;
  CAM.cy += (e.clientY - dragging[1])/CAM.zoom;
  dragging = [e.clientX, e.clientY];
  draw();
}});
setInterval(() => {{ if (playing) {{ f = (f+1)%FRAMES.length; draw(); }} }},
            1000/FPS);
document.getElementById('play').onclick = e => {{
  playing = !playing; e.target.textContent = playing ? 'pause' : 'play'; }};
scrub.oninput = e => {{ playing = false; f = +e.target.value; draw(); }};
draw();
</script></body></html>"""
    with open(path, "w") as fh:
        fh.write(html)
    return path


def live(world, step_fn, n_frames: int = 600, interval_ms: int = 16,
         show: bool = True, save_path: Optional[str] = None):
    """Matplotlib live viewer: steps the world and redraws collider outlines
    each animation tick (attended debugging; use :func:`export_html` for
    headless sessions). Returns the final world."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.animation as manim
    import matplotlib.pyplot as plt

    state = {"world": world}
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.set_aspect("equal")

    def update(_):
        state["world"] = step_fn(state["world"])
        ax.clear()
        ax.set_aspect("equal")
        for o in _world_outlines(state["world"]):
            ax.plot(o[:, 0], o[:, 1], lw=0.8, color="tab:blue")
        return []

    anim = manim.FuncAnimation(fig, update, frames=n_frames,
                               interval=interval_ms, blit=False, repeat=False)
    if save_path:
        anim.save(save_path, writer="pillow", fps=max(1, 1000 // interval_ms))
    elif show:
        plt.show()
    else:
        for _ in range(n_frames):
            update(None)
    plt.close(fig)
    return state["world"]
