#!/usr/bin/env python
"""Sandbox demo — the analog of starframe's ``examples/sandbox``
(SURVEY.md §2 row 19): pick a scene, simulate it headlessly, interact
programmatically (spawn / grab), and render frames to SVG.

Usage::

    python examples/sandbox.py --scene box_stack --seconds 5 --render out/
    python examples/sandbox.py --scene mechanism --grab 0,6 --seconds 3
    python examples/sandbox.py --list

``--grab x,y`` demonstrates the mouse-grab flow (SURVEY.md §3.3): a point
query picks the body under the cursor, a temporary distance joint drags it
toward the point for the first second.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import starframe_tpu as sf

SCENES = {
    "box_stack": lambda: sf.scenes.box_stack(),
    "pile": lambda: sf.scenes.pile(n_bodies=500),
    "rope_bridge": lambda: sf.scenes.rope_bridge(),
    "mechanism": lambda: sf.scenes.mechanism(),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="box_stack", choices=sorted(SCENES))
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--render", default=None, help="directory for SVG frames")
    ap.add_argument("--render-every", type=int, default=30)
    ap.add_argument("--grab", default=None, help="x,y world point to grab/drag")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    if args.list:
        print("\n".join(sorted(SCENES)))
        return

    scene = SCENES[args.scene]()
    world = scene.world

    grab = None
    if args.grab:
        # mouse-grab flow (SURVEY.md §3.3): point query picks the body under
        # the cursor, then a kinematic cursor body + a soft runtime pin joint
        # drag it for the first second. Capacities are static, so spare rows
        # are appended once up front; spawning into them never recompiles.
        gx, gy = (float(v) for v in args.grab.split(","))
        world = sf.state.expand_capacity(world, extra_bodies=1, extra_joints=1)
        picked = sf.queries.pick_body(world, (gx, gy))
        if picked < 0:
            print(f"grab at ({gx}, {gy}): nothing there")
        else:
            world, cursor = sf.spawn_body(world, pos=(gx, gy),
                                          body_type="kinematic")
            world, joint = sf.spawn_joint(
                world, sf.JOINT_PIN, cursor, picked,
                anchor_b=sf.queries.body_local_point(world, picked, (gx, gy)),
                compliance=2e-4, damping=20.0,
            )
            grab = dict(cursor=cursor, joint=joint, start=np.array([gx, gy]),
                        target=np.array([gx + 2.0, gy + 1.5]))
            print(f"grab at ({gx}, {gy}): body {picked}, dragging to "
                  f"{grab['target']}")

    from starframe_tpu.step import make_step

    step = make_step(scene.config, scene.capacity.max_pairs,
                     with_contacts=True, donate=False)
    n_frames = int(args.seconds * 60)
    events = sf.ContactEvents()

    t0 = time.perf_counter()
    for f in range(n_frames):
        if grab is not None and f <= 60:
            t = min(f / 60.0, 1.0)
            cur = grab["start"] * (1 - t) + grab["target"] * t
            world = sf.set_body_pose(world, grab["cursor"], pos=cur)
            if f == 60:  # release
                world = sf.despawn_joint(world, grab["joint"])
                world = sf.despawn_body(world, grab["cursor"])
                print(f"frame {f}: released grab")
        world, contacts, diag = step(world)
        events.update(contacts)
        if events.started:
            print(f"frame {f}: contact started {sorted(events.started)[:4]}")
        if args.render and f % args.render_every == 0:
            os.makedirs(args.render, exist_ok=True)
            sf.observer.render_svg(world, os.path.join(args.render, f"f{f:05d}.svg"),
                                   contacts=contacts)
    diag.assert_no_overflow()
    dt = time.perf_counter() - t0
    ke = float(np.asarray(diag.kinetic_energy))
    print(f"{args.scene}: {n_frames} frames in {dt:.2f}s "
          f"({n_frames / dt:.0f} fps) | final KE {ke:.3f} | "
          f"{int(diag.touching_count)} touching pairs")


if __name__ == "__main__":
    main()
