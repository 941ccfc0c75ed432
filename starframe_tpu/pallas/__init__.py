"""Pallas/Mosaic TPU kernels (BASELINE.json:5: "the XPBD substep loop …
runs as Pallas kernels").

Two kernels carry the batched-worlds hot path (layout: worlds on sublanes,
entities on lanes — see PROFILE.md for the measurements this design is built
on):

- :mod:`slots` — slot-table broadphase: swept AABBs, dense per-world overlap
  mask, rank-select of each dynamic collider's first C partners.
- :mod:`frame2` — the ENTIRE frame's substep loop in one program: manifolds
  once per frame in VMEM, in-register lane gathers for body->slot reads,
  owner-row slot sums (no scatter, no per-pair one-hot) for slot->body
  accumulation.
"""

from .frame2 import pick_frame_worlds, run_frame2
from .lanegather import lane_gather
from .slots import build_slot_tables

__all__ = ["run_frame2", "pick_frame_worlds", "build_slot_tables", "lane_gather"]
