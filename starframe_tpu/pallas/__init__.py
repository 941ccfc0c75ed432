"""Pallas/Mosaic TPU kernels (BASELINE.json:5: "the XPBD substep loop …
runs as Pallas kernels").

The flagship kernel is :mod:`frame`: the ENTIRE frame's substep loop for one
world executes inside a single Pallas program — body state and per-pair data
stay resident in VMEM across all substeps, per-pair gathers/scatters become
one-hot MXU contractions, and HBM is touched exactly once per frame per
world. This removes the ~100-kernel-per-substep dispatch/fusion overhead of
the XLA path (measured ~35us/kernel on this TPU).
"""

from .frame import pick_group_size, run_frame_batched

__all__ = ["pick_group_size", "run_frame_batched"]
