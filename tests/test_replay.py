"""Golden replay & determinism tests (SURVEY.md §4.3; BASELINE.json:11).

Each bench scene must replay bit-exactly run-to-run (determinism) and within
tolerance across refactors (golden files, regenerated intentionally via
``python -m tests.test_replay`` — kept small & committed).
"""

import os

import numpy as np
import pytest

import starframe_tpu as sf

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

SCENES = {
    "box_stack_small": lambda: sf.scenes.box_stack(n_columns=4, n_rows=3, seed=7),
    "mechanism_small": lambda: sf.scenes.mechanism(n_pendulum_links=3, seed=7),
    "rope_small": lambda: sf.scenes.rope_bridge(span=8.0, n_particles=12, n_loads=2, seed=7),
}
FRAMES = 45


def _trajectory(scene):
    step = scene.make_step(donate=False)
    w = scene.world
    out = []
    for _ in range(FRAMES):
        w = step(w)
        out.append(np.asarray(w.bodies.pos))
    return np.stack(out)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_bitexact_rerun(name):
    scene = SCENES[name]()
    t1 = _trajectory(scene)
    t2 = _trajectory(SCENES[name]())
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden_replay(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing; regenerate with python -m tests.test_replay")
    scene = SCENES[name]()
    traj = _trajectory(scene)
    golden = np.load(path)["traj"]
    assert golden.shape == traj.shape
    # tolerance across refactors: poses within solver tolerance of the
    # recorded run (positions are O(1-10) world units)
    np.testing.assert_allclose(traj, golden, atol=2e-2)


def test_snapshot_resume_bitexact(tmp_path):
    """io.save/load mid-run resumes bit-exactly (SURVEY.md §5.4)."""
    scene = SCENES["box_stack_small"]()
    step = scene.make_step(donate=False)
    w = scene.world
    for _ in range(20):
        w = step(w)
    p = str(tmp_path / "snap.npz")
    sf.io.save(p, w)
    w2 = sf.io.load(p, w)
    for _ in range(20):
        w = step(w)
        w2 = step(w2)
    np.testing.assert_array_equal(np.asarray(w.bodies.pos), np.asarray(w2.bodies.pos))


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, mk in SCENES.items():
        traj = _trajectory(mk())
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"), traj=traj)
        print(f"wrote golden {name}: {traj.shape}")
