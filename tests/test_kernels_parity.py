"""Parity: P-last batched kernels == scalar reference manifold
(kernels.manifold_batch vs narrowphase.manifold_pair)."""

import jax
import jax.numpy as jnp
import numpy as np

from starframe_tpu.kernels import manifold_batch
from starframe_tpu.narrowphase import manifold_pair

V = 8


def _random_batch(rng, P):
    VA, NA, RA = [], [], []
    for _ in range(P):
        n = int(rng.integers(1, 7))
        if n <= 2:
            v = rng.normal(scale=1.0, size=(n, 2))
        else:
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            v = rng.uniform(0.3, 1.0) * np.stack([np.cos(ang), np.sin(ang)], -1)
        v = v + rng.normal(scale=0.8, size=2)
        out = np.tile(v[0], (V, 1))
        out[:n] = v
        VA.append(out.astype(np.float32))
        NA.append(n)
        RA.append(float(rng.uniform(0.05, 0.5)) if n < 3 else float(rng.uniform(0, 0.3)))
    return (
        jnp.asarray(np.stack(VA)),
        jnp.asarray(NA),
        jnp.asarray(np.array(RA, np.float32)),
    )


def test_manifold_batch_matches_scalar_reference(rng):
    P = 256
    VA, NA, RA = _random_batch(rng, P)
    VB, NB, RB = _random_batch(rng, P)

    ref = jax.jit(
        jax.vmap(lambda va, na, ra, vb, nb, rb: manifold_pair(va, na, ra, vb, nb, rb, 0.05))
    )
    n_r, wa_r, wb_r, sep_r, pm_r = [np.asarray(x) for x in ref(VA, NA, RA, VB, NB, RB)]

    bat = jax.jit(
        lambda: manifold_batch(
            VA[..., 0].T, VA[..., 1].T, NA, RA, VB[..., 0].T, VB[..., 1].T, NB, RB, 0.05
        )
    )
    m = bat()
    n_b = np.stack([np.asarray(m.n_x), np.asarray(m.n_y)], -1)
    sep_b = np.asarray(m.sep).T
    pm_b = np.asarray(m.pmask).T
    wa_b = np.stack([np.asarray(m.wa_x).T, np.asarray(m.wa_y).T], -1)
    wb_b = np.stack([np.asarray(m.wb_x).T, np.asarray(m.wb_y).T], -1)

    np.testing.assert_array_equal(pm_r, pm_b)
    for i in range(P):
        if not pm_r[i].any():
            continue
        np.testing.assert_allclose(n_r[i], n_b[i], atol=1e-5)
        for k in range(2):
            if pm_r[i, k]:
                np.testing.assert_allclose(sep_r[i, k], sep_b[i, k], atol=1e-5)
                np.testing.assert_allclose(wa_r[i, k], wa_b[i, k], atol=1e-4)
                np.testing.assert_allclose(wb_r[i, k], wb_b[i, k], atol=1e-4)
