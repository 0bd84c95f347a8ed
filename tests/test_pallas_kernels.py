"""Pallas kernel parity vs the XLA reference implementations (interpret
mode on CPU; compiled path exercised on real TPU by the bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.ops.morphology import dilate_erode
from hairfastgan_tpu.ops.pallas_morphology import dilate_erode_pallas

KEY = jax.random.PRNGKey(0)


def test_pallas_morphology_parity():
    mask = (jax.random.uniform(KEY, (3, 64, 128, 1)) > 0.7).astype(jnp.float32)
    d_ref, e_ref = dilate_erode(mask, 5)
    d_p, e_p = dilate_erode_pallas(mask, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(e_p), np.asarray(e_ref))


def test_pallas_morphology_iterations():
    # single on-pixel: after k dilations the cross ball radius is k (L1)
    mask = jnp.zeros((1, 32, 128, 1)).at[0, 16, 64, 0].set(1.0)
    d, e = dilate_erode_pallas(mask, 3, interpret=True)
    dd = np.asarray(d[0, :, :, 0])
    ys, xs = np.nonzero(dd)
    l1 = np.abs(ys - 16) + np.abs(xs - 64)
    assert l1.max() == 3 and (dd > 0).sum() == 2 * 3 * (3 + 1) + 1
    assert float(e.sum()) == 0.0  # single pixel erodes away
