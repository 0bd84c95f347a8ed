"""P-space PCA statistics + p-norm regularizer.

Rebuilds reference models/Net.py:48-107 + utils/PCA_utils.py:3-29: PULSE's
"P space" is LeakyReLU(slope 5) of mapping-network outputs; a PCA of 1M
samples gives (X_mean, X_comp, X_stdev) used by the p-norm latent
regularizer `cal_p_norm_loss` and the F-reconstruction loss `cal_l_F`.

Building is an offline tool (host-side IncrementalPCA, minutes of CPU —
same as the reference's first-run behavior, cached as <ckpt>_PCA.npz); the
losses are jitted device functions.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.config import StyleGANConfig
from hairfastgan_tpu.models import stylegan2

Array = jax.Array


def build_pca_model(
    generator_params,
    out_path: Path,
    n_samples: int = 1_000_000,
    batch: int = 100_000,
    cfg: StyleGANConfig = StyleGANConfig(),
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Sample z -> mapping -> LeakyReLU(5) and fit IncrementalPCA(512)."""
    from sklearn.decomposition import IncrementalPCA

    map_fn = jax.jit(lambda p, z: jnp.where(
        (w := stylegan2.mapping(p, z, cfg)) >= 0, w, w * 5.0))

    # first pass: mean
    total = np.zeros((cfg.style_dim,), np.float64)
    key = jax.random.PRNGKey(seed)
    chunks = []
    for i in range(0, n_samples, batch):
        key, sub = jax.random.split(key)
        n = min(batch, n_samples - i)
        p = np.asarray(map_fn(generator_params,
                              jax.random.normal(sub, (n, cfg.style_dim))))
        chunks.append(p)
        total += p.sum(0)
    mean = (total / n_samples).astype(np.float32)

    ipca = IncrementalPCA(cfg.style_dim,
                          batch_size=max(100, 5 * cfg.style_dim))
    for p in chunks:
        ipca.partial_fit(p - mean)
        ipca.n_samples_seen_ = np.int64(ipca.n_samples_seen_)

    model = {
        "X_mean": mean,
        "X_comp": ipca.components_.astype(np.float32),
        "X_stdev": np.sqrt(ipca.explained_variance_).astype(np.float32),
        "X_var_ratio": ipca.explained_variance_ratio_.astype(np.float32),
    }
    if out_path is not None:
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        np.savez(out_path, **model)
    return model


def load_pca_model(path: Path) -> Dict[str, Array]:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in ("X_mean", "X_comp", "X_stdev")}


def p_norm_loss(pca: Dict[str, Array], latent_in: Array,
                p_norm_lambda: float = 1.0) -> Array:
    """cal_p_norm_loss (Net.py:96-103): project LeakyReLU(5)(W+) rows onto
    the PCA basis, whiten by stdev, mean squared norm."""
    w = latent_in.astype(jnp.float32)
    p = jnp.where(w >= 0, w, w * 5.0) - pca["X_mean"]
    proj = jnp.einsum("bls,cs->blc", p, pca["X_comp"],
                      preferred_element_type=jnp.float32) / pca["X_stdev"]
    return p_norm_lambda * jnp.mean(jnp.square(proj))


def l_F_loss(latent_F: Array, F_init: Array, l_F_lambda: float = 1.0) -> Array:
    """cal_l_F (Net.py:105-106): MSE between F tensors."""
    return l_F_lambda * jnp.mean(jnp.square(latent_F - F_init))
