"""parity_harness plumbing: golden-layout round trip on the tiny zoo.

Builds a golden directory in the REFERENCE's save_all layout (torch NCHW
latents, vis-mask PNGs, final.png) from our own tiny-pipeline run, then
feeds it back through scripts.parity_harness.compare_run — so a layout or
transpose mistake in the harness fails CI without needing real checkpoints.
"""

import dataclasses

import jax
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def run():
    from hairfastgan_tpu.pipeline import hair_fast
    from hairfastgan_tpu.zoo import init_tiny_zoo

    zoo, cfg = init_tiny_zoo(KEY)
    size = cfg.stylegan.size
    rng = np.random.RandomState(0)
    imgs = tuple(jax.numpy.asarray(rng.rand(1, size, size, 3), jax.numpy.float32)
                 for _ in range(3))
    fn = jax.jit(lambda z, f, s, c: hair_fast(
        z, f, s, c, case="distinct", cfg=cfg, return_intermediate=True))
    final, inter = fn(zoo, *imgs)
    return np.asarray(final), {k: np.asarray(v) for k, v in inter.items()}


def _write_golden(d, final, inter):
    """Emit the reference save_all layout from our run's tensors."""
    from PIL import Image

    from hairfastgan_tpu.utils.save_utils import save_vis_mask

    def to_torch_f(f):  # NHWC -> [1,C,H,W]
        return np.transpose(f, (2, 0, 1))[None]

    for name in ("face", "shape", "color"):
        (d / "W+").mkdir(parents=True, exist_ok=True)
        (d / "FS").mkdir(exist_ok=True)
        np.savez(d / "W+" / f"{name}.npz", latent_W=inter[f"W_{name}"])
        np.savez(d / "FS" / f"{name}.npz", latent_S=inter[f"S_{name}"],
                 latent_F=to_torch_f(inter[f"F_{name}"][0]))
        save_vis_mask(d, "Shape", f"mask_{name}.png", inter[f"mask_{name}"][0])
    (d / "Align").mkdir(exist_ok=True)
    np.savez(d / "Align" / "face_shape_F.npz",
             latent_F_align=to_torch_f(inter["latent_F_align"][0]))
    (d / "Blending").mkdir(exist_ok=True)
    np.savez(d / "Blending" / "blending.npz", S_blend=inter["S_blend"])
    (d / "Final").mkdir(exist_ok=True)
    np.savez(d / "Final" / "final.npz", S_final=inter["S_final"],
             F_final=to_torch_f(inter["F_final"][0]))
    arr = (np.clip(final[0], 0, 1) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(d / "Final" / "final.png")


def test_compare_run_self_consistent(run, tmp_path):
    from scripts.parity_harness import Report, compare_run

    final, inter = run
    _write_golden(tmp_path, final, inter)
    args = type("A", (), dict(tol=0.02, mask_floor=0.98, psnr_floor=30.0))
    rep = Report()
    compare_run(inter, final, tmp_path, args, "zero", rep)
    assert rep.failures == []


def test_compare_run_detects_regression(run, tmp_path):
    """A corrupted stage must be reported, and exactly that stage."""
    from scripts.parity_harness import Report, compare_run

    final, inter = run
    _write_golden(tmp_path, final, inter)
    bad = dict(inter, S_blend=inter["S_blend"] + 1.0)
    args = type("A", (), dict(tol=0.02, mask_floor=0.98, psnr_floor=30.0))
    rep = Report()
    compare_run(bad, final, tmp_path, args, "zero", rep)
    assert rep.failures == ["zero:S_blend"]


def test_vis_mask_decode_roundtrip(tmp_path):
    from hairfastgan_tpu.utils.save_utils import save_vis_mask
    from scripts.parity_harness import decode_vis_mask

    lab = np.random.RandomState(1).randint(0, 19, (64, 64))
    save_vis_mask(tmp_path, "Shape", "m.png", lab)
    back = decode_vis_mask(tmp_path / "Shape" / "m.png")
    np.testing.assert_array_equal(back, lab)
