"""Probe: run the rotate / blending / pp training CLIs on the real TPU.

pp training was TPU-validated step-level in round 3 (tools/
pp_compile_probe.py: frozen-as-argument => 7.2 MB HLO, 1.15 s/step). The
reference ships THREE encoder trainers (scripts/{rotate,blending,pp}_
train.py); this tool closes the loop for the other two by running each
CLI's real `main()` in-process on the default backend (axon TPU) with
synthetic tiny rows — full loop: step compile through the tunnel, epoch,
validation, best/last checkpoints.

Usage (on the TPU host; minutes per CLI, compiles ride the persistent
cache on reruns):
    python tools/train_tpu_probe.py [--families rotate,blending,pp]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

N_LATENT_TINY = 12  # 128-res generator: 2*log2(128) - 2


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/hairfast_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def make_rotate_rows(root: Path):
    rng = np.random.RandomState(0)
    pose, hair = root / "pose", root / "hair"
    pose.mkdir()
    hair.mkdir()
    for i in range(4):
        np.savez(pose / f"{i}.npz",
                 I_from=rng.rand(1, 256, 256, 3).astype(np.float32),
                 kp_to=rng.rand(1, 76, 2).astype(np.float32) * 255,
                 W_from=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1,
                 W_to=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1)
        np.savez(hair / f"{i}.npz",
                 W_from=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1,
                 W_to=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1)
    return pose, hair


def make_blending_rows(root: Path):
    # row ABI of train/datagen.generate_blending_sample at tiny(128) config:
    # F rides at the structural 32x32x512 (tiny zoos shrink resolution, not
    # the FS interface — zoo.init_tiny_zoo)
    rng = np.random.RandomState(0)
    data = root / "blend"
    data.mkdir()
    for i in range(4):
        np.savez(data / f"row_{i:06d}.npz",
                 color_s=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1,
                 align_s=rng.randn(1, N_LATENT_TINY, 512).astype(np.float32) * 0.1,
                 align_f=rng.randn(1, 32, 32, 512).astype(np.float32) * 0.1,
                 color_i=rng.randn(1, 256, 256, 3).astype(np.float32) * 0.5,
                 face_i=rng.randn(1, 256, 256, 3).astype(np.float32) * 0.5,
                 target_mask=(rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32),
                 HM_3E=(rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32),
                 HM_XE=(rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32))
    return data


def make_pp_rows(root: Path, gen_size=128):
    rng = np.random.RandomState(0)
    data = root / "pp"
    data.mkdir()
    for i in range(4):
        np.savez(data / f"row_{i:06d}.npz",
                 source=rng.randn(1, 256, 256, 3).astype(np.float32) * 0.3,
                 target=rng.randn(1, 256, 256, 3).astype(np.float32) * 0.3,
                 target_mask=(rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32),
                 HT_E=(rng.rand(1, 256, 256, 1) > 0.5).astype(np.float32),
                 source_full=rng.randn(1, gen_size, gen_size, 3)
                 .astype(np.float32) * 0.3)
    return data


def run_rotate(root: Path):
    from scripts.train_rotate import main
    pose, hair = make_rotate_rows(root)
    main(["--pose_dir", str(pose), "--hair_dir", str(hair),
          "--zoo_dir", str(root / "nozoo"), "--tiny", "--no_keypoints",
          "--epochs", "1", "--batch_size", "2", "--test_frac", "0.5",
          "--ckpt_dir", str(root / "ckpt_rot"),
          "--log", str(root / "rot.jsonl")])
    assert (root / "ckpt_rot" / "last").exists()


def run_blending(root: Path):
    from scripts.train_blending import main
    data = make_blending_rows(root)
    main(["--data_dir", str(data), "--zoo_dir", str(root / "nozoo"),
          "--tiny", "--epochs", "1", "--batch_size", "2",
          "--test_frac", "0.5", "--ckpt_dir", str(root / "ckpt_blend"),
          "--log", str(root / "blend.jsonl")])
    assert (root / "ckpt_blend" / "last").exists()


def run_pp(root: Path, split: bool):
    from scripts.train_pp import main
    data = make_pp_rows(root)
    argv = ["--data_dir", str(data), "--zoo_dir", str(root / "nozoo"),
            "--tiny", "--epochs", "1", "--batch_size", "2",
            "--test_frac", "0.5", "--ckpt_dir", str(root / "ckpt_pp"),
            "--grid_dir", str(root / "grids"), "--log", str(root / "pp.jsonl")]
    if split:
        argv.append("--split_compile")
    main(argv)
    assert (root / "ckpt_pp" / "last").exists()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="rotate,blending",
                    help="comma list of rotate,blending,pp (pp is the slow "
                         "one: fused tiny enc_step measured 178 s compile)")
    ap.add_argument("--pp_split", action="store_true",
                    help="pp via --split_compile (smaller programs)")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    print("backend devices:", jax.devices())

    runners = {"rotate": run_rotate, "blending": run_blending,
               "pp": lambda r: run_pp(r, args.pp_split)}
    for fam in args.families.split(","):
        fam = fam.strip()
        root = Path(tempfile.mkdtemp(prefix=f"tpu_probe_{fam}_"))
        t0 = time.time()
        runners[fam](root)
        print(f"[train_tpu_probe] {fam}: full tiny CLI loop OK on "
              f"{jax.devices()[0].platform} in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
