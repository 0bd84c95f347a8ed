"""main.py CLI end-to-end (subprocess, --tiny config, CPU).

Covers the L5 surface the reference exercises via `python main.py`
(reference main.py:12-80): single-triple mode and the --batch throughput
mode with dedup-case grouping. Uses an all-equal triple so both modes
compile only the cheap 'same' program.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.pop("PYTHONPATH", None)
    return env


@pytest.fixture(scope="module")
def triple_file(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("cli")
    rng = np.random.RandomState(0)
    img = d / "a.png"
    Image.fromarray(rng.randint(0, 255, (128, 128, 3), np.uint8)).save(
        str(img))
    fp = d / "triples.txt"
    fp.write_text("a.png a.png a.png\na.png a.png a.png\n")
    return d, fp


def test_main_cli_single(triple_file):
    d, _ = triple_file
    out = d / "out_single"
    r = subprocess.run(
        [sys.executable, "main.py", "--micro",
         "--face_path", "a.png", "--shape_path", "a.png",
         "--color_path", "a.png", "--input_dir", str(d),
         "--output_dir", str(out)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 1
    from PIL import Image

    assert Image.open(pngs[0]).size == (128, 128)


@pytest.mark.slow  # 107 s: case-grouping logic; test_main_cli_single keeps the CLI default-covered
def test_main_cli_batch_groups_cases(triple_file):
    """--batch groups triples by dedup case: an all-equal triple must run
    the 'same' program, not 'distinct' on equal inputs."""
    d, fp = triple_file
    out = d / "out_batch"
    r = subprocess.run(
        [sys.executable, "main.py", "--tiny", "--batch", "2",
         "--file_path", str(fp), "--input_dir", str(d),
         "--output_dir", str(out)],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 1  # both triples share one output name
