"""NVlabs persistence-pickle loader tests (params/nvlabs.py).

Builds a synthetic `ffhq.pkl`-format pickle: objects reduce to
`torch_utils.persistence._reconstruct_persistent_obj(meta)` with the state
layout of nn.Module.__dict__ (persistence.py:119-126) — and asserts that
(a) our loader extracts the state WITHOUT executing any reconstruction
code, and (b) `convert_nvlabs_discriminator` produces exactly the tree
`convert_discriminator` produces from the equivalent rosinality layout.
"""

import math
import pickle
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

from hairfastgan_tpu.params.convert import convert_discriminator
from hairfastgan_tpu.params.nvlabs import (
    convert_nvlabs_discriminator,
    load_nvlabs_pickle,
    stub_state_dict,
)

SIZE = 64


# ---------------------------------------------------------------------------
# synthetic persistence pickle machinery
# ---------------------------------------------------------------------------

def _install_fake_persistence():
    if "torch_utils.persistence" in sys.modules:
        return sys.modules["torch_utils.persistence"]
    pkg = types.ModuleType("torch_utils")
    mod = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):
        raise AssertionError(
            "embedded-source reconstruction must never run in our loader")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    mod._reconstruct_persistent_obj = _reconstruct_persistent_obj
    pkg.persistence = mod
    sys.modules["torch_utils"] = pkg
    sys.modules["torch_utils.persistence"] = mod

    dnn = types.ModuleType("dnnlib")

    class EasyDict(dict):
        pass

    EasyDict.__module__ = "dnnlib"
    EasyDict.__qualname__ = "EasyDict"
    dnn.EasyDict = EasyDict
    sys.modules.setdefault("dnnlib", dnn)
    return mod


class _Persistent:
    """Pickles exactly like a persistence-decorated module (persistence.py:119-126)."""

    def __init__(self, class_name, state):
        self.class_name = class_name
        self.state = state

    def __reduce__(self):
        mod = _install_fake_persistence()
        meta = dict(type="class", version=6, module_src="# not executed",
                    class_name=self.class_name, state=self.state)
        return (mod._reconstruct_persistent_obj, (meta,))


def _leaf(weight, bias=None, filt=True):
    params = {"weight": torch.from_numpy(weight)}
    if bias is not None:
        params["bias"] = torch.from_numpy(bias)
    buffers = {"resample_filter": torch.ones(4, 4) / 16} if filt else {}
    return _Persistent("Conv2dLayer", {
        "_parameters": params, "_buffers": buffers, "_modules": {}})


def _rosinality_to_nvlabs_pickle(sd, size):
    """Rename a rosinality Discriminator state_dict into the ada b{res} tree
    and wrap it as a persistence pickle."""
    log = int(math.log2(size))

    def oihw(name):
        return sd[name].numpy()

    blocks = {}
    top = f"b{size}"
    blocks[top] = {"fromrgb": _leaf(oihw("convs.0.0.weight"),
                                    oihw("convs.0.1.bias"), filt=False)}
    for j in range(1, log - 1):
        res = size >> (j - 1)
        b = blocks.setdefault(f"b{res}", {})
        b["conv0"] = _leaf(oihw(f"convs.{j}.conv1.0.weight"),
                           oihw(f"convs.{j}.conv1.1.bias"), filt=False)
        b["conv1"] = _leaf(oihw(f"convs.{j}.conv2.1.weight"),
                           oihw(f"convs.{j}.conv2.2.bias"))
        b["skip"] = _leaf(oihw(f"convs.{j}.skip.1.weight"))

    def fc(wname, bname):
        return _Persistent("FullyConnectedLayer", {
            "_parameters": {"weight": sd[wname], "bias": sd[bname]},
            "_buffers": {}, "_modules": {}})

    blocks["b4"] = {
        "mbstd": _Persistent("MinibatchStdLayer",
                             {"_parameters": {}, "_buffers": {}, "_modules": {}}),
        "conv": _leaf(oihw("final_conv.0.weight"), oihw("final_conv.1.bias"),
                      filt=False),
        "fc": fc("final_linear.0.weight", "final_linear.0.bias"),
        "out": fc("final_linear.1.weight", "final_linear.1.bias"),
    }

    d = _Persistent("Discriminator", {
        "_parameters": {}, "_buffers": {},
        "_modules": {name: (_Persistent("DiscriminatorBlock", {
            "_parameters": {}, "_buffers": {}, "_modules": mods})
            if isinstance(mods, dict) else mods)
            for name, mods in blocks.items()},
    })

    _install_fake_persistence()
    from dnnlib import EasyDict

    return pickle.dumps(EasyDict(D=d, training_set_kwargs=EasyDict(xflip=True)))


@pytest.fixture(scope="module")
def pkl_and_sd(tmp_path_factory):
    sys.path.append("/root/reference")  # only for layout naming docs; unused
    torch.manual_seed(0)
    # rosinality-layout synthetic weights (shapes of Discriminator(SIZE))
    from hairfastgan_tpu.config import StyleGANConfig

    cfg = StyleGANConfig(size=SIZE)
    ch = cfg.channels
    sd = {}

    def conv(name, cin, cout, k):
        sd[name] = torch.randn(cout, cin, k, k) * 0.1

    conv("convs.0.0.weight", 3, ch(SIZE), 1)
    sd["convs.0.1.bias"] = torch.randn(ch(SIZE)) * 0.1
    in_ch = ch(SIZE)
    for j, i in enumerate(range(int(math.log2(SIZE)), 2, -1), start=1):
        out_ch = ch(2 ** (i - 1))
        conv(f"convs.{j}.conv1.0.weight", in_ch, in_ch, 3)
        sd[f"convs.{j}.conv1.1.bias"] = torch.randn(in_ch) * 0.1
        conv(f"convs.{j}.conv2.1.weight", in_ch, out_ch, 3)
        sd[f"convs.{j}.conv2.2.bias"] = torch.randn(out_ch) * 0.1
        conv(f"convs.{j}.skip.1.weight", in_ch, out_ch, 1)
        in_ch = out_ch
    conv("final_conv.0.weight", ch(4) + 1, ch(4), 3)
    sd["final_conv.1.bias"] = torch.randn(ch(4)) * 0.1
    sd["final_linear.0.weight"] = torch.randn(ch(4), ch(4) * 16) * 0.1
    sd["final_linear.0.bias"] = torch.randn(ch(4)) * 0.1
    sd["final_linear.1.weight"] = torch.randn(1, ch(4)) * 0.1
    sd["final_linear.1.bias"] = torch.randn(1) * 0.1

    path = tmp_path_factory.mktemp("pkl") / "ffhq.pkl"
    path.write_bytes(_rosinality_to_nvlabs_pickle(sd, SIZE))
    return path, sd


def test_loader_extracts_state_without_exec(pkl_and_sd):
    path, sd = pkl_and_sd
    data = load_nvlabs_pickle(str(path))
    assert "D" in data
    flat = stub_state_dict(data["D"])
    assert f"b{SIZE}.fromrgb.weight" in flat
    assert "b4.fc.weight" in flat
    np.testing.assert_array_equal(flat[f"b{SIZE}.fromrgb.weight"],
                                  sd["convs.0.0.weight"].numpy())
    # buffers walked too
    assert f"b{SIZE // 2}.conv1.resample_filter" in flat


def test_nvlabs_converter_matches_rosinality(pkl_and_sd):
    path, sd = pkl_and_sd
    data = load_nvlabs_pickle(str(path))
    p_nv = convert_nvlabs_discriminator(stub_state_dict(data["D"]), size=SIZE)
    p_ros = convert_discriminator({k: v.numpy() for k, v in sd.items()},
                                  size=SIZE)
    import jax

    jax.tree.map(np.testing.assert_array_equal, p_nv, p_ros)


def test_converted_d_runs(pkl_and_sd):
    import jax
    import jax.numpy as jnp

    from hairfastgan_tpu.models.stylegan2_discriminator import discriminator
    from hairfastgan_tpu.params.nvlabs import load_nvlabs_discriminator

    path, _ = pkl_and_sd
    p = jax.tree.map(jnp.asarray, load_nvlabs_discriminator(str(path), size=SIZE))
    x = jnp.asarray(np.random.RandomState(0).randn(4, SIZE, SIZE, 3),
                    jnp.float32) * 0.5
    y = discriminator(p, x)
    assert y.shape == (4, 1)
    assert np.isfinite(np.asarray(y)).all()
