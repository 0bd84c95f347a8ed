"""STAR landmark detector (StackedHGNetV1), TPU-native NHWC.

Rebuilds the inference path of reference models/STAR used by rotate
training (scripts/rotate_train.py:76-104, first 76 of 98 WFLW landmarks):
  * CoordConv stem (core/coord_conv.py:5-102): x/y/r coordinate channels
    appended before a conv; hourglass CoordConvs also carry boundary-gated
    coordinate channels from the previous stack's last heatmap
  * ResBlock (stackedHGNetV1.py:74-107): pre-act BN bottleneck with 1x1 skip
  * recursive 4-level Hourglass (:110-148)
  * 4 stacks with AAM (:182-306): heatmap (in+relu), pointmap/edgemap
    (sigmoid), edge->heatmap weights E2HTransform, soft-argmax decoder
    (decoder_default.get_coords_from_heatmap, coords in [-1,1])

WFLW config: classes_num [98, 9, 98], 256^2 input (conf/alignment.py:154-176).

NOTE: the reference's rotate training is broken-as-shipped (undefined
`utility.landmarks_arg`); this port restores the subsystem.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hairfastgan_tpu.models.layers import init_bn, init_conv
from hairfastgan_tpu.ops.basic import batch_norm, conv2d_p, instance_norm, max_pool, relu, sigmoid

Array = jax.Array

WFLW_EDGE_INFO: Tuple[Tuple[bool, Tuple[int, ...]], ...] = (
    (False, tuple(range(33))),                      # FaceContour
    (True, tuple(range(33, 42))),                   # RightEyebrow
    (True, tuple(range(42, 51))),                   # LeftEyebrow
    (False, (51, 52, 53, 54)),                      # NoseLine
    (False, (55, 56, 57, 58, 59)),                  # Nose
    (True, tuple(range(60, 68))),                   # RightEye
    (True, tuple(range(68, 76))),                   # LeftEye
    (True, tuple(range(76, 88))),                   # OuterLip
    (True, tuple(range(88, 96))),                   # InnerLip
)
WFLW_CLASSES = (98, 9, 98)


def _init_convblock(key, k, cin, cout, bn=False):
    p = {"conv": init_conv(key, k, cin, cout)}
    if bn:
        p["bn"] = init_bn(cout)
    return p


def _convblock(p, x, *, stride=1, bn=False, act=False):
    k = p["conv"]["w"].shape[0]
    y = conv2d_p(p["conv"], x, stride=stride, padding=(k - 1) // 2)
    if bn and "bn" in p:
        y = batch_norm(p["bn"], y)
    if act:
        y = relu(y)
    return y


def init_resblock(key, cin, cout, mid=None):
    mid = mid or cout // 2
    ks = jax.random.split(key, 4)
    p = {
        "bn1": init_bn(cin),
        "conv1": _init_convblock(ks[0], 1, cin, mid),
        "bn2": init_bn(mid),
        "conv2": _init_convblock(ks[1], 3, mid, mid),
        "bn3": init_bn(mid),
        "conv3": _init_convblock(ks[2], 1, mid, cout),
    }
    if cin != cout:
        p["skip"] = _init_convblock(ks[3], 1, cin, cout)
    return p


def resblock(p, x):
    r = _convblock(p["skip"], x) if "skip" in p else x
    y = _convblock(p["conv1"], relu(batch_norm(p["bn1"], x)))
    y = _convblock(p["conv2"], relu(batch_norm(p["bn2"], y)))
    y = _convblock(p["conv3"], relu(batch_norm(p["bn3"], y)))
    return y + r


@functools.lru_cache(maxsize=None)
def _coord_channels(h: int, w: int) -> np.ndarray:
    """[H, W, 3]: x, y in [-1,1] and normalized radius (coord_conv.py:19-66).

    In the torch code (NCHW with dims named x_dim=h, y_dim=w) xx varies along
    the HEIGHT axis and yy along the WIDTH axis.
    """
    xx = np.tile((np.arange(h) / (h - 1) * 2 - 1)[:, None], (1, w))
    yy = np.tile((np.arange(w) / (w - 1) * 2 - 1)[None, :], (h, 1))
    rr = np.sqrt(xx ** 2 + yy ** 2)
    rr = rr / rr.max()
    return np.stack([xx, yy, rr], axis=-1).astype(np.float32)


def coordconv(p, x: Array, boundary_heatmap: Optional[Array] = None,
              *, stride=1, bn=False, act=False) -> Array:
    """CoordConv: append x/y/r (+ boundary-gated x/y) channels then conv."""
    h, w = x.shape[1], x.shape[2]
    coords = jnp.asarray(_coord_channels(h, w), x.dtype)
    coords = jnp.tile(coords[None], (x.shape[0], 1, 1, 1))
    feats = [x, coords]
    if boundary_heatmap is not None:
        b = jnp.clip(boundary_heatmap[..., -1:], 0.0, 1.0)
        gate = (b > 0.05).astype(x.dtype)
        feats.append(coords[..., 0:1] * gate)
        feats.append(coords[..., 1:2] * gate)
    y = jnp.concatenate(feats, axis=-1)
    return _convblock(p, y, stride=stride, bn=bn, act=act)


def init_hourglass(key, n: int, f: int, add_coord: bool, first_one: bool):
    ks = jax.random.split(key, 5)
    p = {
        "up1": init_resblock(ks[0], f, f),
        "low1": init_resblock(ks[1], f, f),
        "low3": init_resblock(ks[2], f, f),
    }
    if n > 1:
        p["low2"] = init_hourglass(ks[3], n - 1, f, False, False)
    else:
        p["low2"] = init_resblock(ks[3], f, f)
    if add_coord:
        p["coordconv"] = _init_convblock(
            ks[4], 1, f + (3 if first_one else 5), f)
    return p


def hourglass(p, x: Array, heatmap: Optional[Array] = None) -> Array:
    if "coordconv" in p:
        x = coordconv(p["coordconv"], x, heatmap)
    up1 = resblock(p["up1"], x)
    low = max_pool(x, 2, 2)
    low = resblock(p["low1"], low)
    # nested hourglass vs leaf resblock is pytree STRUCTURE (always
    # static under jit) — "up1" only exists on hourglass nodes; a raw int
    # leaf here becomes a tracer when the params are jit arguments
    if "up1" in p["low2"]:
        low = hourglass(p["low2"], low)
    else:
        low = resblock(p["low2"], low)
    low = resblock(p["low3"], low)
    up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)  # nearest x2
    return up1 + up2


def _e2h_matrix(edge_info, num_points: int, num_edges: int):
    m = np.zeros((num_points, num_edges), np.float32)
    for e, (_, idxs) in enumerate(edge_info):
        for pt in idxs:
            m[pt, e] = 1.0
    bias = (m.sum(1) < 0.5).astype(np.float32)
    return m, bias


def init_star(key, classes=WFLW_CLASSES, edge_info=WFLW_EDGE_INFO,
              nstack: int = 4, nlevels: int = 4, channels: int = 256):
    heats, edges, points = classes
    ks = iter(jax.random.split(key, 16 + nstack * 16))
    e2h_w, e2h_b = _e2h_matrix(edge_info, points, edges)
    p = {
        "pre_conv": _init_convblock(next(ks), 7, 3 + 3, 64, bn=True),  # coord
        "pre_r1": init_resblock(next(ks), 64, 128),
        "pre_r2": init_resblock(next(ks), 128, 128),
        "pre_r3": init_resblock(next(ks), 128, channels),
        "stacks": [],
        "e2h_w": jnp.asarray(e2h_w),
        "e2h_b": jnp.asarray(e2h_b),
    }
    for i in range(nstack):
        stack = {
            "hg": init_hourglass(next(ks), nlevels, channels, True, i == 0),
            "feat_r": init_resblock(next(ks), channels, channels),
            "feat_c": _init_convblock(next(ks), 1, channels, channels, bn=True),
            "out_heat": _init_convblock(next(ks), 1, channels, heats),
            "out_point": _init_convblock(next(ks), 1, channels, points),
            "out_edge": _init_convblock(next(ks), 1, channels, edges),
        }
        if i < nstack - 1:
            stack["merge_feat"] = _init_convblock(next(ks), 1, channels, channels)
            stack["merge_heat"] = _init_convblock(next(ks), 1, heats, channels)
            stack["merge_point"] = _init_convblock(next(ks), 1, points, channels)
            stack["merge_edge"] = _init_convblock(next(ks), 1, edges, channels)
        p["stacks"].append(stack)
    return p


def _soft_argmax(heatmap: Array, with_spread: bool = False):
    """[B,H,W,K] -> [B,K,2] (x, y) in [-1,1] (decoder_default).

    With `with_spread`, also returns the radial stddev [B,K] of the fused
    heatmap around its soft-argmax, in [-1,1] units: a trained peak has
    spread ~0.1, a diffuse/no-face response ~0.8 (uniform over the map) —
    the confidence signal behind utils/face_align.AlignmentError.
    """
    b, h, w, k = heatmap.shape
    yy = jnp.linspace(-1.0, 1.0, h, dtype=heatmap.dtype)[None, :, None, None]
    xx = jnp.linspace(-1.0, 1.0, w, dtype=heatmap.dtype)[None, None, :, None]
    s = jnp.clip(jnp.sum(heatmap, axis=(1, 2)), 1e-6)
    y = jnp.sum(heatmap * yy, axis=(1, 2)) / s
    x = jnp.sum(heatmap * xx, axis=(1, 2)) / s
    lm = jnp.stack([x, y], axis=-1)
    if not with_spread:
        return lm
    y2 = jnp.sum(heatmap * yy * yy, axis=(1, 2)) / s
    x2 = jnp.sum(heatmap * xx * xx, axis=(1, 2)) / s
    var = jnp.maximum(x2 - x * x, 0.0) + jnp.maximum(y2 - y * y, 0.0)
    return lm, jnp.sqrt(var)


def star_landmarks(p, img: Array, with_spread: bool = False):
    """img [B,256,256,3] normalized (0.5/0.5) -> [B,98,2] coords in [-1,1].

    Returns the final stack's soft-argmax landmarks (rotate training uses
    coords[:, :76], rotate_train.py:102-104). With `with_spread`, returns
    (landmarks [B,98,2], spread [B,98]) — see `_soft_argmax`.
    """
    x = coordconv(p["pre_conv"], img, stride=2, bn=True, act=True)
    x = resblock(p["pre_r1"], x)
    x = max_pool(x, 2, 2)
    x = resblock(p["pre_r2"], x)
    x = resblock(p["pre_r3"], x)

    heatmaps = None
    landmarks = None
    for i, st in enumerate(p["stacks"]):
        hg = hourglass(st["hg"], x, heatmap=heatmaps)
        feat = _convblock(st["feat_c"], resblock(st["feat_r"], hg),
                          bn=True, act=True)

        heat0 = _convblock(st["out_heat"], feat)
        heatmaps = relu(instance_norm(heat0))  # Activation('in+relu')

        points = sigmoid(_convblock(st["out_point"], feat))
        edges = sigmoid(_convblock(st["out_edge"], feat))
        # E2HTransform: 1x1 conv with the fixed edge->point weights + bias
        mask = jnp.einsum("bhwe,pe->bhwp", edges, p["e2h_w"].astype(edges.dtype),
                          preferred_element_type=edges.dtype)
        mask = mask + p["e2h_b"].astype(edges.dtype)
        fusion = mask * points * heatmaps
        landmarks = _soft_argmax(fusion, with_spread=with_spread)

        if i < len(p["stacks"]) - 1:
            x = (x + _convblock(st["merge_feat"], feat)
                 + _convblock(st["merge_heat"], heatmaps)
                 + _convblock(st["merge_point"], points)
                 + _convblock(st["merge_edge"], edges))
    return landmarks


def keypoints_256(p, img01_256: Array, n_points: int = 76) -> Array:
    """[0,1] 256 image -> first n_points landmarks in pixel coords
    (rotate_train.py:102-104: (lm+1)/2 * 255)."""
    lm = star_landmarks(p, img01_256 * 2.0 - 1.0)
    return (lm[:, :n_points] + 1.0) / 2.0 * 255.0


def convert_star(sd) -> Dict:
    """STAR WFLW checkpoint ('net' state_dict) -> params tree."""
    from hairfastgan_tpu.params.convert import t_bn, t_conv

    def cb(name, bn=False):
        out = {"conv": t_conv(sd, f"{name}.conv")}
        if bn:
            out["bn"] = t_bn(sd, f"{name}.bn")
        return out

    def rb(name):
        out = {
            "bn1": t_bn(sd, f"{name}.bn1"),
            "conv1": cb(f"{name}.conv1"),
            "bn2": t_bn(sd, f"{name}.bn2"),
            "conv2": cb(f"{name}.conv2"),
            "bn3": t_bn(sd, f"{name}.bn3"),
        }
        out["conv3"] = cb(f"{name}.conv3")
        if f"{name}.skip_layer.conv.weight" in sd:
            # torch builds skip_layer unconditionally; only load when used
            in_c = sd[f"{name}.bn1.running_mean"].shape[0]
            out_c = sd[f"{name}.conv3.conv.weight"].shape[0]
            if in_c != out_c:
                out["skip"] = cb(f"{name}.skip_layer")
        return out

    def hg(name, n, first_one):
        out = {
            "up1": rb(f"{name}.up1"),
            "low1": rb(f"{name}.low1"),
            "low3": rb(f"{name}.low3"),
        }
        if n > 1:
            out["low2"] = hg(f"{name}.low2", n - 1, False)
        else:
            out["low2"] = rb(f"{name}.low2")
        if f"{name}.coordconv.conv.weight" in sd:
            out["coordconv"] = {"conv": t_conv(sd, f"{name}.coordconv.conv")}
        return out

    e2h_w, e2h_b = _e2h_matrix(WFLW_EDGE_INFO, WFLW_CLASSES[2], WFLW_CLASSES[1])
    nstack = 4
    p = {
        "pre_conv": {"conv": t_conv(sd, "pre.0.conv"), "bn": t_bn(sd, "pre.0.bn")},
        "pre_r1": rb("pre.1"),
        "pre_r2": rb("pre.3"),
        "pre_r3": rb("pre.4"),
        "stacks": [],
        "e2h_w": jnp.asarray(e2h_w),
        "e2h_b": jnp.asarray(e2h_b),
    }
    for i in range(nstack):
        st = {
            "hg": hg(f"hgs.{i}", 4, i == 0),
            "feat_r": rb(f"features.{i}.0"),
            "feat_c": cb(f"features.{i}.1", bn=True),
            "out_heat": cb(f"out_heatmaps.{i}"),
            "out_point": cb(f"out_pointmaps.{i}"),
            "out_edge": cb(f"out_edgemaps.{i}"),
        }
        if i < nstack - 1:
            st["merge_feat"] = cb(f"merge_features.{i}")
            st["merge_heat"] = cb(f"merge_heatmaps.{i}")
            st["merge_point"] = cb(f"merge_pointmaps.{i}")
            st["merge_edge"] = cb(f"merge_edgemaps.{i}")
        p["stacks"].append(st)
    return p
