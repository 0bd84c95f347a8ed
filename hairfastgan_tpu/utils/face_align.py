"""FFHQ-style face alignment (preprocessing for in-the-wild photos).

The reference uses dlib's 68-landmark detector + a quad crop
(utils/shape_predictor.py:49-194, scripts/align_face.py). Two landmark
providers drive the same FFHQ quad geometry here:

  * dlib (host-side, optional dependency) — bit-compatible with the
    reference's recipe;
  * the STAR landmark model (models/star.py, WFLW 98-point) running
    ON DEVICE — no dlib/host detector needed. STAR has no face detector,
    so it runs coarse-to-fine: one pass on the whole (resized) photo, then
    a refined pass on a square crop around the detected landmarks. This is
    the SURVEY §7 "dlib replacement" path; results are equivalent in
    geometry but not bit-identical to dlib's landmarks.

The crop geometry reproduces the FFHQ recipe: eye/mouth landmarks ->
oriented quad -> PIL QUAD transform to 4x target -> LANCZOS down.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


def _quad_from_features(eye_left: np.ndarray, eye_right: np.ndarray,
                        mouth_left: np.ndarray, mouth_right: np.ndarray):
    """FFHQ oriented quad from eye centers + mouth corners
    (reference utils/shape_predictor.py:96-115)."""
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (mouth_left + mouth_right) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
    x /= np.hypot(*x)
    x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
    y = np.flipud(x) * [-1, 1]
    c = eye_avg + eye_to_mouth * 0.1
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    return quad, np.hypot(*x) * 2


def _ffhq_quad(lm: np.ndarray):
    """dlib 68-landmark array -> (quad [4,2], qsize)."""
    return _quad_from_features(lm[36:42].mean(0), lm[42:48].mean(0),
                               lm[48], lm[54])


def _ffhq_quad_wflw(lm: np.ndarray):
    """WFLW 98-landmark array -> (quad [4,2], qsize).

    WFLW eye rings are 60:68 / 68:76 and outer-mouth corners 76 / 82
    (models/star.py WFLW_EDGE_INFO); ordered by x so subject-vs-image
    left/right conventions cannot flip the quad.
    """
    eyes = sorted([lm[60:68].mean(0), lm[68:76].mean(0)], key=lambda p: p[0])
    mouth = sorted([lm[76], lm[82]], key=lambda p: p[0])
    return _quad_from_features(eyes[0], eyes[1], mouth[0], mouth[1])


def _warp_quad(u8: np.ndarray, quad: np.ndarray, output_size: int) -> np.ndarray:
    """Quad crop -> [output_size]^2 float [0,1] (FFHQ transform+LANCZOS)."""
    from PIL import Image

    pil = Image.fromarray(u8)
    transform_size = output_size * 4
    pil = pil.transform((transform_size, transform_size), Image.QUAD,
                        (quad + 0.5).flatten(), Image.BILINEAR)
    pil = pil.resize((output_size, output_size), Image.LANCZOS)
    return np.asarray(pil).astype(np.float32) / 255.0


def star_landmark_provider(star_params, n_points: int = 98,
                           refine: bool = True) -> Callable:
    """On-device WFLW landmarks from the STAR model — the detector-free
    provider. Coarse pass on the full photo (assumes it is roughly
    face-centered, as portraits are), then a refined pass on a square crop
    spanning 2x the landmark extent (STAR's training crops frame the face
    with that margin).

    Returns fn: [H,W,3] float [0,1] -> [n_points,2] pixel coords (x, y)
    in the input image's frame.
    """
    import jax
    import jax.numpy as jnp

    from hairfastgan_tpu.models.star import star_landmarks
    from hairfastgan_tpu.ops.resample import resize

    # fixed 256^2 shape -> ONE compiled program; eager would dispatch the
    # whole hourglass op-by-op (hundreds of round-trips through the tunnel)
    lm_256 = jax.jit(lambda x: star_landmarks(star_params, x * 2.0 - 1.0))

    def run_256(img01: np.ndarray) -> np.ndarray:
        x = resize(jnp.asarray(img01, jnp.float32)[None], (256, 256),
                   "bilinear")
        lm = lm_256(x)  # [-1,1] coords
        return (np.asarray(lm[0, :n_points], np.float64) + 1.0) / 2.0

    def fn(img01: np.ndarray) -> np.ndarray:
        h, w = img01.shape[:2]
        lm = run_256(img01) * [w, h]  # coarse, full frame
        if not refine:
            return lm
        c = (lm.min(0) + lm.max(0)) / 2.0
        half = max(float((lm.max(0) - lm.min(0)).max()), 8.0)  # 2x extent
        x0, y0 = int(round(c[0] - half)), int(round(c[1] - half))
        x1, y1 = int(round(c[0] + half)), int(round(c[1] + half))
        pad = max(0, -x0, -y0, x1 - w, y1 - h)
        src = (np.pad(img01, ((pad, pad), (pad, pad), (0, 0)), "reflect")
               if pad else img01)
        crop = src[y0 + pad:y1 + pad, x0 + pad:x1 + pad]
        if min(crop.shape[:2]) < 2:
            return lm
        return run_256(crop) * [crop.shape[1], crop.shape[0]] + [x0, y0]

    return fn


def _dlib_landmark_fn() -> Callable:
    import dlib

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(
        "pretrained_models_jax/shape_predictor_68_face_landmarks.dat")

    def fn(img01: np.ndarray) -> np.ndarray:
        u8 = (np.asarray(img01) * 255).astype(np.uint8)
        dets = detector(u8, 1)
        if not dets:
            raise ValueError("no face detected")
        shape = predictor(u8, dets[0])
        return np.array([[pt.x, pt.y] for pt in shape.parts()], np.float64)

    return fn


def align_faces(images: List[np.ndarray], output_size: int = 1024,
                star_params=None,
                landmark_fn: Optional[Callable] = None,
                landmark_layout: str = "auto") -> List[np.ndarray]:
    """[H,W,3] float [0,1] photos (ANY size — do not pre-resize; the quad
    crops from the original pixels) -> aligned FFHQ-style crops.

    Provider resolution: explicit `landmark_fn` (layout "dlib68" or
    "wflw98") > STAR when `star_params` is given (on-device, no dlib) >
    dlib. Raises with guidance when neither is available.
    """
    if landmark_fn is not None:
        if landmark_layout == "auto":
            raise ValueError(
                "custom landmark_fn needs landmark_layout='dlib68'|'wflw98'")
        layout = landmark_layout
    elif star_params is not None:
        landmark_fn = star_landmark_provider(star_params)
        layout = "wflw98"
    else:
        try:
            landmark_fn = _dlib_landmark_fn()
            layout = "dlib68"
        except ImportError as e:
            raise RuntimeError(
                "face alignment needs a landmark provider: either install "
                "dlib (+ shape_predictor_68_face_landmarks.dat), or place "
                "the STAR checkpoint (star_wflw.pth) in the zoo dir for the "
                "on-device path, or pass pre-aligned 1024x1024 FFHQ-style "
                "crops with align=False") from e

    quad_of = _ffhq_quad if layout == "dlib68" else _ffhq_quad_wflw
    out = []
    for img in images:
        img = np.asarray(img, np.float32)
        lm = np.asarray(landmark_fn(img), np.float64)
        quad, _ = quad_of(lm)
        u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        out.append(_warp_quad(u8, quad, output_size))
    return out
