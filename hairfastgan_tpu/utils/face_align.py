"""FFHQ-style face alignment (preprocessing for in-the-wild photos).

The reference uses dlib's 68-landmark detector + a quad crop
(utils/shape_predictor.py:49-194, scripts/align_face.py). dlib is an
optional host-side dependency here; when absent we raise with guidance
rather than silently skipping — alignment changes results materially.

The crop geometry below reproduces the FFHQ recipe: eye/mouth landmarks ->
oriented quad -> shrink/crop/pad -> quad transform to 4x target -> LANCZOS
down to the target size.
"""

from __future__ import annotations

from typing import List

import numpy as np


def _ffhq_quad(lm: np.ndarray):
    """68-landmark array -> (quad [4,2], qsize) per the FFHQ recipe."""
    lm_eye_left = lm[36:42]
    lm_eye_right = lm[42:48]
    mouth_left, mouth_right = lm[48], lm[54]

    eye_left = lm_eye_left.mean(0)
    eye_right = lm_eye_right.mean(0)
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


def align_faces(images: List[np.ndarray], output_size: int = 1024) -> List[np.ndarray]:
    """[H,W,3] float [0,1] images -> aligned 1024^2 crops."""
    try:
        import dlib  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "face alignment requires dlib (and the shape_predictor_68 model); "
            "install it or pass pre-aligned 1024x1024 FFHQ-style crops with "
            "align=False") from e

    from PIL import Image

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(
        "pretrained_models_jax/shape_predictor_68_face_landmarks.dat")

    out = []
    for img in images:
        u8 = (np.asarray(img) * 255).astype(np.uint8)
        dets = detector(u8, 1)
        if not dets:
            raise ValueError("no face detected")
        shape = predictor(u8, dets[0])
        lm = np.array([[pt.x, pt.y] for pt in shape.parts()], dtype=np.float64)
        quad, qsize = _ffhq_quad(lm)

        pil = Image.fromarray(u8)
        transform_size = output_size * 4
        pil = pil.transform((transform_size, transform_size), Image.QUAD,
                            (quad + 0.5).flatten(), Image.BILINEAR)
        pil = pil.resize((output_size, output_size), Image.LANCZOS)
        out.append(np.asarray(pil).astype(np.float32) / 255.0)
    return out
