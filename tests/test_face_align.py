"""FFHQ alignment: quad geometry, WFLW/dlib layout agreement, the
on-device STAR landmark provider, and raw-image coercion."""

import numpy as np
import pytest

from hairfastgan_tpu.utils.face_align import (
    _ffhq_quad,
    _ffhq_quad_wflw,
    _warp_quad,
    align_faces,
    star_landmark_provider,
)


def _ring(center, r, n):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return center + r * np.stack([np.cos(t), np.sin(t)], -1)


def _synthetic_landmarks(eye_l, eye_r, mouth_l, mouth_r):
    """(lm68, lm98) encoding identical eye centers + mouth corners."""
    lm68 = np.zeros((68, 2))
    lm68[36:42] = _ring(eye_l, 3.0, 6)
    lm68[42:48] = _ring(eye_r, 3.0, 6)
    lm68[48], lm68[54] = mouth_l, mouth_r
    lm98 = np.zeros((98, 2))
    lm98[60:68] = _ring(eye_l, 3.0, 8)
    lm98[68:76] = _ring(eye_r, 3.0, 8)
    lm98[76], lm98[82] = mouth_l, mouth_r
    return lm68, lm98


def test_quad_wflw_matches_dlib_layout():
    """Same facial features through either landmark layout -> same quad."""
    eye_l, eye_r = np.array([40.0, 50.0]), np.array([80.0, 48.0])
    mouth_l, mouth_r = np.array([48.0, 90.0]), np.array([74.0, 92.0])
    lm68, lm98 = _synthetic_landmarks(eye_l, eye_r, mouth_l, mouth_r)
    q68, s68 = _ffhq_quad(lm68)
    q98, s98 = _ffhq_quad_wflw(lm98)
    np.testing.assert_allclose(q98, q68, atol=1e-9)
    assert abs(s98 - s68) < 1e-9


def test_quad_wflw_orientation_safe():
    """Swapping which ring holds which eye (subject- vs image-left naming)
    must not change the quad — corners are ordered by x."""
    eye_l, eye_r = np.array([40.0, 50.0]), np.array([80.0, 48.0])
    mouth_l, mouth_r = np.array([48.0, 90.0]), np.array([74.0, 92.0])
    _, lm98 = _synthetic_landmarks(eye_l, eye_r, mouth_l, mouth_r)
    swapped = lm98.copy()
    swapped[60:68], swapped[68:76] = lm98[68:76].copy(), lm98[60:68].copy()
    swapped[76], swapped[82] = lm98[82].copy(), lm98[76].copy()
    np.testing.assert_allclose(_ffhq_quad_wflw(swapped)[0],
                               _ffhq_quad_wflw(lm98)[0], atol=1e-9)


def test_quad_geometry_invariants():
    """The FFHQ quad is a square centered near the face."""
    eye_l, eye_r = np.array([40.0, 50.0]), np.array([80.0, 50.0])
    mouth_l, mouth_r = np.array([50.0, 90.0]), np.array([70.0, 90.0])
    lm68, _ = _synthetic_landmarks(eye_l, eye_r, mouth_l, mouth_r)
    quad, qsize = _ffhq_quad(lm68)
    sides = np.linalg.norm(np.roll(quad, -1, 0) - quad, axis=1)
    np.testing.assert_allclose(sides, sides[0], rtol=1e-9)  # square
    assert abs(qsize - sides[0]) < 1e-6  # qsize = 2|x| = side length
    center = quad.mean(0)
    expected = (eye_l + eye_r) / 2 + 0.1 * ((mouth_l + mouth_r) / 2
                                            - (eye_l + eye_r) / 2)
    np.testing.assert_allclose(center, expected, atol=1e-9)


def test_warp_quad_full_frame_is_resize():
    """Quad covering the whole image == plain LANCZOS downscale."""
    from PIL import Image

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (256, 256, 3), np.uint8)
    h, w = u8.shape[:2]
    quad = np.array([[0, 0], [0, h], [w, h], [w, 0]], np.float64) - 0.5
    out = _warp_quad(u8, quad, 64)
    ref = np.asarray(Image.fromarray(u8).resize((64, 64), Image.LANCZOS),
                     ).astype(np.float32) / 255.0
    assert np.abs(out - ref).mean() < 0.02


@pytest.fixture(scope="module")
def tiny_star():
    import jax

    from hairfastgan_tpu.models import star

    edge_info = tuple((True, tuple(range(98)))
                      for _ in range(9))
    return star.init_star(jax.random.PRNGKey(0), classes=(98, 9, 98),
                          edge_info=edge_info, nstack=1, nlevels=2,
                          channels=8)


def test_star_provider_shapes(tiny_star):
    """Provider returns [98,2] pixel coords inside the photo frame for a
    non-square input (exercises coarse pass + refine crop + padding)."""
    rng = np.random.RandomState(0)
    img = rng.rand(200, 160, 3).astype(np.float32)
    fn = star_landmark_provider(tiny_star)
    lm = fn(img)
    assert lm.shape == (98, 2)
    assert np.isfinite(lm).all()
    # soft-argmax coords live in [-1,1] -> mapped inside the frame
    assert (lm[:, 0] >= -160).all() and (lm[:, 0] <= 320).all()


def test_align_faces_star_end_to_end(tiny_star):
    """align_faces with star_params: no dlib import, valid aligned crop."""
    rng = np.random.RandomState(1)
    img = rng.rand(180, 220, 3).astype(np.float32)
    out = align_faces([img], output_size=64, star_params=tiny_star)
    assert len(out) == 1
    assert out[0].shape == (64, 64, 3)
    assert out[0].dtype == np.float32
    assert 0.0 <= out[0].min() and out[0].max() <= 1.0


def test_align_faces_requires_provider():
    try:
        import dlib  # noqa: F401

        pytest.skip("dlib available in this environment")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="STAR|dlib"):
        align_faces([np.zeros((64, 64, 3), np.float32)])


def test_to_raw_image_no_resize():
    from hairfastgan_tpu.utils.images import to_raw_image

    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 255, (130, 70, 3), np.uint8)
    out = to_raw_image(u8)
    assert out.shape == (130, 70, 3) and out.dtype == np.float32
    np.testing.assert_allclose(out, u8.astype(np.float32) / 255.0)
    chw = np.transpose(u8, (2, 0, 1))
    np.testing.assert_allclose(to_raw_image(chw), out)
