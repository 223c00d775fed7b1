"""Segmentation op tests: SLIC locality/coverage, connected components, and the
full CRF pipeline on constructed ICP-error maps."""

import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, SegmentationParams
from cofusion_tpu.io.synthetic import SyntheticScene
from cofusion_tpu.ops import segmentation as sg


def test_slic_locality_and_coverage(small_cam, rng):
    scene = SyntheticScene()
    rgb, depth, _ = scene.render(small_cam, np.eye(4))
    cfg = CoFusionConfig(camera=small_cam)
    assign = np.asarray(sg.slic_assign(jnp.asarray(rgb), cfg))
    S = cfg.superpixel_size
    GW = small_cam.width // S
    GH = small_cam.height // S
    assert assign.min() >= 0 and assign.max() < GW * GH
    # locality: every pixel's cluster center within 2S of the pixel
    ys, xs = np.meshgrid(np.arange(small_cam.height), np.arange(small_cam.width), indexing="ij")
    cx = (assign % GW) * S + S // 2
    cy = (assign // GW) * S + S // 2
    assert (np.abs(xs - cx) <= 2 * S).mean() > 0.99
    assert (np.abs(ys - cy) <= 2 * S).mean() > 0.99
    # most clusters non-empty
    counts = np.bincount(assign.ravel(), minlength=GW * GH)
    assert (counts > 0).mean() > 0.9


def test_downsample_upsample_roundtrip(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    S = cfg.superpixel_size
    GW, GH = small_cam.width // S, small_cam.height // S
    K = GW * GH
    # grid-aligned assignment
    y = np.arange(small_cam.height)[:, None] // S
    x = np.arange(small_cam.width)[None, :] // S
    assign = jnp.asarray(np.minimum(y, GH - 1) * GW + np.minimum(x, GW - 1))
    img = jnp.asarray(np.tile(np.arange(K, dtype=np.float32), 1)[np.asarray(assign)])
    means, cnt = sg.downsample_mean(img, assign, K)
    np.testing.assert_allclose(np.asarray(means), np.arange(K), atol=1e-4)
    up = sg.upsample(means, assign)
    np.testing.assert_allclose(np.asarray(up), np.asarray(img), atol=1e-4)


def test_connected_components_two_blobs():
    labels = np.zeros((8, 10), np.int32)
    labels[1:3, 1:3] = 1   # blob A
    labels[5:7, 6:9] = 1   # blob B (same label, disconnected)
    comp = np.asarray(sg.connected_components(jnp.asarray(labels)))
    a = comp[1, 1]
    b = comp[5, 6]
    assert a != b
    assert (comp[1:3, 1:3] == a).all()
    assert (comp[5:7, 6:9] == b).all()
    bg = comp[0, 0]
    assert (comp[labels == 0] == bg).all()


def test_crf_spawns_new_label_on_high_error_blob(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=3)
    params = SegmentationParams()
    H, W = small_cam.shape
    M = 3
    scene = SyntheticScene()
    rgb, depth, _ = scene.render(small_cam, np.eye(4))
    S = cfg.superpixel_size
    # high ICP error blob in the image center — a moving object in front of
    # previously-fused background yields dist errors on the order of the
    # depth gap (~1m+), not centimeters (reduce.cu search() writes |vprev-vcurr|),
    # and sits at its own depth (the appearance kernel uses depth as a feature).
    # Blob must span several superpixels: the Potts smoothing scales erode a
    # one-cell ring.
    depth = depth.copy()
    err0 = np.full((H, W), 0.002, np.float32)
    by0, by1 = H // 2 - 32, H // 2 + 32
    bx0, bx1 = W // 2 - 40, W // 2 + 40
    err0[by0:by1, bx0:bx1] = 1.2
    depth[by0:by1, bx0:bx1] = 1.8
    icp_errors = np.zeros((M, H, W), np.float32)
    icp_errors[0] = err0
    confs = np.zeros((M, H, W), np.float32)
    confs[0] = 1.0
    active = np.array([True, False, False])

    res = sg.perform_segmentation_crf(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(icp_errors), jnp.asarray(confs),
        jnp.asarray(active), jnp.int32(1), True, small_cam, cfg, params,
    )
    seg = np.asarray(res.full_segmentation)
    assert bool(res.has_new_label)
    inner = seg[by0 + 8 : by1 - 8, bx0 + 8 : bx1 - 8]
    assert (inner == 1).mean() > 0.8, (inner == 1).mean()
    outer = seg[: by0 - S, :]
    assert (outer == 0).mean() > 0.9, (outer == 0).mean()


def test_crf_no_new_label_when_errors_low(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=3)
    params = SegmentationParams()
    H, W = small_cam.shape
    M = 3
    scene = SyntheticScene()
    rgb, depth, _ = scene.render(small_cam, np.eye(4))
    icp_errors = np.full((M, H, W), 0.001, np.float32)
    confs = np.zeros((M, H, W), np.float32)
    confs[0] = 1.0
    active = np.array([True, False, False])
    res = sg.perform_segmentation_crf(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(icp_errors), jnp.asarray(confs),
        jnp.asarray(active), jnp.int32(1), True, small_cam, cfg, params,
    )
    seg = np.asarray(res.full_segmentation)
    assert not bool(res.has_new_label)
    assert (seg == 0).mean() > 0.95

def test_sp_sums_local_matches_scatter(small_cam, rng):
    """The scatter-free block accumulation (grid=) must match the 1D
    scatter-add form on real SLIC assignments — same strided pixel subset,
    so equality up to float reassociation."""
    scene = SyntheticScene()
    rgb, depth, _ = scene.render(small_cam, np.eye(4))
    cfg = CoFusionConfig(camera=small_cam)
    S = cfg.superpixel_size
    GH, GW = small_cam.height // S, small_cam.width // S
    K = GH * GW
    assign = sg.slic_assign(jnp.asarray(rgb), cfg)

    m_ref, c_ref = sg.downsample_mean(jnp.asarray(rgb, jnp.float32), assign, K)
    m_new, c_new = sg.downsample_mean(
        jnp.asarray(rgb, jnp.float32), assign, K, grid=(GH, GW, S)
    )
    np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_new), np.asarray(m_ref), rtol=1e-5, atol=1e-4)

    # thresholded variant (depth path)
    d = jnp.asarray(depth, jnp.float32)
    md_ref, cd_ref = sg.downsample_mean(d, assign, K, min_threshold=0.02)
    md_new, cd_new = sg.downsample_mean(d, assign, K, min_threshold=0.02, grid=(GH, GW, S))
    np.testing.assert_allclose(np.asarray(cd_new), np.asarray(cd_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(md_new), np.asarray(md_ref), rtol=1e-5, atol=1e-4)

    # batched variant (confidence path)
    imgs = jnp.asarray(rng.random((3,) + small_cam.shape), jnp.float32)
    b_ref = sg.downsample_mean_b(imgs, assign, K)
    b_new = sg.downsample_mean_b(imgs, assign, K, grid=(GH, GW, S))
    np.testing.assert_allclose(np.asarray(b_new), np.asarray(b_ref), rtol=1e-5, atol=1e-4)


def test_sp_sums_local_remainder_strips(rng):
    """H/W not multiples of S: the remainder strips go through exact tiny
    scatters — totals must still match the scatter form."""
    cam = CameraConfig(width=166, height=130, fx=132.0, fy=132.0, cx=83.0, cy=65.0)
    cfg = CoFusionConfig(camera=cam)
    S = cfg.superpixel_size
    GH, GW = cam.height // S, cam.width // S
    K = GH * GW
    rgb = jnp.asarray(rng.random((cam.height, cam.width, 3)) * 255.0, jnp.float32)
    assign = sg.slic_assign(rgb, cfg)
    m_ref, c_ref = sg.downsample_mean(rgb, assign, K)
    m_new, c_new = sg.downsample_mean(rgb, assign, K, grid=(GH, GW, S))
    np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_new), np.asarray(m_ref), rtol=1e-5, atol=1e-4)
