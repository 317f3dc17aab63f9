import jax.numpy as jnp
import numpy as np
import pytest

from pylidar_slam_tpu.ops import geometry, projection

PROJ = projection.SphericalProjection(height=32, width=128, up_fov=3.0, down_fov=-24.0)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def random_scan(rng, n=2048):
    """Random points inside the projector FOV."""
    azim = rng.uniform(-np.pi, np.pi, n)
    elev = rng.uniform(np.deg2rad(-23.5), np.deg2rad(2.5), n)
    r = rng.uniform(2.0, 50.0, n)
    x = r * np.cos(elev) * np.cos(azim)
    y = r * np.cos(elev) * np.sin(azim)
    z = r * np.sin(elev)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def test_projection_in_bounds(rng):
    pts = jnp.asarray(random_scan(rng))
    rows, cols, r = PROJ.project(pts)
    assert (np.asarray(rows) >= 0).all() and (np.asarray(rows) < PROJ.height).all()
    assert (np.asarray(cols) >= 0).all() and (np.asarray(cols) < PROJ.width).all()
    np.testing.assert_allclose(r, np.linalg.norm(np.asarray(pts), axis=1), rtol=1e-5)


def test_zero_points_are_invalid():
    pts = jnp.zeros((4, 3), dtype=jnp.float32)
    rows, cols, r = PROJ.project(pts)
    assert (np.asarray(rows) == -1).all()
    assert (np.asarray(r) == 0).all()


def test_vertex_map_closest_wins():
    # Two points projecting to the same pixel; the closer one must win.
    p_far = np.array([20.0, 0.0, -2.0], dtype=np.float32)
    p_near = p_far / 2.0
    pts = jnp.asarray(np.stack([p_far, p_near]))
    vmap = projection.build_vertex_map(pts, PROJ)
    vals = np.asarray(vmap).reshape(-1, 3)
    nonzero = vals[np.abs(vals).sum(axis=1) > 0]
    assert len(nonzero) == 1
    np.testing.assert_allclose(nonzero[0], p_near, rtol=1e-6)


def test_vertex_map_round_trip(rng):
    """Each non-null vertex-map pixel must contain an input point that projects there."""
    pts_np = random_scan(rng, 512)
    pts = jnp.asarray(pts_np)
    vmap = np.asarray(projection.build_vertex_map(pts, PROJ))
    nonzero_mask = np.abs(vmap).sum(axis=-1) > 0
    vals = vmap[nonzero_mask]
    # every value is one of the input points
    for v in vals[:50]:
        dists = np.linalg.norm(pts_np - v, axis=1)
        assert dists.min() < 1e-5


def test_vertex_map_padding_mask(rng):
    pts_np = random_scan(rng, 256)
    padded = np.concatenate([pts_np, rng.normal(size=(64, 3)).astype(np.float32)])
    mask = np.concatenate([np.ones(256, bool), np.zeros(64, bool)])
    vm_masked = np.asarray(projection.build_vertex_map(
        jnp.asarray(padded), PROJ, mask=jnp.asarray(mask)))
    vm_clean = np.asarray(projection.build_vertex_map(jnp.asarray(pts_np), PROJ))
    np.testing.assert_allclose(vm_masked, vm_clean)


def test_compute_neighbors_brute_force(rng):
    """compute_neighbors must equal a brute-force per-pixel argmin over K maps."""
    h, w, k = 8, 16, 4
    target = rng.normal(size=(h, w, 3)).astype(np.float32)
    refs = rng.normal(size=(k, h, w, 3)).astype(np.float32)
    # null some pixels
    target[0, :3] = 0.0
    refs[1, 2, :5] = 0.0
    fields = rng.normal(size=(k, h, w, 3)).astype(np.float32)

    nbrs, flds = geometry.compute_neighbors(
        jnp.asarray(target), jnp.asarray(refs), jnp.asarray(fields))
    nbrs, flds = np.asarray(nbrs), np.asarray(flds)

    for i in range(h):
        for j in range(w):
            if np.abs(target[i, j]).max() == 0:
                np.testing.assert_allclose(nbrs[i, j], 0.0)
                continue
            dists = [np.linalg.norm(target[i, j] - refs[kk, i, j])
                     if np.abs(refs[kk, i, j]).max() > 0 else np.inf
                     for kk in range(k)]
            best = int(np.argmin(dists))
            if np.isinf(dists[best]):
                np.testing.assert_allclose(nbrs[i, j], 0.0)
            else:
                np.testing.assert_allclose(nbrs[i, j], refs[best, i, j], rtol=1e-6)
                np.testing.assert_allclose(flds[i, j], fields[best, i, j], rtol=1e-6)


def test_normal_map_on_plane(rng):
    """Normals of a planar vertex map must align with the plane normal."""
    h, w = 16, 32
    # Plane z = 0.2x + 0.3y + 5 -> normal prop to (-0.2, -0.3, 1)
    xs = rng.uniform(1.0, 10.0, (h, w)).astype(np.float32)
    ys = rng.uniform(1.0, 10.0, (h, w)).astype(np.float32)
    zs = 0.2 * xs + 0.3 * ys + 5.0
    vmap = jnp.asarray(np.stack([xs, ys, zs], axis=-1))
    nmap = np.asarray(geometry.compute_normal_map(vmap, kernel_size=5))
    expected = np.array([-0.2, -0.3, 1.0])
    expected /= np.linalg.norm(expected)
    # Interior pixels (avoid border effects)
    inner = nmap[3:-3, 3:-3].reshape(-1, 3)
    cosines = np.abs(inner @ expected)
    assert (cosines > 0.999).mean() > 0.95


def test_inverse_3x3(rng):
    mats = rng.normal(size=(64, 3, 3)).astype(np.float32)
    mats += 3 * np.eye(3)  # keep well-conditioned
    inv, det = geometry.inverse_3x3(jnp.asarray(mats))
    np.testing.assert_allclose(np.asarray(inv) @ mats,
                               np.tile(np.eye(3), (64, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(det, np.linalg.det(mats), rtol=1e-3)


def test_estimate_timestamps():
    angles = np.linspace(0, 2 * np.pi * 0.99, 100)
    pts = np.stack([np.cos(-angles), np.sin(-angles), np.zeros(100)], axis=1)
    ts = np.asarray(projection.estimate_timestamps(jnp.asarray(pts.astype(np.float32)),
                                                   clockwise=True))
    np.testing.assert_allclose(ts, np.linspace(0, 1, 100), atol=1e-5)


def test_packed_upload_roundtrip():
    """8-byte packed upload codec: <= 1 mm reconstruction error (2 mm range
    steps + f16 angular deltas from the pixel center)."""
    rng = np.random.default_rng(11)
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    n = 20000
    theta = rng.uniform(-np.pi, np.pi, n)
    phi = rng.uniform(np.radians(-23.9), np.radians(2.9), n)
    r = rng.uniform(2.0, 120.0, n)
    pts = np.stack([r * np.cos(phi) * np.cos(theta),
                    -r * np.cos(phi) * np.sin(theta),
                    r * np.sin(phi)], -1).astype(np.float32)
    buf = projection.np_encode_packed_upload(pts, proj)
    assert buf.dtype == np.uint16 and buf.shape[1] == 4
    assert buf.shape[0] > 0.98 * n  # nearly everything inside the image
    dec, valid = projection.decode_packed_upload(jnp.asarray(buf), proj)
    assert bool(np.asarray(valid).all())

    # match decoded rows to their sources (encode preserves kept-row order)
    rk = np.linalg.norm(pts, axis=-1)
    colf = np.round(0.5 * ((-np.arctan2(pts[:, 1], pts[:, 0])) / np.pi + 1.0)
                    * proj.width)
    rowf = np.round((1.0 - (np.arcsin(np.clip(pts[:, 2] / rk, -1, 1))
                            + abs(np.radians(proj.down_fov)))
                     / np.radians(abs(proj.down_fov) + abs(proj.up_fov)))
                    * proj.height)
    # Azimuth wraps (col == w folds to col 0), so only elevation and range
    # can drop points.
    keep = (rowf >= 0) & (rowf <= proj.height - 1) & \
        (rk > 0) & (rk < 65535 * projection.PACKED_RANGE_STEP)
    err = np.linalg.norm(np.asarray(dec) - pts[keep], axis=-1)
    assert err.max() < 2e-3, f"packed roundtrip error too high: {err.max()}"


def test_packed_upload_azimuth_seam_wrap():
    """Points within half a pixel of the +pi azimuth seam must wrap to
    column 0, not be dropped (a systematic half-pixel wedge per scan)."""
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    # theta = -atan2(y, x) ~ +pi (x < 0, y -> 0^-) -> col rounds to w:
    # exactly the seam wedge.
    eps = 1e-5  # well inside the half-pixel wedge (pi/w ~ 3e-3)
    r = 30.0
    pts = np.array([[-r * np.cos(eps), -r * np.sin(eps), 0.0],
                    [-r, -1e-7, 0.0]], np.float32)
    buf = projection.np_encode_packed_upload(pts, proj)
    assert buf.shape[0] == 2, "seam points must be kept"
    assert (buf[:, 0] % proj.width == 0).all(), "seam points wrap to col 0"
    dec, valid = projection.decode_packed_upload(jnp.asarray(buf), proj)
    assert bool(np.asarray(valid).all())
    err = np.linalg.norm(np.asarray(dec) - pts, axis=-1)
    assert err.max() < 2e-3, f"seam roundtrip error {err.max()}"

    # zero rows decode to invalid
    z = np.zeros((8, 4), np.uint16)
    _, zvalid = projection.decode_packed_upload(jnp.asarray(z), proj)
    assert not bool(np.asarray(zvalid).any())


@pytest.mark.parametrize("sub16", [False, True])
def test_range_image_upload_roundtrip(sub16):
    """Fixed-shape range-image codec: native C++ and numpy paths, both
    sub-pixel widths; reconstruction within the documented bounds (~2.3 cm
    for 4+4-bit, ~2 mm for 8+8-bit at <= 80 m)."""
    from pylidar_slam_tpu.utils import native
    rng = np.random.default_rng(7)
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    n = 30000
    theta = np.sort(rng.uniform(-np.pi, np.pi, n))
    phi = rng.uniform(np.radians(-23.9), np.radians(2.9), n)
    r = rng.uniform(2.0, 80.0, n)
    pts = np.stack([r * np.cos(phi) * np.cos(theta),
                    -r * np.cos(phi) * np.sin(theta),
                    r * np.sin(phi)], -1).astype(np.float32)

    buf = projection.np_encode_range_image(pts, proj, sub16=sub16)
    assert buf.shape == (64 * 1024, 4 if sub16 else 3)
    assert buf.dtype == np.uint8

    # numpy fallback agrees with the native encoder on non-empty pixel set
    # (winners may differ on sub-mm range ties / half-pixel boundaries)
    lib_was, att_was = native._lib, native._load_attempted
    native._lib, native._load_attempted = None, True
    try:
        buf_np = projection.np_encode_range_image(pts, proj, sub16=sub16)
    finally:
        native._lib, native._load_attempted = lib_was, att_was
    occ = (buf[:, 0].astype(int) | (buf[:, 1].astype(int) << 8)) > 0
    occ_np = (buf_np[:, 0].astype(int) | (buf_np[:, 1].astype(int) << 8)) > 0
    assert (occ != occ_np).mean() < 1e-3

    dec, valid = projection.decode_range_image(jnp.asarray(buf), proj)
    dec, valid = np.asarray(dec), np.asarray(valid)
    assert (valid == occ).all()
    # every decoded point is close to SOME original point
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(dec[valid], k=1)
    assert d.max() < (0.004 if sub16 else 0.035), d.max()
    # decoded points re-project onto their own pixel (pixel-consistency,
    # under the encoder's biased rounding rule floor(x + 0.53))
    rows, cols, rr = proj.project(jnp.asarray(dec[valid]))
    pix = np.where(valid)[0]
    assert (np.floor(np.asarray(rows) + 0.53) == pix // 1024).all()
    assert (np.floor(np.asarray(cols) + 0.53) % 1024 == pix % 1024).all()


def test_range_image_encode_skips_nan_rows():
    """Uploads must not require a host-side NaN pre-scrub: both encoder
    paths skip non-finite points themselves (the scrub used to double the
    per-frame host encode cost)."""
    from pylidar_slam_tpu.utils import native
    rng = np.random.default_rng(11)
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    n = 20000
    theta = rng.uniform(-np.pi, np.pi, n)
    phi = rng.uniform(np.radians(-23.9), np.radians(2.9), n)
    r = rng.uniform(2.0, 80.0, n)
    pts = np.stack([r * np.cos(phi) * np.cos(theta),
                    -r * np.cos(phi) * np.sin(theta),
                    r * np.sin(phi)], -1).astype(np.float32)
    dirty = pts.copy()
    dirty[::53] = np.nan
    clean = dirty[~np.isnan(dirty).any(axis=1)]
    for planes in (False, True):
        a = projection.np_encode_range_image(dirty, proj, planes=planes)
        b = projection.np_encode_range_image(clean, proj, planes=planes)
        assert np.array_equal(a, b)
        # numpy fallback path too
        lib_was, att_was = native._lib, native._load_attempted
        native._lib, native._load_attempted = None, True
        try:
            c = projection.np_encode_range_image(dirty, proj, planes=planes)
            d = projection.np_encode_range_image(clean, proj, planes=planes)
        finally:
            native._lib, native._load_attempted = lib_was, att_was
        assert np.array_equal(c, d)


def test_range_image_planes_roundtrip():
    """rimg8 (2 B/pixel + angular plane tail): on a (row, col)-separable
    firing pattern -- what a spinning LiDAR produces -- the per-row/per-col
    8-bit plane means recover the beam angles to 1/256 px, so reconstruction
    matches the 8+8-bit per-pixel format (~5 mm at <= 80 m)."""
    from pylidar_slam_tpu.utils import native
    rng = np.random.default_rng(3)
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    h, w = 64, 1024
    fov = np.radians(3.0) + np.radians(24.0)
    # beam grid with FIXED per-row elevation and per-col azimuth offsets
    row_off = rng.uniform(-0.4, 0.4, h)
    col_off = rng.uniform(-0.4, 0.4, w)
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    theta = (2.0 * cols / w - 1.0) * np.pi + col_off[cols] * (2 * np.pi / w)
    phi = (1.0 - rows / h) * fov - np.radians(24.0) + row_off[rows] * (fov / h)
    r = rng.uniform(2.0, 80.0, h * w)
    pts = np.stack([r * np.cos(phi) * np.cos(theta),
                    -r * np.cos(phi) * np.sin(theta),
                    r * np.sin(phi)], -1).astype(np.float32)

    for use_native in (True, False):
        if not use_native:
            lib_was, att_was = native._lib, native._load_attempted
            native._lib, native._load_attempted = None, True
        try:
            buf = projection.np_encode_range_image(pts, proj, planes=True)
        finally:
            if not use_native:
                native._lib, native._load_attempted = lib_was, att_was
        assert buf.shape == (h * w + (h + w) // 2, 2)
        dec, valid = projection.decode_range_image(jnp.asarray(buf), proj)
        dec, valid = np.asarray(dec), np.asarray(valid)
        assert valid.sum() > 0.9 * h * w, valid.sum()
        assert not valid[h * w:].any()  # plane rows decode as invalid
        from scipy.spatial import cKDTree
        d, _ = cKDTree(pts).query(dec[valid], k=1)
        assert d.max() < 0.02, (use_native, d.max())


def test_rimg12_roundtrip():
    """rimg12 (1.5 B/pixel: 12-bit range steps, 4 px per 6-byte row + the
    rimg8 angular plane tail): reconstruction within the 1.5 cm range
    rounding + plane-mean angular error on a separable firing pattern."""
    rng = np.random.default_rng(5)
    proj = projection.SphericalProjection(64, 1024, 3.0, -24.0)
    h, w = 64, 1024
    fov = np.radians(3.0) + np.radians(24.0)
    row_off = rng.uniform(-0.4, 0.4, h)
    col_off = rng.uniform(-0.4, 0.4, w)
    rows = np.repeat(np.arange(h), w)
    cols = np.tile(np.arange(w), h)
    theta = (2.0 * cols / w - 1.0) * np.pi + col_off[cols] * (2 * np.pi / w)
    phi = (1.0 - rows / h) * fov - np.radians(24.0) + row_off[rows] * (fov / h)
    r = rng.uniform(2.0, 110.0, h * w)
    pts = np.stack([r * np.cos(phi) * np.cos(theta),
                    -r * np.cos(phi) * np.sin(theta),
                    r * np.sin(phi)], -1).astype(np.float32)

    buf = projection.np_encode_rimg12(pts, proj)
    # rows padded to a multiple of 256 -> decoded capacity is 1024-aligned
    assert buf.shape == (16640, 6) and buf.dtype == np.uint8
    assert buf.nbytes < 100_000  # 98 KB/frame, 25% under rimg8's 132 KB

    dec, valid = projection.decode_rimg12(jnp.asarray(buf), proj)
    dec, valid = np.asarray(dec), np.asarray(valid)
    assert dec.shape == (66560, 3)
    assert valid.sum() > 0.9 * h * w, valid.sum()
    assert not valid[h * w:].any()  # tail/padding decodes as invalid
    from scipy.spatial import cKDTree
    d, _ = cKDTree(pts).query(dec[valid], k=1)
    # 1.5 cm range rounding + ~1/256 px plane-mean angular at <= 110 m
    assert d.max() < 0.035, d.max()
    assert np.median(d) < 0.012, np.median(d)


def test_centered_normal_fit_is_f32_robust_at_range(rng):
    """The reference's uncentered window solve ((sum v v^T) n = sum v,
    geometry.py:240-295) loses the plane at range in f32: covariance entries
    scale with range^2 and the cancellation noise rivals the curvature
    signal (measured: 47 deg median normal error on a plane 100 m out).
    compute_normal_map_centered subtracts the window mean before the outer
    products and stays exact; both agree near the origin."""
    h, w = 16, 32
    expected = np.array([-0.2, -0.3, 1.0])
    expected /= np.linalg.norm(expected)
    for dist, fns in ((5.0, (geometry.compute_normal_map,
                             geometry.compute_normal_map_centered)),
                      (100.0, (geometry.compute_normal_map_centered,))):
        xs = rng.uniform(dist, dist + 6.0, (h, w)).astype(np.float32)
        ys = rng.uniform(dist, dist + 6.0, (h, w)).astype(np.float32)
        zs = (0.2 * xs + 0.3 * ys + 5.0).astype(np.float32)
        vmap = jnp.asarray(np.stack([xs, ys, zs], axis=-1))
        for fn in fns:
            inner = np.asarray(fn(vmap, 5))[3:-3, 3:-3].reshape(-1, 3)
            cosines = np.abs(inner @ expected)
            assert (cosines > 0.999).mean() > 0.95, (dist, fn.__name__)


def test_centered_normal_fit_masks_invalid_and_null(rng):
    """Zero (null) vertices neither receive nor contaminate normals."""
    h, w = 16, 32
    xs = rng.uniform(4.0, 10.0, (h, w)).astype(np.float32)
    ys = rng.uniform(4.0, 10.0, (h, w)).astype(np.float32)
    zs = (0.2 * xs + 0.3 * ys + 5.0).astype(np.float32)
    vmap = np.stack([xs, ys, zs], axis=-1)
    vmap[6:9, 10:14] = 0.0  # a null hole
    nmap = np.asarray(geometry.compute_normal_map_centered(
        jnp.asarray(vmap), 5))
    assert np.all(nmap[6:9, 10:14] == 0.0)
    expected = np.array([-0.2, -0.3, 1.0])
    expected /= np.linalg.norm(expected)
    ring = nmap[5:10, 9:15].reshape(-1, 3)
    ring = ring[np.linalg.norm(ring, axis=1) > 0]
    cosines = np.abs(ring @ expected)
    assert (cosines > 0.995).all(), cosines.min()
