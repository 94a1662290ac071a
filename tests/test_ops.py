"""Op-level golden tests: jnp reference ops vs independent NumPy/SciPy oracles.

Mirrors SURVEY.md §4 implication 1: pure-NumPy oracles for FPS, ball query,
grouping (+grad), kNN, three-NN interpolation. The oracles below are written
straight from the canonical PointNet++ op definitions, independently of
mvpnet_tpu/ops/reference.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial import cKDTree, distance_matrix

from mvpnet_tpu import ops
from mvpnet_tpu.ops import reference as ref


def _rand_points(rng, b, n, scale=2.0):
    return rng.uniform(-scale, scale, size=(b, n, 3)).astype(np.float32)


# --------------------------------------------------------------------------
# oracles
# --------------------------------------------------------------------------


def fps_oracle(points, npoint):
    """Sequential farthest point sampling, seeded at index 0."""
    B, N, _ = points.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        dist = np.full(N, np.inf)
        last = 0
        for i in range(1, npoint):
            d = np.sum((points[b] - points[b, last]) ** 2, axis=-1)
            dist = np.minimum(dist, d)
            last = int(np.argmax(dist))
            out[b, i] = last
    return out


def ball_query_oracle(centers, points, radius, nsample):
    """First-nsample in-radius hits in index order; pad with first hit;
    empty ball -> nearest point."""
    B, M, _ = centers.shape
    idx = np.zeros((B, M, nsample), np.int32)
    cnt = np.zeros((B, M), np.int32)
    for b in range(B):
        d2 = distance_matrix(centers[b], points[b]) ** 2
        for m in range(M):
            hits = np.nonzero(d2[m] < radius * radius)[0][:nsample]
            if len(hits) == 0:
                idx[b, m, :] = np.argmin(d2[m])
            else:
                idx[b, m, : len(hits)] = hits
                idx[b, m, len(hits):] = hits[0]
            cnt[b, m] = len(hits)
    return idx, cnt


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_pairwise_sqdist(rng):
    a = _rand_points(rng, 2, 37)
    b = _rand_points(rng, 2, 53)
    got = np.asarray(ref.pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        want = distance_matrix(a[i], b[i]) ** 2
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_fps_matches_oracle(rng):
    pts = _rand_points(rng, 3, 128)
    got = np.asarray(ref.farthest_point_sample(jnp.asarray(pts), 16))
    want = fps_oracle(pts, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_masked(rng):
    pts = _rand_points(rng, 2, 64)
    mask = np.ones((2, 64), bool)
    mask[:, 40:] = False
    got = np.asarray(
        ref.farthest_point_sample(jnp.asarray(pts), 8, valid_mask=jnp.asarray(mask))
    )
    assert got.max() < 40  # never selects invalid points
    want = fps_oracle(pts[:, :40], 8)
    np.testing.assert_array_equal(got, want)


def test_fps_masked_index0(rng):
    """Seed contract at the edge: when point 0 is invalid, the seed is the
    FIRST VALID index — invalid points are never selected, including slot 0
    (round-3 VERDICT weak #6)."""
    pts = _rand_points(rng, 2, 64)
    mask = np.ones((2, 64), bool)
    mask[:, :10] = False
    mask[:, 40:] = False
    got = np.asarray(
        ref.farthest_point_sample(jnp.asarray(pts), 8, valid_mask=jnp.asarray(mask))
    )
    assert got[:, 0].tolist() == [10, 10]
    assert (got >= 10).all() and (got < 40).all()
    want = fps_oracle(pts[:, 10:40], 8) + 10
    np.testing.assert_array_equal(got, want)


def test_fps_spread(rng):
    # FPS must spread: min pairwise distance among selected >> random choice.
    pts = _rand_points(rng, 1, 512)
    idx = np.asarray(ref.farthest_point_sample(jnp.asarray(pts), 32))[0]
    sel = pts[0, idx]
    d = distance_matrix(sel, sel) + np.eye(32) * 1e9
    rand_sel = pts[0, rng.choice(512, 32, replace=False)]
    dr = distance_matrix(rand_sel, rand_sel) + np.eye(32) * 1e9
    assert d.min() > dr.min()


def test_ball_query_matches_oracle(rng):
    pts = _rand_points(rng, 2, 256, scale=1.0)
    centers = pts[:, :32]
    got_idx, got_cnt = ref.ball_query(
        jnp.asarray(centers), jnp.asarray(pts), 0.3, 16
    )
    want_idx, want_cnt = ball_query_oracle(centers, pts, 0.3, 16)
    np.testing.assert_array_equal(np.asarray(got_cnt), np.minimum(want_cnt, 16))
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_ball_query_empty_ball(rng):
    pts = _rand_points(rng, 1, 64, scale=1.0)
    centers = np.full((1, 4, 3), 50.0, np.float32)  # far from everything
    idx, cnt = ref.ball_query(jnp.asarray(centers), jnp.asarray(pts), 0.3, 8)
    assert np.all(np.asarray(cnt) == 0)
    d2 = distance_matrix(centers[0], pts[0]) ** 2
    np.testing.assert_array_equal(
        np.asarray(idx)[0], np.tile(np.argmin(d2, axis=1)[:, None], (1, 8))
    )


def test_group_points(rng):
    feats = rng.normal(size=(2, 64, 7)).astype(np.float32)
    idx = rng.integers(0, 64, size=(2, 10, 4)).astype(np.int32)
    got = np.asarray(ref.group_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], feats[b][idx[b]])


def test_group_points_grad_is_scatter_add(rng):
    feats = rng.normal(size=(1, 16, 4)).astype(np.float32)
    idx = np.array([[[0, 0, 3, 5]]], np.int32)  # repeated index 0

    def f(x):
        return jnp.sum(ref.group_points(x, jnp.asarray(idx)) * 2.0)

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))[0]
    want = np.zeros((16, 4), np.float32)
    for j in [0, 0, 3, 5]:
        want[j] += 2.0
    np.testing.assert_allclose(g, want)


def test_knn_matches_kdtree(rng):
    q = _rand_points(rng, 2, 100)
    r = _rand_points(rng, 2, 300)
    d_got, i_got = ref.knn(jnp.asarray(q), jnp.asarray(r), 3)
    for b in range(2):
        tree = cKDTree(r[b])
        d_want, i_want = tree.query(q[b], k=3)
        np.testing.assert_array_equal(np.asarray(i_got)[b], i_want)
        np.testing.assert_allclose(
            np.asarray(d_got)[b], d_want**2, atol=1e-4
        )


def test_knn_ref_mask(rng):
    q = _rand_points(rng, 1, 20)
    r = _rand_points(rng, 1, 50)
    mask = np.ones((1, 50), bool)
    mask[:, 25:] = False
    _, i_got = ref.knn(jnp.asarray(q), jnp.asarray(r), 3, ref_mask=jnp.asarray(mask))
    assert np.asarray(i_got).max() < 25
    tree = cKDTree(r[0, :25])
    _, i_want = tree.query(q[0], k=3)
    np.testing.assert_array_equal(np.asarray(i_got)[0], i_want)


def test_three_nn_interpolate(rng):
    dense = _rand_points(rng, 2, 40)
    sparse = _rand_points(rng, 2, 12)
    feat = rng.normal(size=(2, 12, 5)).astype(np.float32)
    got = np.asarray(
        ref.three_nn_interpolate(
            jnp.asarray(dense), jnp.asarray(sparse), jnp.asarray(feat)
        )
    )
    for b in range(2):
        tree = cKDTree(sparse[b])
        d, i = tree.query(dense[b], k=3)
        w = 1.0 / (d**2 + 1e-8)
        w /= w.sum(axis=1, keepdims=True)
        want = (feat[b][i] * w[..., None]).sum(axis=1)
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_three_nn_interpolate_exact_at_sparse_points(rng):
    # Interpolating at the sparse points themselves reproduces their features.
    sparse = _rand_points(rng, 1, 16)
    feat = rng.normal(size=(1, 16, 3)).astype(np.float32)
    got = np.asarray(
        ref.three_nn_interpolate(jnp.asarray(sparse), jnp.asarray(sparse), jnp.asarray(feat))
    )
    np.testing.assert_allclose(got, feat, atol=1e-3)


def test_three_nn_interpolate_grad(rng):
    dense = _rand_points(rng, 1, 10)
    sparse = _rand_points(rng, 1, 6)
    feat = rng.normal(size=(1, 6, 4)).astype(np.float32)

    def f(x):
        return jnp.sum(
            ref.three_nn_interpolate(jnp.asarray(dense), jnp.asarray(sparse), x) ** 2
        )

    g = jax.grad(f)(jnp.asarray(feat))
    # finite differences
    eps = 1e-3
    fd = np.zeros_like(feat)
    for i in np.ndindex(feat.shape):
        fp = feat.copy(); fp[i] += eps
        fm = feat.copy(); fm[i] -= eps
        fd[i] = (f(jnp.asarray(fp)) - f(jnp.asarray(fm))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-2, rtol=1e-2)


def test_dispatch_reference_on_cpu(rng):
    q = jnp.asarray(_rand_points(rng, 1, 8))
    r = jnp.asarray(_rand_points(rng, 1, 16))
    d1, i1 = ops.knn(q, r, 3)
    d2, i2 = ref.knn(q, r, 3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ops_accept_bfloat16_points(rng, dtype):
    pts = jnp.asarray(_rand_points(rng, 1, 64)).astype(dtype)
    idx = ref.farthest_point_sample(pts, 8)
    assert idx.shape == (1, 8)
    d, i = ref.knn(pts[:, :16], pts, 3)
    assert d.dtype == jnp.float32  # distances always f32
