"""Pallas kernels vs jnp reference ops, run in TPU interpret mode on CPU
(SURVEY.md §4: "Pallas kernels compared against the jnp reference
implementations ... interpret-mode runs")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from mvpnet_tpu.ops import reference as ref
from mvpnet_tpu.ops.pallas import knn as pknn


def _rand_points(rng, b, n, scale=2.0):
    return rng.uniform(-scale, scale, size=(b, n, 3)).astype(np.float32)


@pytest.mark.parametrize(
    "b,m,n,k",
    [
        (1, 8, 64, 3),
        (2, 37, 300, 3),  # non-divisible tiles
        (1, 300, 2500, 4),  # multiple ref tiles
        (2, 64, 128, 1),
    ],
)
def test_pallas_knn_matches_reference(rng, b, m, n, k):
    q = jnp.asarray(_rand_points(rng, b, m))
    r = jnp.asarray(_rand_points(rng, b, n))
    d_want, i_want = ref.knn(q, r, k)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pknn.knn(q, r, k)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_want))
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


def test_pallas_knn_ref_mask(rng):
    q = jnp.asarray(_rand_points(rng, 1, 16))
    r = jnp.asarray(_rand_points(rng, 1, 200))
    mask = np.ones((1, 200), bool)
    mask[:, 100:] = False
    d_want, i_want = ref.knn(q, r, 3, ref_mask=jnp.asarray(mask))
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pknn.knn(q, r, 3, ref_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_want))


def test_pallas_knn_grad_matches_reference(rng):
    q = jnp.asarray(_rand_points(rng, 1, 12))
    r = jnp.asarray(_rand_points(rng, 1, 40))

    def loss_ref(q, r):
        d, _ = ref.knn(q, r, 3)
        return jnp.sum(jnp.sin(d))

    def loss_pal(q, r):
        with pltpu.force_tpu_interpret_mode():
            d, _ = pknn.knn(q, r, 3)
        return jnp.sum(jnp.sin(d))

    gq_ref, gr_ref = jax.grad(loss_ref, argnums=(0, 1))(q, r)
    gq_pal, gr_pal = jax.grad(loss_pal, argnums=(0, 1))(q, r)
    np.testing.assert_allclose(np.asarray(gq_pal), np.asarray(gq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_pal), np.asarray(gr_ref), atol=1e-4)


def test_pallas_knn_duplicate_points_tie_break(rng):
    # duplicated refs: both impls must pick the lower index first
    base = _rand_points(rng, 1, 50)
    r = jnp.asarray(np.concatenate([base, base], axis=1))
    q = jnp.asarray(base[:, :10] + 1e-7)
    _, i_want = ref.knn(q, r, 2)
    with pltpu.force_tpu_interpret_mode():
        _, i_got = pknn.knn(q, r, 2)
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_want))


# ---------------------------------------------------------------------------
# Morton-sorted bound-gated kNN kernel (large-ref production path)
# ---------------------------------------------------------------------------
from mvpnet_tpu.ops.pallas import knn_bucketed as pgated


@pytest.fixture
def small_gated_tiles(monkeypatch):
    """Shrink tiles so interpret-mode runs exercise multi-tile gating."""
    monkeypatch.setattr(pgated, "_TILE_M", 32)
    monkeypatch.setattr(pgated, "_TILE_N", 64)
    monkeypatch.setattr(pgated, "_TILE_N_BIG", 64)
    monkeypatch.setattr(pgated, "_VMEM_TILE_M", 32)
    monkeypatch.setattr(pgated, "_VMEM_TILE_N", 64)


@pytest.mark.parametrize(
    "b,m,n,k",
    [
        (2, 100, 1000, 3),
        (1, 37, 500, 4),  # non-divisible tiles
        (1, 64, 800, 1),
    ],
)
def test_gated_knn_matches_reference(rng, small_gated_tiles, b, m, n, k):
    q = jnp.asarray(_rand_points(rng, b, m))
    r = jnp.asarray(_rand_points(rng, b, n))
    d_want, i_want = ref.knn(q, r, k)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, k)
    # ties follow visit order, not index order -> compare neighbor SETS and
    # distances (continuous random data has no ties anyway)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


@pytest.mark.parametrize("b,m,n,k", [(2, 100, 1000, 3), (1, 37, 500, 4)])
def test_vmem_knn_matches_reference(rng, small_gated_tiles, b, m, n, k):
    """The VMEM-resident variant (use_vmem=True) is off the default dispatch
    (measured a wash vs the demand kernel — runs/r5_vmem_knn_bench.json) but
    stays available for sweeps; keep its exactness contract pinned."""
    q = jnp.asarray(_rand_points(rng, b, m))
    r = jnp.asarray(_rand_points(rng, b, n))
    d_want, i_want = ref.knn(q, r, k)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated._knn_forward_demand(q, r, k, use_vmem=True)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


@pytest.mark.parametrize("b,m,n,k", [(2, 100, 1000, 3), (1, 37, 500, 4)])
def test_knn_prepared_matches_reference(rng, small_gated_tiles, b, m, n, k):
    """prepare_refs + knn_prepared == the fused gated call == reference:
    one prepared cloud must serve MANY query sets (the whole-scene
    amortization contract, BASELINE config #4)."""
    r = jnp.asarray(_rand_points(rng, b, n))
    with pltpu.force_tpu_interpret_mode():
        prepared = pgated.prepare_refs(r)
        for qi in range(3):  # several query sets against ONE prepared cloud
            q = jnp.asarray(_rand_points(np.random.default_rng(qi), b, m))
            d_want, i_want = ref.knn(q, r, k)
            d_got, i_got = pgated.knn_prepared(q, prepared, k)
            np.testing.assert_array_equal(
                np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
            )
            np.testing.assert_allclose(
                np.asarray(d_got), np.asarray(d_want), atol=1e-5
            )


def test_knn_prepared_gradients_match_reference(rng, small_gated_tiles):
    """Gradients through prepare_refs + knn_prepared equal the reference
    kNN's AD gradients — w.r.t. queries AND the underlying refs (the custom
    VJP emits sorted-space ref cotangents that must compose exactly with AD
    through the prep's sort/gather). Round-5 VERDICT missing #7."""
    b, m, n, k = 1, 64, 600, 3
    q = jnp.asarray(_rand_points(rng, b, m))
    r = jnp.asarray(_rand_points(rng, b, n))

    def loss_ref(q, r):
        d, _ = ref.knn(q, r, k)
        return jnp.sum(jnp.sin(d))

    def loss_prep(q, r):
        prepared = pgated.prepare_refs(r)
        d, _ = pgated.knn_prepared(q, prepared, k)
        return jnp.sum(jnp.sin(d))

    gq_want, gr_want = jax.grad(loss_ref, argnums=(0, 1))(q, r)
    with pltpu.force_tpu_interpret_mode():
        gq_got, gr_got = jax.grad(loss_prep, argnums=(0, 1))(q, r)
    np.testing.assert_allclose(np.asarray(gq_got), np.asarray(gq_want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_got), np.asarray(gr_want), atol=1e-4)


def test_knn_prepared_sentinel_refs(rng, small_gated_tiles):
    """Invalid-pixel sentinels (1e6 fill) in a prepared cloud are never
    returned while any real ref is closer, exactly like the fused path."""
    r_np = _rand_points(rng, 1, 600)
    r_np[0, 150:300] = 1e6  # a block of invalid pixels
    r = jnp.asarray(r_np)
    q = jnp.asarray(_rand_points(rng, 1, 64))
    d_want, i_want = ref.knn(q, r, 3)
    with pltpu.force_tpu_interpret_mode():
        prepared = pgated.prepare_refs(r)
        d_got, i_got = pgated.knn_prepared(q, prepared, 3)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    assert not np.isin(np.asarray(i_got), np.arange(150, 300)).any()


def test_gated_knn_duplicate_points(rng, small_gated_tiles):
    """Documented tie contract of the GATED kernel (round-2 VERDICT weak #6):
    with exactly-duplicated refs, distances are exact and every returned
    index points at a ref whose COORDINATES equal the reference impl's
    choice — the gathered geometry/features downstream consumers see are
    identical — but the index choice BETWEEN exact duplicates follows the
    lb-sorted visit order, not lowest-original-index."""
    base = _rand_points(rng, 1, 120)
    r = jnp.asarray(np.concatenate([base, base], axis=1))  # every ref twice
    q = jnp.asarray(base[:, :30] + 1e-7)
    k = 3
    d_want, i_want = ref.knn(q, r, k)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, k)
    # kernel uses the exact (q-r)^2 form; the jnp reference's summation
    # order rounds differently at f32 — tolerance covers formula noise only
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_want), atol=1e-6, rtol=1e-5
    )
    # indices must be a valid argmin set: gathered coordinates identical
    want_xyz = np.take_along_axis(
        np.asarray(r), np.sort(np.asarray(i_want), -1).reshape(1, -1, 1), axis=1
    )
    got_xyz = np.take_along_axis(
        np.asarray(r), np.sort(np.asarray(i_got), -1).reshape(1, -1, 1), axis=1
    )
    np.testing.assert_allclose(got_xyz, want_xyz, atol=0)
    # and no index may be returned twice for one query (distinct slots)
    ig = np.asarray(i_got)
    assert all(
        len(set(ig[0, row])) == k for row in range(ig.shape[1])
    ), "duplicate index in one query's neighbor list"


def test_gated_knn_natural_order_refs(rng, small_gated_tiles):
    """sort_refs=False (refs_coherent hint) must return the same neighbor
    sets as the reference — including refs with sentinel coords (invalid
    pixels) scattered through the order, which exercise the masked AABBs."""
    q = jnp.asarray(_rand_points(rng, 2, 96))
    r_np = _rand_points(rng, 2, 700)
    r_np[:, ::7] = 1e6  # scattered invalid-pixel sentinels
    r = jnp.asarray(r_np)
    d_want, i_want = ref.knn(q, r, 3)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, 3, refs_coherent=True)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(
        np.asarray(d_got), np.asarray(d_want), atol=1e-5, rtol=1e-5
    )


def test_gated_knn_surface_cloud(rng, small_gated_tiles):
    # surface-concentrated refs (the fusion pixel-cloud shape): points on a
    # few planes, where AABB pruning is weakest
    planes = []
    for ax in range(3):
        p = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        p[:, ax] = rng.uniform(-1, 1) + rng.normal(0, 0.005, 300)
        planes.append(p)
    r = jnp.asarray(np.concatenate(planes)[None])
    q = jnp.asarray(_rand_points(rng, 1, 80, scale=1.0))
    d_want, i_want = ref.knn(q, r, 3)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, 3)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


def test_gated_knn_ref_mask(rng, small_gated_tiles):
    q = jnp.asarray(_rand_points(rng, 1, 16))
    r = jnp.asarray(_rand_points(rng, 1, 400))
    mask = np.ones((1, 400), bool)
    mask[:, 200:] = False
    d_want, i_want = ref.knn(q, r, 3, ref_mask=jnp.asarray(mask))
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, 3, ref_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


def test_gated_knn_grad_matches_reference(rng, small_gated_tiles):
    q = jnp.asarray(_rand_points(rng, 1, 24))
    r = jnp.asarray(_rand_points(rng, 1, 300))

    def loss_ref(q, r):
        d, _ = ref.knn(q, r, 3)
        return jnp.sum(jnp.sin(d))

    def loss_gated(q, r):
        with pltpu.force_tpu_interpret_mode():
            d, _ = pgated.knn(q, r, 3)
        return jnp.sum(jnp.sin(d))

    gq_ref, gr_ref = jax.grad(loss_ref, argnums=(0, 1))(q, r)
    gq_g, gr_g = jax.grad(loss_gated, argnums=(0, 1))(q, r)
    np.testing.assert_allclose(np.asarray(gq_g), np.asarray(gq_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr_g), np.asarray(gr_ref), atol=1e-4)


def test_morton_code_locality(rng):
    # nearby points get nearby codes: code of a point equals code of itself
    # perturbed within a cell
    pts = jnp.asarray(_rand_points(rng, 1, 64))
    lo = jnp.min(pts, axis=1, keepdims=True)
    hi = jnp.max(pts, axis=1, keepdims=True)
    codes = pgated._morton_code(pts, lo, hi)
    assert codes.shape == (1, 64)
    assert int(jnp.min(codes)) >= 0
    # identical points -> identical codes
    codes2 = pgated._morton_code(pts, lo, hi)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


# ---------------------------------------------------------------------------
# FPS kernel
# ---------------------------------------------------------------------------
from mvpnet_tpu.ops.pallas import fps as pfps
from mvpnet_tpu.ops.pallas import ballquery as pbq


@pytest.mark.parametrize("b,n,m", [(1, 128, 16), (2, 300, 33), (1, 1000, 64)])
def test_pallas_fps_matches_reference(rng, b, n, m):
    pts = jnp.asarray(_rand_points(rng, b, n))
    want = ref.farthest_point_sample(pts, m)
    with pltpu.force_tpu_interpret_mode():
        got = pfps.farthest_point_sample(pts, m)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_fps_masked(rng):
    pts = jnp.asarray(_rand_points(rng, 2, 200))
    mask = np.ones((2, 200), bool)
    mask[:, 150:] = False
    want = ref.farthest_point_sample(pts, 16, valid_mask=jnp.asarray(mask))
    with pltpu.force_tpu_interpret_mode():
        got = pfps.farthest_point_sample(pts, 16, valid_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_fps_masked_index0(rng):
    """Both kernel variants seed at the first VALID index when point 0 is
    masked (round-3 VERDICT weak #6), matching the jnp reference."""
    pts = jnp.asarray(_rand_points(rng, 2, 200))
    mask = np.ones((2, 200), bool)
    mask[0, :7] = False
    mask[1, :3] = False
    mask[:, 150:] = False
    want = np.asarray(
        ref.farthest_point_sample(pts, 16, valid_mask=jnp.asarray(mask))
    )
    assert want[0, 0] == 7 and want[1, 0] == 3
    with pltpu.force_tpu_interpret_mode():
        got_batched = np.asarray(
            pfps.farthest_point_sample(pts, 16, valid_mask=jnp.asarray(mask))
        )
        old_bn = pfps._MAX_BN
        pfps._MAX_BN = 1  # force the per-row grid kernel
        try:
            got_perrow = np.asarray(
                pfps.farthest_point_sample(pts, 16, valid_mask=jnp.asarray(mask))
            )
        finally:
            pfps._MAX_BN = old_bn
    np.testing.assert_array_equal(got_batched, want)
    np.testing.assert_array_equal(got_perrow, want)


# ---------------------------------------------------------------------------
# Ball query kernel
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "b,m,n,k,r",
    [
        (1, 32, 256, 8, 0.5),
        (2, 100, 300, 16, 0.3),  # non-divisible tiles
        (1, 64, 2500, 4, 0.4),   # multiple ref tiles
    ],
)
def test_pallas_ball_query_matches_reference(rng, b, m, n, k, r):
    pts = jnp.asarray(_rand_points(rng, b, n, scale=1.0))
    centers = pts[:, :m]
    want_idx, want_cnt = ref.ball_query(centers, pts, r, k)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = pbq.ball_query(centers, pts, r, k)
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(want_cnt))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_pallas_ball_query_empty_ball(rng):
    pts = jnp.asarray(_rand_points(rng, 1, 300, scale=1.0))
    centers = jnp.asarray(np.full((1, 8, 3), 30.0, np.float32))
    want_idx, want_cnt = ref.ball_query(centers, pts, 0.3, 8)
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = pbq.ball_query(centers, pts, 0.3, 8)
    assert np.all(np.asarray(got_cnt) == 0)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_pallas_ball_query_masked(rng):
    pts = jnp.asarray(_rand_points(rng, 1, 400, scale=1.0))
    centers = pts[:, :16]
    mask = np.ones((1, 400), bool)
    mask[:, 200:] = False
    want_idx, want_cnt = ref.ball_query(
        centers, pts, 0.4, 8, valid_mask=jnp.asarray(mask)
    )
    with pltpu.force_tpu_interpret_mode():
        got_idx, got_cnt = pbq.ball_query(
            centers, pts, 0.4, 8, valid_mask=jnp.asarray(mask)
        )
    np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(want_cnt))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_gated_knn_big_mode_matches_reference(rng, small_gated_tiles, monkeypatch):
    """Force the big-N body (per-subgroup gating nested in the tile gate)."""
    monkeypatch.setattr(pgated, "_BIG_N", 256)
    q = jnp.asarray(_rand_points(rng, 1, 96))
    r = jnp.asarray(_rand_points(rng, 1, 700))
    d_want, i_want = ref.knn(q, r, 3)
    with pltpu.force_tpu_interpret_mode():
        d_got, i_got = pgated.knn(q, r, 3)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_got), -1), np.sort(np.asarray(i_want), -1)
    )
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_want), atol=1e-5)


def test_pallas_fps_batched_and_per_row_agree(rng):
    """Both kernel variants (all-rows-resident and per-row grid) must match
    the reference exactly; force each path via the VMEM-budget gate."""
    from mvpnet_tpu.ops import reference as ref

    pts = jnp.asarray(rng.uniform(-2, 2, (3, 600, 3)), jnp.float32)
    want = np.asarray(ref.farthest_point_sample(pts, 24))
    with pltpu.force_tpu_interpret_mode():
        got_batched = np.asarray(pfps.farthest_point_sample(pts, 24))
        old_bn = pfps._MAX_BN
        pfps._MAX_BN = 1  # force the per-row grid kernel
        try:
            got_rows = np.asarray(pfps.farthest_point_sample(pts, 24))
        finally:
            pfps._MAX_BN = old_bn
    np.testing.assert_array_equal(got_batched, want)
    np.testing.assert_array_equal(got_rows, want)
