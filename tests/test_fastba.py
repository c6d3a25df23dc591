import jax.numpy as jnp
import numpy as np

from texturefusion_tpu.config import BAConfig
from texturefusion_tpu.core import se3
from texturefusion_tpu.slam import fastba


def _make_pose_graph(n_kf=6, n_pts=120, noise=0.05, seed=0):
    """GT world poses on an arc; landmarks; edges between consecutive
    keyframes + one loop edge (first-last)."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n_kf):
        xi = np.concatenate([
            [0.4 * k, 0.02 * k, 0.01 * k * k],
            [0.0, 0.05 * k, 0.0]]).astype(np.float32)
        gt.append(np.asarray(se3.se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)
    pts_w = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    pts_w[:, 2] += 4.0

    pairs = [(k, k + 1) for k in range(n_kf - 1)] + [(0, n_kf - 1)]
    cap = 16
    edges = fastba.make_edges(cap)
    e_list = {k: [] for k in edges._fields}
    for (i, j) in pairs:
        ti = np.linalg.inv(gt[i])
        tj = np.linalg.inv(gt[j])
        p = pts_w @ ti[:3, :3].T + ti[:3, 3]   # in frame i
        q = pts_w @ tj[:3, :3].T + tj[:3, 3]   # in frame j
        w = np.ones(n_pts, np.float32)
        s = fastba.preintegrate_edge(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w))
        for name, val in zip(("s_w", "s_p", "s_q", "s_pp", "s_qq", "s_pq"), s):
            e_list[name].append(np.asarray(val))
    n_e = len(pairs)

    def fill(arr, vals):
        out = np.asarray(arr).copy()
        out[:n_e] = np.stack(vals)
        return jnp.asarray(out)

    edges = fastba.EdgeSums(
        kf_i=jnp.asarray(np.pad([p[0] for p in pairs], (0, cap - n_e)).astype(np.int32)),
        kf_j=jnp.asarray(np.pad([p[1] for p in pairs], (0, cap - n_e)).astype(np.int32)),
        s_w=fill(edges.s_w, e_list["s_w"]),
        s_p=fill(edges.s_p, e_list["s_p"]),
        s_q=fill(edges.s_q, e_list["s_q"]),
        s_pp=fill(edges.s_pp, e_list["s_pp"]),
        s_qq=fill(edges.s_qq, e_list["s_qq"]),
        s_pq=fill(edges.s_pq, e_list["s_pq"]),
        valid=jnp.asarray(np.arange(cap) < n_e),
    )

    # noisy initial poses (gauge: keyframe 0 exact)
    init = gt.copy()
    for k in range(1, n_kf):
        xi = np.concatenate([rng.normal(0, noise, 3), rng.normal(0, noise / 2, 3)])
        init[k] = np.asarray(se3.compose(jnp.asarray(gt[k]),
                                         se3.se3_exp(jnp.asarray(xi.astype(np.float32)))))
    n_total = 8
    poses = np.tile(np.eye(4, dtype=np.float32), (n_total, 1, 1))
    poses[:n_kf] = init
    active = np.arange(n_total) < n_kf
    return jnp.asarray(poses), edges, jnp.asarray(active), gt, n_total


def test_edge_error_zero_at_gt():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.0)
    e = np.asarray(fastba.edge_errors(poses, edges))
    np.testing.assert_allclose(e, 0.0, atol=1e-3)


def test_edge_error_positive_with_noise():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.05)
    e = np.asarray(fastba.edge_errors(poses, edges))
    assert e[:7].sum() > 1e-2


def test_gn_converges_to_gt():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.05)
    cfg = BAConfig(gn_rounds=3, gn_iterations_per_round=5)
    out, edges2, errs = fastba.optimize(poses, edges, n_total, active, cfg)
    out = np.asarray(out)
    # compare up to the gauge (kf0 pinned at its init == GT)
    for k in range(6):
        d = np.asarray(se3.pose_distance(jnp.asarray(out[k]), jnp.asarray(gt[k])))
        assert d < 1e-6, (k, d)
    assert errs[-1][1] < errs[0][0] * 1e-4


def test_rollback_no_worse_than_start():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.3, seed=3)
    cfg = BAConfig(gn_rounds=1, gn_iterations_per_round=2)
    out, e0, e1 = fastba.gauss_newton_rounds(poses, edges, n_total, active, cfg)
    assert float(e1) <= float(e0) * cfg.rollback_error_growth + 1e-6


def test_prune_outlier_edges_keeps_odometry():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.0)
    # corrupt the loop edge (index 6: (0,5)) by perturbing its sums
    s_pq = np.asarray(edges.s_pq).copy()
    s_pq[6] += 50.0
    bad = edges._replace(s_pq=jnp.asarray(s_pq))
    pruned = fastba.prune_outlier_edges(poses, bad)
    v = np.asarray(pruned.valid)
    assert not v[6]          # corrupted loop edge pruned
    assert v[:6].all()       # odometry edges always kept


def test_prune_masked_median_under_padding():
    """Masked median must ignore padded/invalid rows: with >50% of the
    bucket invalid, a genuine outlier edge is still pruned
    (ref: outlier pruning MultiViewGeometry.cpp:1165-1205)."""
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.0)
    # embed into a 64-slot bucket: 7 valid edges => ~89% rows invalid
    cap = 64
    big = fastba.make_edges(cap)
    big = fastba.EdgeSums(*[a.at[:16].set(b) for a, b in zip(big, edges)])
    s_pq = np.asarray(big.s_pq).copy()
    s_pq[6] += 50.0            # corrupt the loop edge (0,5)
    big = big._replace(s_pq=jnp.asarray(s_pq))
    pruned = fastba.prune_outlier_edges(poses, big)
    v = np.asarray(pruned.valid)
    assert not v[6], "outlier not pruned under a >50%-padded bucket"
    assert v[:6].all()         # odometry edges kept
    assert not v[7:].any()     # padding stays invalid


def test_prune_median_all_invalid_noop():
    poses, edges, active, gt, n_total = _make_pose_graph(noise=0.0)
    none = edges._replace(valid=jnp.zeros_like(edges.valid))
    pruned = fastba.prune_outlier_edges(poses, none)
    assert not np.asarray(pruned.valid).any()


def test_reweight_edges_downweights_outliers():
    """finalBA Huber re-weighting (ref: GCSLAM.h:32-39 initGraphHuberNorm):
    matches that are inconsistent at the CURRENT poses get Huber-
    down-weighted; clean matches keep weight 1."""
    rng = np.random.default_rng(5)
    n_kf, p = 2, 64
    pts_w = rng.uniform(-1, 1, (p, 3)).astype(np.float32)
    pts_w[:, 2] += 3.0
    xi = jnp.asarray(np.asarray([0.1, 0.0, 0.05, 0.0, 0.1, 0.0], np.float32))
    t1 = np.asarray(se3.se3_exp(xi))          # pose of kf 1
    kp_pts = np.zeros((4, p, 3), np.float32)
    kp_pts[0] = pts_w                          # kf0 at identity
    inv1 = np.linalg.inv(t1)
    kp_pts[1] = pts_w @ inv1[:3, :3].T + inv1[:3, 3]
    # corrupt 8 of kf1's points: gross outliers at the true pose
    kp_pts[1, :8] += 0.5

    edges = fastba.make_edges(16)
    edges = edges._replace(
        kf_i=edges.kf_i.at[0].set(0), kf_j=edges.kf_j.at[0].set(1),
        valid=edges.valid.at[0].set(True))
    midx = jnp.zeros((16, p), jnp.int32).at[0].set(jnp.arange(p))
    minl = jnp.zeros((16, p), jnp.float32).at[0].set(1.0)
    has = jnp.zeros(16, bool).at[0].set(True)
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), t1]
                                 + [np.eye(4, dtype=np.float32)] * 2))
    delta = 0.008
    new = fastba.reweight_edges(poses, edges, jnp.asarray(kp_pts),
                                midx, minl, has, jnp.float32(delta))
    s_w = float(new.s_w[0])
    # clean matches contribute 1 each; the 8 outliers contribute
    # delta/||r|| ≈ 0.008/0.85 each — far below 1
    assert s_w < p - 7, s_w
    assert s_w > p - 9, s_w
    # edges without stored matches keep their sums
    assert float(new.s_w[1]) == float(edges.s_w[1])
