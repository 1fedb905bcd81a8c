"""Place recognition + loop closing tests."""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.loop import keyframe_db, loop_closing, vocabulary
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie

CAM = cam_ops.Intrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def perturb_desc(rng, desc, n_bits):
    """Flip n_bits random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        words = rng.integers(0, 8, n_bits)
        bits = rng.integers(0, 32, n_bits)
        for w, b in zip(words, bits):
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def test_vocabulary_quantization_stability():
    rng = np.random.default_rng(0)
    train_desc = rand_desc(rng, 3000)
    vocab = vocabulary.train(train_desc, branching=5, depth=2, seed=1)
    assert vocab.n_words == 25

    base = rand_desc(rng, 100)
    w0 = vocabulary.quantize(vocab, jnp.asarray(base), jnp.ones(100, bool))
    # small perturbations (8/256 bits) should mostly keep the same word
    pert = perturb_desc(rng, base, 8)
    w1 = vocabulary.quantize(vocab, jnp.asarray(pert), jnp.ones(100, bool))
    same = (np.asarray(w0) == np.asarray(w1)).mean()
    assert same > 0.6
    # invalid slots get −1
    w2 = vocabulary.quantize(vocab, jnp.asarray(base), jnp.zeros(100, bool))
    assert (np.asarray(w2) == -1).all()


def test_bow_scoring_discriminates():
    rng = np.random.default_rng(1)
    vocab = vocabulary.train(rand_desc(rng, 4000), branching=6, depth=3)
    W = vocab.n_words  # 216 — enough words to discriminate random sets
    a = rand_desc(rng, 200)
    a_noisy = perturb_desc(rng, a, 6)
    b = rand_desc(rng, 200)

    va = vocabulary.bow_vector(
        vocabulary.quantize(vocab, jnp.asarray(a), jnp.ones(200, bool)), W
    )
    van = vocabulary.bow_vector(
        vocabulary.quantize(vocab, jnp.asarray(a_noisy), jnp.ones(200, bool)), W
    )
    vb = vocabulary.bow_vector(
        vocabulary.quantize(vocab, jnp.asarray(b), jnp.ones(200, bool)), W
    )
    s_same = float(vocabulary.l1_score(va, van))
    s_diff = float(vocabulary.l1_score(va, vb))
    assert s_same > s_diff + 0.05


def test_keyframe_db_retrieval():
    rng = np.random.default_rng(2)
    vocab = vocabulary.train(rand_desc(rng, 2000), branching=5, depth=2)
    K = 10
    db = keyframe_db.empty(K, vocab.n_words)
    descs = [rand_desc(rng, 150) for _ in range(K)]
    for k in range(K):
        v = vocabulary.bow_vector(
            vocabulary.quantize(vocab, jnp.asarray(descs[k]),
                                jnp.ones(150, bool)), vocab.n_words
        )
        db = db.add(k, v)

    # query resembling KF 2 (revisit), connected set = {6, 7, 8, 9} (recent)
    q_desc = perturb_desc(rng, descs[2], 5)
    q = vocabulary.bow_vector(
        vocabulary.quantize(vocab, jnp.asarray(q_desc), jnp.ones(150, bool)),
        vocab.n_words,
    )
    connected = jnp.zeros(K, bool).at[jnp.asarray([6, 7, 8, 9])].set(True)
    covw = jnp.zeros((K, K), jnp.int32)
    keep, scores = keyframe_db.detect_loop_candidates(db, q, connected, covw)
    kept = np.nonzero(np.asarray(keep))[0]
    assert 2 in kept
    assert np.asarray(scores)[2] == np.asarray(scores)[kept].max()


def test_consistency_state():
    cs = loop_closing.ConsistencyState(min_consistency=3)
    assert cs.update([{1, 2}]) == []
    assert cs.update([{2, 3}]) == []
    assert cs.update([{3, 4}]) == []
    got = cs.update([{4, 5}])  # 4th consecutive overlap -> consistent
    assert got == [4, 5]
    # a gap resets
    cs2 = loop_closing.ConsistencyState(min_consistency=3)
    cs2.update([{1}])
    cs2.update([set()])
    assert cs2.update([{1}]) == []


def _loop_map():
    """Small map: 6 KFs along x, drifted copy of KF0 at KF5, shared points."""
    rng = np.random.default_rng(3)
    P = 60
    pts = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(6, 10, P)],
        -1,
    ).astype(np.float32)
    st = ms.empty(max_kf=8, max_feat=64, max_pts=128, max_obj=4)
    kf_poses = []
    for k in range(6):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.5 * k
        kf_poses.append(T)
    # KF5 "returns" to KF0's viewpoint but with drift
    kf_poses[5] = np.asarray(
        lie.exp_se3(jnp.asarray([0.3, 0.1, -0.1, 0.02, 0.03, -0.01]))
    ) @ kf_poses[0]
    st = st._replace(
        kf_pose=jnp.asarray(np.stack(kf_poses + [np.eye(4)] * 2)),
        kf_valid=jnp.asarray([True] * 6 + [False] * 2),
        pt_pos=jnp.asarray(np.concatenate([pts, np.zeros((68, 3))]).astype(np.float32)),
        pt_valid=jnp.asarray([True] * P + [False] * 68),
        pt_ref_kf=jnp.asarray([0] * P + [-1] * 68, jnp.int32),
    )
    # features: all KFs observe all P points (uv = projection), same desc
    desc = jnp.asarray(rand_desc(rng, 64))
    kf_xy = []
    kf_pt = []
    for k in range(8):
        pc = lie.transform_points(st.kf_pose[k], st.pt_pos[:64])
        kf_xy.append(np.asarray(cam_ops.project(CAM, pc)))
        kf_pt.append(np.concatenate([np.arange(P), -np.ones(4)]).astype(np.int32))
    st = st._replace(
        kf_xy=jnp.asarray(np.stack(kf_xy)),
        kf_desc=jnp.broadcast_to(desc, (8, 64, 8)),
        kf_feat_valid=jnp.broadcast_to(jnp.asarray([True] * P + [False] * 4),
                                       (8, 64)),
        kf_feat_pt=jnp.asarray(np.stack(kf_pt)),
        # point descriptors mirror the observations (production maintains
        # these at spawn/update; compute_loop_sim3's group-projection gate
        # matches query features against them)
        pt_desc=st.pt_desc.at[:P].set(desc[:P]),
    )
    return st, pts


def test_compute_loop_sim3_and_correct():
    st, pts = _loop_map()
    res = loop_closing.compute_loop_sim3(st, CAM, 5, 0, jax.random.PRNGKey(0))
    assert bool(res.ok)
    # expected: T_qc maps KF0-cam coords into KF5-cam coords =
    # T5_cw @ inv(T0_cw)
    expect = st.kf_pose[5] @ lie.inv_se3(st.kf_pose[0])
    err = np.asarray(lie.log_se3(res.t_21 @ lie.inv_se3(expect)))
    assert np.linalg.norm(err) < 0.05

    # correction: use the TRUE relative (KF5 should coincide with KF0 drift-
    # free); after correction KF5's pose ≈ KF0's pose
    t_qc_true = jnp.eye(4)  # same viewpoint -> identity relative
    st2 = loop_closing.correct_loop(st, CAM, 5, 0, t_qc_true)
    e = np.asarray(lie.log_se3(st2.kf_pose[5] @ lie.inv_se3(st.kf_pose[0])))
    assert np.linalg.norm(e) < 0.15
    # points still project consistently in corrected KF5
    pc = lie.transform_points(st2.kf_pose[5], st2.pt_pos[:60])
    uv = np.asarray(cam_ops.project(CAM, pc))
    uv_kf0 = np.asarray(st.kf_xy[0][:60])
    assert np.abs(uv - uv_kf0).mean() < 30.0


def test_fuse_duplicate_objects():
    st = ms.empty(max_kf=4, max_feat=8, max_pts=16, max_obj=4)
    poses = np.stack([np.eye(4)] * 4).astype(np.float32)
    poses[0, :3, 3] = [0, 0, 5]
    poses[1, :3, 3] = [0.3, 0, 5]   # duplicate of 0
    poses[2, :3, 3] = [8, 0, 5]
    st = st._replace(
        obj_pose=jnp.asarray(poses),
        obj_valid=jnp.asarray([True, True, True, False]),
        oobs_obj=jnp.asarray([0, 1, 2, -1], jnp.int32),
        oobs_valid=jnp.asarray([True, True, True, False]),
        pt_object=jnp.asarray([1] * 4 + [-1] * 12, jnp.int32),
    )
    st2 = loop_closing.fuse_duplicate_objects(st)
    assert bool(st2.obj_valid[0])
    assert not bool(st2.obj_valid[1])   # merged into 0
    assert bool(st2.obj_valid[2])
    assert int(st2.oobs_obj[1]) == 0    # observation repointed
    assert (np.asarray(st2.pt_object[:4]) == 0).all()


def test_refine_sim3_gn_rejects_outliers():
    """OptimizeSim3 role: GN refinement on noisy pairs with gross outliers
    converges to the true Sim(3) and gates the outliers out."""
    from dsp_slam_rgbd_tpu.solvers import sim3 as sim3_mod

    rng = np.random.default_rng(7)
    N = 40
    p1 = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                   rng.uniform(5, 9, N)], -1).astype(np.float32)
    T_true = np.asarray(lie.exp_se3(
        jnp.asarray([0.4, -0.2, 0.1, 0.03, -0.05, 0.02])))
    p2 = p1 @ T_true[:3, :3].T + T_true[:3, 3]
    uv1 = np.array(cam_ops.project(CAM, jnp.asarray(p1)))
    uv2 = np.array(cam_ops.project(CAM, jnp.asarray(p2)))
    uv1 += rng.normal(0, 0.3, uv1.shape)  # moderate pixel noise
    uv2 += rng.normal(0, 0.3, uv2.shape)
    # 8 gross outliers: wrong pixel observations
    uv2[:8] += rng.uniform(40, 80, (8, 2))

    # init: perturbed truth (what a borderline RANSAC would hand over)
    T0 = np.asarray(lie.exp_se3(
        jnp.asarray([0.06, -0.04, 0.05, 0.01, 0.008, -0.012]))) @ T_true
    T_ref, inl, n_in = sim3_mod.refine_sim3_gn(
        CAM, CAM, jnp.asarray(T0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
        jnp.ones(N, bool), fix_scale=True)
    err0 = np.linalg.norm(np.asarray(lie.log_se3(
        jnp.asarray(T0) @ lie.inv_se3(jnp.asarray(T_true)))))
    err1 = np.linalg.norm(np.asarray(lie.log_se3(
        T_ref @ lie.inv_se3(jnp.asarray(T_true)))))
    assert err1 < 0.25 * err0      # refinement tightened the estimate
    assert err1 < 0.01
    inl = np.asarray(inl)
    assert not inl[:8].any()       # outliers gated
    assert inl[8:].mean() > 0.9
    assert int(n_in) >= 28


def test_guided_rematch_adds_matches():
    """SearchBySim3 role: descriptors too far for the TH_LOW first-pass
    match are recovered by Sim3-guided projection matching at TH_HIGH."""
    st, _ = _loop_map()
    rng = np.random.default_rng(11)
    # KF5 descriptors drift ~70 unique bits: beyond TH_LOW=50, within TH_HIGH=100
    d5 = perturb_desc(rng, np.asarray(st.kf_desc[5]), 85)
    st = st._replace(kf_desc=st.kf_desc.at[5].set(jnp.asarray(d5)))

    from dsp_slam_rgbd_tpu.frontend import matcher
    m_plain = matcher.match(
        st.kf_desc[5], st.kf_feat_valid[5], st.kf_desc[0],
        st.kf_feat_valid[0], max_dist=matcher.TH_LOW, mutual=True)
    t_qc_true = st.kf_pose[5] @ lie.inv_se3(st.kf_pose[0])
    m_guided = loop_closing.guided_rematch(st, CAM, 5, 0, t_qc_true)
    assert int(jnp.sum(m_plain.valid)) < 10
    assert int(jnp.sum(m_guided.valid)) > 40
    # guided matches are the correct feature pairs (identity alignment)
    idx = np.asarray(m_guided.idx)
    ok = np.asarray(m_guided.valid)
    assert (idx[ok] == np.nonzero(ok)[0]).mean() > 0.95


def test_loop_rejected_below_min_inliers():
    """A loop whose refined inlier count is under min_accept is rejected
    (reference LoopClosing.cc:241-330 nInliers >= 20 gate)."""
    st, _ = _loop_map()
    # keep only 12 live points: RANSAC can fit but acceptance needs >= 20
    keep = np.zeros(128, bool)
    keep[:12] = True
    st = st._replace(pt_valid=jnp.asarray(keep))
    res = loop_closing.compute_loop_sim3(st, CAM, 5, 0,
                                         jax.random.PRNGKey(0))
    assert not bool(res.ok)
    assert int(res.n_inliers) < 20
