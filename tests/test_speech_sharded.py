"""Sharded end-to-end speech pipeline == single-device (8-virtual-device
CPU mesh): expert x data train, data-parallel classify, data-parallel
Viterbi decode (VERDICT r2 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.models import hmm as mhmm
from jeicyboodsp_tpu.parallel import make_mesh
from jeicyboodsp_tpu.parallel import speech_sharded as SS
from jeicyboodsp_tpu.pipelines.speech import speech_classify, speech_train


def _class_audio(rng, C=4, T=32):
    """Per-class audio with distinct spectral character AND within-class
    block-to-block variation (4 sub-tones cycling per block) so every
    k-means cluster stays populated (>12 frames) and EM is stable."""
    out = np.zeros((C, T, 1024), np.int16)
    tb = np.arange(1024) / 16000
    for c in range(C):
        f0 = 300 + 400 * c
        for b in range(T):
            sub = 1.0 + 0.12 * (b % 4)
            amp = 5000 + 900 * ((b // 4) % 3)
            sig = amp * np.sin(2 * np.pi * f0 * sub * tb)
            sig += 2500 * np.sin(2 * np.pi * 2.3 * f0 * sub * tb)
            sig += rng.normal(0, 200, 1024)
            out[c, b] = np.clip(sig, -32768, 32767).astype(np.int16)
    return jnp.asarray(out)


def test_speech_train_sharded_matches_single():
    rng = np.random.default_rng(7)
    blocks = _class_audio(rng)
    mesh = make_mesh((2, 4), ("expert", "data"))

    want = speech_train(blocks, dtype=jnp.float64)
    got = SS.speech_train_sharded(blocks, mesh, dtype=jnp.float64)
    for w, g, name in zip(want, got, ("alpha", "mean", "cov", "eigvec")):
        w, g = np.asarray(w), np.asarray(g)
        if name == "eigvec":
            # eigenvectors have per-column sign freedom; compare |dot| == 1
            dots = np.abs(np.einsum("ckij,ckij->ckj", w, g) /
                          (np.linalg.norm(w, axis=-2) * np.linalg.norm(g, axis=-2) + 1e-300))
            np.testing.assert_allclose(dots, 1.0, atol=1e-8, err_msg=name)
        else:
            np.testing.assert_allclose(w, g, rtol=1e-9, atol=1e-11, err_msg=name)


def test_speech_classify_sharded_matches_single():
    rng = np.random.default_rng(8)
    blocks = _class_audio(rng)
    mesh = make_mesh((2, 4), ("expert", "data"))
    alphas, means, covs, eig8 = speech_train(blocks, dtype=jnp.float64)
    eig4 = eig8[:, :, :, :4]

    # 8 utterances = the 4 class signals x 2 noise draws
    utts = jnp.concatenate([blocks, _class_audio(rng)], axis=0)
    got = SS.speech_classify_sharded(utts, alphas, means, covs, eig4, mesh,
                                     dtype=jnp.float64)
    for u in range(utts.shape[0]):
        want_u = speech_classify(utts[u], alphas, means, covs, eig4, dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(got)[u], np.asarray(want_u),
                                   rtol=1e-10, atol=1e-12)
    # and the decisions recover the generating class
    pred = np.argmax(np.asarray(got), axis=1)
    np.testing.assert_array_equal(pred, [0, 1, 2, 3, 0, 1, 2, 3])


def test_speech_decode_sharded_matches_batched():
    rng = np.random.default_rng(9)
    # 6-state HMM with separable emissions
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

    utts = _class_audio(rng, C=8, T=4)
    mesh = make_mesh((2, 4), ("expert", "data"))
    paths, scores = SS.speech_decode_sharded(
        utts, alpha6, mean6, cov6, ev6, transj, mesh, dtype=jnp.float64
    )

    # single-device reference: mfcc + batched viterbi
    from jeicyboodsp_tpu.ops.features import dct_lifter_matrix, mel_matrix, mfcc_blocks

    mel_m = jnp.asarray(mel_matrix(np.float64))
    dct_m = jnp.asarray(dct_lifter_matrix(np.float64))
    feats = mfcc_blocks(utts, mel_m, dct_m, dtype=jnp.float64)
    lengths = jnp.full((feats.shape[0],), feats.shape[1], jnp.int32)
    wp, ws = mhmm.viterbi_batched(feats, lengths, alpha6, mean6, cov6, ev6,
                                  transj, compat=False)
    np.testing.assert_array_equal(np.asarray(paths), np.asarray(wp))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ws), rtol=1e-10)
