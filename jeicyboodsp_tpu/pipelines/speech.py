"""End-to-end speech pipeline as single jitted graphs (SURVEY §3.4).

The reference chains three PROCESSES through binary feature files on disk
(MFCC -> GMM train -> GMM/HMM decode).  Here the file boundary disappears:
raw audio goes in, trained models / class decisions / state paths come out,
in one XLA graph each:

- :func:`speech_train`: (C, T, 1024) int16 audio per class -> PCA-exported
  GMM parameters for every class (batched MFCC -> batched k-means+EM+PCA).
- :func:`speech_classify`: (T, 1024) int16 utterance + stacked class params
  -> per-class log-likelihood scores (argmax = decision).
- :func:`speech_decode`: utterance + HMM params -> Viterbi state path.

All stages reuse the validated ops/models; this module is wiring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jeicyboodsp_tpu.models.gmm import score_frames_all_classes, train_classes_batched
from jeicyboodsp_tpu.models.hmm import viterbi
from jeicyboodsp_tpu.ops.features import dct_lifter_matrix, mel_matrix, mfcc_blocks


def _mel_dct(dtype):
    npdtype = np.float32 if dtype == jnp.float32 else np.float64
    return jnp.asarray(mel_matrix(npdtype)), jnp.asarray(dct_lifter_matrix(npdtype))


@functools.partial(jax.jit, static_argnames=("dtype", "fft_engine"))
def speech_train(class_blocks, dtype=jnp.float32, fft_engine: str = "xla"):
    """(C, T, 1024) int16 -> (alpha, mean, cov, eigvec8) per class.

    One device call: batched MFCC over all classes' audio, then vmapped
    k-means + EM + PCA export.  (Real corpora have per-class frame masks;
    pass pre-extracted features to models.gmm for that case.)
    """
    mel_m, dct_m = _mel_dct(dtype)
    feats = mfcc_blocks(class_blocks, mel_m, dct_m, dtype=dtype, fft_engine=fft_engine)  # (C, 2T, 12)
    masks = jnp.ones(feats.shape[:2], bool)
    return train_classes_batched(feats, masks)


@functools.partial(jax.jit, static_argnames=("dtype", "fft_engine"))
def speech_classify(blocks, alphas, means, covs, eigvecs4, dtype=jnp.float32,
                    fft_engine: str = "xla"):
    """(T, 1024) int16 utterance -> (C,) class scores (PCA-4 scorer)."""
    mel_m, dct_m = _mel_dct(dtype)
    feats = mfcc_blocks(blocks[None], mel_m, dct_m, dtype=dtype, fft_engine=fft_engine)[0]
    return score_frames_all_classes(feats, alphas, means, covs, eigvecs4)


@functools.partial(jax.jit, static_argnames=("dtype", "compat"))
def speech_decode(blocks, alpha, mean, cov, eigvec4, trans, dtype=jnp.float32, compat=True):
    """(T, 1024) int16 utterance + 6-state HMM -> (path, score)."""
    mel_m, dct_m = _mel_dct(dtype)
    feats = mfcc_blocks(blocks[None], mel_m, dct_m, dtype=dtype)[0]
    return viterbi(feats, alpha, mean, cov, eigvec4, trans, compat=compat)
