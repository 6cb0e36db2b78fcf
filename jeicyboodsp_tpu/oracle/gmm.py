"""Oracle for the GMM trainer / classifier.

References: ``GMMAlgorithm_Train_Auto_ver2.cpp`` (K-means + EM + PCA) and
``GMMAlgorithm_Test_Auto_ver2.cpp`` (PCA-projected diagonal scorer).

Training semantics reproduced (per class over a list of feature files):
- First file: means seeded from every 4th frame (``:121-126``), K-means to
  cost convergence (|dcost| < 1), then per-cluster covariance; alpha = 1/4.
- K-means quirk (``:342-438``): the Selection matrix is NEVER cleared, so
  assignments accumulate across iterations; cost, mean updates and the final
  covariances all run over the accumulated multi-labels.  Ties in the
  distance argmin go to the LAST index (scan with >=).
- EM, exactly 3 iterations per file (``:333``): E-step responsibilities via
  ``probability`` -- a per-call eigendecomposition of each mixture covariance
  keeping the top-8 eigenpairs, Gaussian product in that basis (``:189-253``;
  loop-invariant per iteration, we hoist it without changing values).
  M-step quirk: alpha and mean accumulate ONTO their previous values without
  zeroing (``:291,300``); nOfKey is the stale-included alpha sum.
- Subsequent files of the same class rerun EM from the current parameters
  (K-means only once).
- PCA export (``:456-519``): per mixture top-8 eigenpairs; projected mean in
  mean[0:8] (rest zeroed); covariance rows 0..7 zeroed with eigenvalue
  diagonal, rows 8..11 left STALE; eigenvectors stored (12, 8).

Classifier semantics (``GMMAlgorithm_Test_Auto_ver2.cpp:151-236``): projects
the raw feature onto the stored (12, PCA_LEN=4) eigenvectors and scores a
diagonal Gaussian product over the first 4 dims; per-file score is the
length-NORMALIZED total log likelihood (``:161``).

Eigensolver note: the reference uses Eigen's general ``EigenSolver``; on the
symmetric covariances this equals a symmetric eigendecomposition up to
eigenvector sign, and every downstream quantity is sign-invariant (the
projected mean and projected input flip together).  We use ``np.linalg.eigh``
with a descending sort (first index wins ties).
"""

from __future__ import annotations

import numpy as np

from jeicyboodsp_tpu.utils.cnum import REF_PI

FEATURE_LEN = 12
NUM_OF_MIXTURE = 4
PCA_LEN_TRAIN = 8
PCA_LEN_TEST = 4
THRESHOLD_OF_DISTANCE = 1.0
EM_ITERATIONS = 3


class GMMParams:
    """Mirror of the C GMMParameter struct (train layout, PCA_LEN=8)."""

    def __init__(self):
        self.alpha = np.zeros(NUM_OF_MIXTURE)
        self.mean = np.zeros((NUM_OF_MIXTURE, FEATURE_LEN))
        self.cov = np.zeros((NUM_OF_MIXTURE, FEATURE_LEN, FEATURE_LEN))
        self.eigvec = np.zeros((NUM_OF_MIXTURE, FEATURE_LEN, PCA_LEN_TRAIN))


def _top_eigpairs(cov: np.ndarray, k: int):
    """Descending eigenvalues, first-index tie semantics; sign-invariant.

    Non-finite covariances (empty k-means cluster -> 0/0) propagate NaN,
    exactly as Eigen's unchecked EigenSolver does in the reference binary,
    instead of raising LAPACK's non-convergence error.
    """
    if not np.all(np.isfinite(cov)):
        return np.full(k, np.nan), np.full((cov.shape[0], k), np.nan)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals, kind="stable")
    return vals[order[:k]], vecs[:, order[:k]]


def _probability_train(x: np.ndarray, mean: np.ndarray, cov: np.ndarray) -> float:
    """probability() (train, :189-253): top-8 PCA-projected diagonal product."""
    vals, vecs = _top_eigpairs(cov, PCA_LEN_TRAIN)
    xp = x @ vecs
    mp = mean @ vecs
    with np.errstate(invalid="ignore", divide="ignore"):
        terms = (1.0 / np.sqrt(2.0 * REF_PI)) * (1.0 / np.sqrt(vals)) * np.exp(
            -0.5 * (xp - mp) ** 2 / vals
        )
    return float(np.prod(terms))


def kmeans(frames: np.ndarray, means: np.ndarray):
    """KmeansAlogorithm (:342-438) with the accumulating Selection quirk.

    Returns (means, covariances).
    """
    n = len(frames)
    sel = np.zeros((n, NUM_OF_MIXTURE), dtype=bool)
    means = means.copy()
    cost_before = 0.0
    count = 0
    while True:
        count += 1
        d = ((frames[:, None, :] - means[None, :, :]) ** 2).sum(axis=2)  # (n, 4)
        # scan j=0..3 with >=: last index among minima wins
        arg = (NUM_OF_MIXTURE - 1) - np.argmin(d[:, ::-1], axis=1)
        sel[np.arange(n), arg] = True  # accumulates, never cleared
        cost = float((d * sel).sum())
        if count == 1 or abs(cost - cost_before) >= THRESHOLD_OF_DISTANCE:
            cost_before = cost
        else:
            covs = np.zeros((NUM_OF_MIXTURE, FEATURE_LEN, FEATURE_LEN))
            for j in range(NUM_OF_MIXTURE):
                idx = sel[:, j]
                cnt = int(idx.sum())
                diff = frames[idx] - means[j]
                with np.errstate(invalid="ignore", divide="ignore"):
                    covs[j] = (diff.T @ diff) / cnt
            return means, covs
        # mean update over accumulated labels
        for j in range(NUM_OF_MIXTURE):
            cnt = int(sel[:, j].sum())
            if cnt == 0:
                means[j] = 0.0  # C zeroes, then skips the divide
                continue
            means[j] = frames[sel[:, j]].sum(axis=0) / cnt


def em_step(frames: np.ndarray, p: GMMParams):
    """One EM iteration (:263-337) with the non-reset accumulator quirks."""
    n = len(frames)
    # E-step (eigendecomposition hoisted per mixture -- loop-invariant)
    probs = np.zeros((n, NUM_OF_MIXTURE))
    for k in range(NUM_OF_MIXTURE):
        vals, vecs = _top_eigpairs(p.cov[k], PCA_LEN_TRAIN)
        xp = frames @ vecs
        mp = p.mean[k] @ vecs
        with np.errstate(invalid="ignore", divide="ignore"):
            terms = (1.0 / np.sqrt(2.0 * REF_PI)) * (1.0 / np.sqrt(vals)) * np.exp(
                -0.5 * (xp - mp) ** 2 / vals
            )
        probs[:, k] = np.prod(terms, axis=1)
    w = probs * p.alpha[None, :]
    # 0/0 -> NaN is the reference behavior when every mixture underflows
    # (GMMAlgorithm_Train_Auto_ver2.cpp:270-284 divides by the raw sum with
    # no guard); NaN rows then poison the accumulators exactly as the C
    # code's do -- deliberate compat, not a bug.
    with np.errstate(invalid="ignore"):
        w = w / w.sum(axis=1, keepdims=True)

    # M-step: alpha/mean accumulate onto stale values (quirk :291,300)
    n_of_key = p.alpha + w.sum(axis=0)
    p.alpha = n_of_key / n
    p.mean = (p.mean + w.T @ frames) / n_of_key[:, None]
    for k in range(NUM_OF_MIXTURE):
        diff = frames - p.mean[k]
        p.cov[k] = (diff * w[:, k : k + 1]).T @ diff / n_of_key[k]


def train_class(files: list[np.ndarray]) -> GMMParams:
    """Full per-class training over a list of (n_i, 12) feature arrays."""
    p = GMMParams()
    first = files[0]
    for j in range(NUM_OF_MIXTURE):
        p.mean[j] = first[j * 4]
    p.mean, p.cov = kmeans(first, p.mean)
    p.alpha[:] = 1.0 / NUM_OF_MIXTURE
    for frames in files:
        for _ in range(EM_ITERATIONS):
            em_step(frames, p)
    pca_export(p)
    return p


def pca_export(p: GMMParams):
    """PCADiagonalizeCovarianceMatrix (:456-519): in-place, stale rows kept."""
    for k in range(NUM_OF_MIXTURE):
        vals, vecs = _top_eigpairs(p.cov[k], PCA_LEN_TRAIN)
        proj_mean = p.mean[k] @ vecs
        p.mean[k] = 0.0
        p.mean[k][:PCA_LEN_TRAIN] = proj_mean
        for i in range(PCA_LEN_TRAIN):
            p.cov[k][i] = 0.0
            p.cov[k][i][i] = vals[i]
        # rows PCA_LEN_TRAIN..11 remain stale (reference quirk)
        p.eigvec[k] = vecs


def score_file(frames: np.ndarray, alpha, mean, cov_diag4, eigvec4) -> float:
    """Recognition + probability (test program, PCA_LEN=4).

    mean: (4, >=4) projected means; cov_diag4: (4, 4) diagonal entries;
    eigvec4: (4, 12, 4) eigenvectors.  Returns length-normalized log lik.
    """
    total = 0.0
    for x in frames:
        s = 0.0
        for k in range(NUM_OF_MIXTURE):
            xp = x @ eigvec4[k]
            # "over" too: exp overflows to inf on near-singular diagonals,
            # matching GMMAlgorithm_Test_Auto_ver2.cpp:216-235 (no guard)
            with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
                terms = (
                    (1.0 / np.sqrt(2.0 * REF_PI))
                    * (1.0 / np.sqrt(cov_diag4[k]))
                    * np.exp(-0.5 * (xp - mean[k][:PCA_LEN_TEST]) ** 2 / cov_diag4[k])
                )
            s += alpha[k] * float(np.prod(terms))
        # log(0) -> -inf with no guard, as the reference's log call
        # (GMMAlgorithm_Test_Auto_ver2.cpp:233) -- deliberate compat
        with np.errstate(divide="ignore"):
            total += np.log(s)
    return total / len(frames)
