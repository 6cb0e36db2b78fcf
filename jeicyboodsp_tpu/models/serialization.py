"""Model serialization: reference-compatible struct layouts + clean pytrees.

The reference persists trained GMMs by ``fwrite`` of raw C structs
(``GMMAlgorithm_Train_Auto_ver2.cpp:160``) and reads them back with
DIFFERENT layouts:

- trainer writes ``GMMParameter`` with ``PCA_LEN 8``  -> 8096 bytes/class;
- classifier reads ``GMMParameter`` with ``PCA_LEN 4`` -> 6560 bytes/class
  (``GMMAlgorithm_Test_Auto_ver2.cpp:22``), so class i is read from byte
  offset i*6560 of a file whose records are 8096 bytes -- every class after
  the first is misaligned garbage;
- Viterbi reads ``HMMParameter`` = 6 x PCA4-GMM + 6x6 transitions
  (``Viterbi_version1.cpp:37-40``).

This module implements all three layouts byte-exactly, the misaligned-read
emulation (``read_as_test_layout`` on a train-layout file reproduces the
reference system's behavior), and a sane npz-based pytree checkpoint for the
framework's own state (streaming carries, noise estimates, model params).
"""

from __future__ import annotations

import io

import numpy as np

FEATURE_LEN = 12
NUM_OF_MIXTURE = 4
NUM_OF_STATE = 6

TRAIN_PCA = 8
TEST_PCA = 4

TRAIN_STRUCT_BYTES = 8 * (4 + 4 * 12 + 4 * 12 * 12 + 4 * 12 * TRAIN_PCA)  # 8096
TEST_STRUCT_BYTES = 8 * (4 + 4 * 12 + 4 * 12 * 12 + 4 * 12 * TEST_PCA)  # 6560
HMM_STRUCT_BYTES = NUM_OF_STATE * TEST_STRUCT_BYTES + 8 * NUM_OF_STATE * NUM_OF_STATE


def pack_gmm(alpha, mean, cov, eigvec) -> bytes:
    """Serialize one GMMParameter struct; eigvec's last dim (8 or 4) sets
    the layout."""
    buf = io.BytesIO()
    buf.write(np.asarray(alpha, "<f8").tobytes())
    buf.write(np.asarray(mean, "<f8").tobytes())
    buf.write(np.asarray(cov, "<f8").tobytes())
    buf.write(np.asarray(eigvec, "<f8").tobytes())
    return buf.getvalue()


def unpack_gmm(data: bytes, pca_len: int):
    """Deserialize one GMMParameter struct of the given PCA layout."""
    a = np.frombuffer(data, "<f8")
    o = 0
    alpha = a[o : o + 4].copy()
    o += 4
    mean = a[o : o + 48].reshape(4, 12).copy()
    o += 48
    cov = a[o : o + 576].reshape(4, 12, 12).copy()
    o += 576
    ev = a[o : o + 4 * 12 * pca_len].reshape(4, 12, pca_len).copy()
    return alpha, mean, cov, ev


def write_train_model(path: str, classes: list) -> None:
    """classes: list of (alpha, mean, cov, eigvec8) tuples (trainer output)."""
    with open(path, "wb") as f:
        for alpha, mean, cov, ev in classes:
            assert ev.shape[-1] == TRAIN_PCA
            f.write(pack_gmm(alpha, mean, cov, ev))


def read_as_test_layout(path: str, num_classes: int):
    """Read a model file exactly as the PCA4 classifier does: fixed 6560-byte
    strides, regardless of how the file was written.  Reproduces the
    reference's train->test struct-layout mismatch when applied to a
    train-layout file."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    for i in range(num_classes):
        chunk = data[i * TEST_STRUCT_BYTES : (i + 1) * TEST_STRUCT_BYTES]
        chunk = chunk.ljust(TEST_STRUCT_BYTES, b"\0")  # fread past EOF -> junk/zeros
        out.append(unpack_gmm(chunk, TEST_PCA))
    return out


def read_train_layout(path: str, num_classes: int):
    with open(path, "rb") as f:
        data = f.read()
    return [
        unpack_gmm(data[i * TRAIN_STRUCT_BYTES : (i + 1) * TRAIN_STRUCT_BYTES], TRAIN_PCA)
        for i in range(num_classes)
    ]


def train_to_test_params(alpha, mean, cov, eigvec8):
    """The ALIGNED conversion the reference *intended*: keep the top-4
    PCA dims of the trainer's top-8 export."""
    return alpha, mean, cov, eigvec8[:, :, :TEST_PCA]


def pack_hmm(states, trans) -> bytes:
    """states: 6 x (alpha, mean, cov, eigvec4); trans: (6,6)."""
    buf = io.BytesIO()
    for alpha, mean, cov, ev in states:
        assert ev.shape[-1] == TEST_PCA
        buf.write(pack_gmm(alpha, mean, cov, ev))
    buf.write(np.asarray(trans, "<f8").tobytes())
    return buf.getvalue()


def unpack_hmm(data: bytes):
    states = []
    for i in range(NUM_OF_STATE):
        states.append(unpack_gmm(data[i * TEST_STRUCT_BYTES : (i + 1) * TEST_STRUCT_BYTES], TEST_PCA))
    trans = np.frombuffer(data[NUM_OF_STATE * TEST_STRUCT_BYTES :][: 8 * 36], "<f8").reshape(6, 6).copy()
    return states, trans


# ---------------------------------------------------------------------------
# clean pytree checkpointing (framework-native state: carries, params)
# ---------------------------------------------------------------------------


def save_pytree(path: str, tree) -> None:
    """Flatten a pytree of arrays into an npz checkpoint."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(repr(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str, like):
    """Restore into the structure of `like` (shapes/dtypes from the file)."""
    import jax

    data = np.load(path)
    leaves = [data[f"leaf_{i}"] for i in range(len([k for k in data.files if k.startswith("leaf_")]))]
    _, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
