"""Dataset loading with the reference's exact preprocessing.

Reference parity (``utils.py``):

* Half Moons — ``make_moons(n_samples=30000, noise=0.1, random_state=0)``,
  global min-max normalization, 80/20 split, image-like ``(N, 1, 2, 1)`` shape,
  binary one-hot labels (reference ``utils.py:67-92``);
* MNIST / Fashion-MNIST — float32, ``/255``, one-hot(10) labels (reference
  ``utils.py:95-145``);
* CIFAR-10 — local pickle batches, float32 ``/255``, one-hot(10) (reference
  ``utils.py:160-206``). NOTE: for ``channels='first'`` the reference *reshapes*
  an NHWC array to NCHW (``utils.py:193-195``), which scrambles the pixel
  layout; we transpose correctly and document the divergence.
* ``n_inputs`` truncation of train *and* test, then optional seeded permutation
  shuffle (reference ``utils.py:221-233``).

Layout convention: **NHWC internally** (TPU-friendly convolutions); an NCHW
ingestion path is kept via ``channels='first'`` for byte-level parity checks.
Half Moons keeps the reference's ``(N, 1, 2, 1)`` shape, which reads the same in
either convention (reference ``utils.py:79-85`` produces the identical shape for
both ``channels`` values).

Offline fallback: MNIST/Fashion-MNIST/CIFAR need files on disk (keras cache or a
local dir). With no cache and no network, ``fallback='synthetic'`` substitutes a
deterministic, learnable surrogate with identical shapes/ranges so tests and
benchmarks run anywhere; real-data runs should pass ``fallback='error'``.
"""
from __future__ import annotations

import functools
import os
import pickle
import warnings
from typing import Optional, Tuple

import numpy as np

Arrays = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, tuple, int]

_FALLBACK_ENV = "ROBUSTBNNS_DATA_FALLBACK"

# Version of the synthetic-surrogate GENERATOR code. Bump whenever the
# generated distribution changes (v1: disjoint prototypes, hash() seeding;
# v2: crc32 seeding, shared 5-blob pool, noise 0.30). Checkpoints saved in a
# process that served surrogate data carry this tag so a stale checkpoint
# evaluated against a newer surrogate fails loudly instead of scoring ~chance
# (the round-2 cross-process failure mode, reintroduced silently across any
# code-version boundary otherwise).
SURROGATE_VERSION = 2
_surrogate_served: set = set()  # dataset names served synthetically, this process


def surrogate_fingerprint() -> Optional[dict]:
    """Checkpoint-meta tag when this process served synthetic surrogate data."""
    if not _surrogate_served:
        return None
    return {
        "surrogate_version": SURROGATE_VERSION,
        "surrogate_datasets": sorted(_surrogate_served),
    }


def labels_to_onehot(integer_labels: np.ndarray, n_classes: Optional[int] = None):
    """Dense one-hot encoding (reference ``utils.py:147-152``)."""
    n_rows = len(integer_labels)
    n_cols = n_classes if n_classes else int(integer_labels.max()) + 1
    onehot = np.zeros((n_rows, n_cols), dtype="float32")
    onehot[np.arange(n_rows), np.asarray(integer_labels, dtype=np.int64)] = 1.0
    return onehot


def onehot_to_labels(y: np.ndarray) -> np.ndarray:
    """Inverse of :func:`labels_to_onehot` (reference ``utils.py:154-158``)."""
    return np.argmax(y, axis=-1)


# --------------------------------------------------------------------------- #
# Half Moons — fully local, the CPU-runnable parity config
# --------------------------------------------------------------------------- #


def load_half_moons(channels: str = "last", n_samples: int = 30000) -> Arrays:
    """Half Moons with the reference's exact generation and normalization.

    Reference ``utils.py:67-92``: ``make_moons(n, shuffle=True, noise=0.1,
    random_state=0)``, global min-max to [0,1], 80/20 split, ``(N,1,2,1)``
    image-like shape, binary one-hot labels.
    """
    from sklearn.datasets import make_moons

    x, y = make_moons(n_samples=n_samples, shuffle=True, noise=0.1, random_state=0)
    x, y = x.astype("float32"), y.astype("float32")
    x = (x - np.min(x)) / (np.max(x) - np.min(x))

    split = int(0.8 * len(x))
    x_train, y_train = x[:split], y[:split]
    x_test, y_test = x[split:], y[split:]

    # Image-like representation; identical shape for either channels convention
    # (reference utils.py:79-85).
    x_train = x_train.reshape(len(x_train), 1, 2, 1)
    x_test = x_test.reshape(len(x_test), 1, 2, 1)
    input_shape = x_train.shape[1:]

    num_classes = 2
    return (
        x_train,
        labels_to_onehot(y_train.astype(np.int64), num_classes),
        x_test,
        labels_to_onehot(y_test.astype(np.int64), num_classes),
        input_shape,
        num_classes,
    )


# --------------------------------------------------------------------------- #
# MNIST-family: cache-first with deterministic synthetic fallback
# --------------------------------------------------------------------------- #


def _search_npz(names: list[str]) -> Optional[str]:
    roots = [
        os.environ.get("ROBUSTBNNS_DATASET_DIR", ""),
        os.path.expanduser("~/.keras/datasets"),
        "data",
        ".",
    ]
    for root in roots:
        if not root:
            continue
        for name in names:
            path = os.path.join(root, name)
            if os.path.exists(path):
                return path
    return None


def _read_idx(path: str) -> np.ndarray:
    """Read one IDX-format array (the MNIST file format), gzipped or raw.

    The format keras actually distributes Fashion-MNIST in (four
    ``*-ubyte.gz`` files; reference ``utils.py:95-118`` reads them through
    ``fashion_mnist.load_data``): big-endian magic ``\\x00\\x00<dtype><ndim>``
    then ``ndim`` uint32 dims, then the raw array.
    """
    import gzip
    import struct

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        z1, z2, dtype_code, ndim = struct.unpack("BBBB", f.read(4))
        if z1 != 0 or z2 != 0:
            raise ValueError(f"{path}: not an IDX file (bad magic)")
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        dtypes = {
            0x08: np.dtype(np.uint8), 0x09: np.dtype(np.int8),
            0x0B: np.dtype(">i2"), 0x0C: np.dtype(">i4"),
            0x0D: np.dtype(">f4"), 0x0E: np.dtype(">f8"),
        }
        if dtype_code not in dtypes:
            raise ValueError(f"{path}: unknown IDX dtype 0x{dtype_code:02x}")
        data = np.frombuffer(f.read(), dtype=dtypes[dtype_code])
        if data.size != int(np.prod(dims)):
            raise ValueError(f"{path}: truncated IDX payload")
        return data.reshape(dims)


# The canonical IDX quad names (keras/LeCun distribution).
_IDX_FILES = {
    "x_train": "train-images-idx3-ubyte",
    "y_train": "train-labels-idx1-ubyte",
    "x_test": "t10k-images-idx3-ubyte",
    "y_test": "t10k-labels-idx1-ubyte",
}


def _search_idx_quad(subdirs: list[str]) -> Optional[dict]:
    """Find all four IDX files (.gz or raw) under the dataset search roots."""
    roots = [
        os.environ.get("ROBUSTBNNS_DATASET_DIR", ""),
        os.path.expanduser("~/.keras/datasets"),
        "data",
        ".",
    ]
    for root in roots:
        if not root:
            continue
        for sub in subdirs:
            d = os.path.join(root, sub) if sub else root
            found = {}
            for key, stem in _IDX_FILES.items():
                for name in (stem + ".gz", stem):
                    path = os.path.join(d, name)
                    if os.path.exists(path):
                        found[key] = path
                        break
            if len(found) == len(_IDX_FILES):
                return found
    return None


def _load_mnist_like(dataset_name: str, npz_names: list[str], fallback: str):
    path = _search_npz(npz_names)
    if path is not None:
        with np.load(path, allow_pickle=True) as f:
            return (f["x_train"], f["y_train"]), (f["x_test"], f["y_test"])
    # keras ships Fashion-MNIST (and LeCun ships MNIST) as IDX quads, not npz —
    # accept the files exactly as downloaded (e.g. under
    # ~/.keras/datasets/fashion-mnist/ or $ROBUSTBNNS_DATASET_DIR).
    # Dataset-named subdirs first: MNIST and Fashion-MNIST IDX distributions
    # share canonical file names, so a quad sitting flat in a search root is
    # dataset-ambiguous — try it only last, with a warning.
    idx_subdir = {"mnist": "mnist", "fashion_mnist": "fashion-mnist"}[dataset_name]
    quad = _search_idx_quad([idx_subdir, dataset_name])
    if quad is None:
        quad = _search_idx_quad([""])
        if quad is not None:
            warnings.warn(
                f"Serving {dataset_name} from an IDX quad found flat in a "
                f"search root ({os.path.dirname(quad['x_train'])}): MNIST and "
                f"Fashion-MNIST use identical IDX file names, so flat-root "
                f"quads are dataset-ambiguous — place them under a "
                f"'{idx_subdir}/' subdir to disambiguate.",
                stacklevel=2,
            )
    if quad is not None:
        return (
            (_read_idx(quad["x_train"]), _read_idx(quad["y_train"])),
            (_read_idx(quad["x_test"]), _read_idx(quad["y_test"])),
        )
    # The keras loader DOWNLOADS when its cache is empty, which can hang for
    # minutes on an offline box — only attempt it when explicitly allowed.
    if os.environ.get("ROBUSTBNNS_ALLOW_DOWNLOAD") == "1":
        try:
            if dataset_name == "mnist":
                from keras.datasets import mnist as ds
            else:
                from keras.datasets import fashion_mnist as ds
            return ds.load_data()
        except Exception:
            pass
    fallback = os.environ.get(_FALLBACK_ENV, fallback)
    if fallback == "synthetic":
        return _synthetic_image_dataset(dataset_name, 28, 28, 1, 60000, 10000)
    raise FileNotFoundError(
        f"No local copy of {dataset_name} (looked for {npz_names} and the "
        f"IDX quad {sorted(_IDX_FILES.values())} [.gz or raw] under "
        f"$ROBUSTBNNS_DATASET_DIR, ~/.keras/datasets, ./data) and no network. "
        f"Pass fallback='synthetic' or set {_FALLBACK_ENV}=synthetic to use a "
        f"deterministic surrogate."
    )


def _synth_cache_dir() -> str:
    """Cross-process cache dir for generated surrogates ('' disables).

    The generator is pure in its arguments and single-threaded numpy, so the
    first process to need a surrogate writes the exact bytes every other
    process would generate; CLI subprocess tests and sweep drivers then load
    a ~50-150 MB npz (~1-3 s) instead of regenerating 60k images (minutes
    under 1-vCPU contention). Set ``ROBUSTBNNS_SYNTH_CACHE=0`` to disable,
    or to a directory to relocate.
    """
    v = os.environ.get("ROBUSTBNNS_SYNTH_CACHE")
    if v == "0":
        return ""
    if v:
        return v
    return os.path.join(
        os.path.expanduser("~"), ".cache", "robustbnns_tpu", "synthetic"
    )


@functools.lru_cache(maxsize=4)
def _synthetic_image_dataset(name, rows, cols, chans, n_train, n_test):
    """Deterministic learnable surrogate: per-class smooth prototypes + noise.

    Process-cached (lru) AND disk-cached (atomic npz under
    ``_synth_cache_dir``): generating 60k prototype+noise images costs
    seconds on a 1-vCPU host — minutes under contention — and sweep drivers,
    CLI subprocesses, and the test suite call ``load_dataset`` repeatedly;
    the generator is pure in its arguments, so caching preserves the
    deterministic output exactly. Downstream never mutates the returned
    uint8 arrays in place (``_finish_image_dataset`` copies via ``astype``).

    Shapes, dtypes (uint8 in [0,255]) and label format match the real download
    so every downstream stage behaves identically. Not the real data — flagged
    by loaders for honest reporting.
    """
    _surrogate_served.add(name)
    cache_dir = _synth_cache_dir()
    cache_path = (
        os.path.join(
            cache_dir,
            f"{name}_{rows}x{cols}x{chans}_tr{n_train}_te{n_test}.npz",
        )
        if cache_dir
        else ""
    )
    if cache_path and os.path.exists(cache_path):
        try:
            with np.load(cache_path) as z:
                return (z["xtr"], z["ytr"]), (z["xte"], z["yte"])
        except Exception as e:  # corrupt/partial file: regenerate + rewrite
            warnings.warn(f"synthetic cache unreadable ({e}); regenerating")

    # Stable digest, NOT hash(): str hashes are salted per process, which
    # silently desynchronized the surrogate between a training process and a
    # later evaluation process (loaded checkpoints scored ~chance on "the
    # same" dataset). zlib.crc32 is deterministic everywhere.
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode("utf-8")))
    n_classes = 10
    yy, xx = np.mgrid[0:rows, 0:cols].astype(np.float32)

    # Classes are distinct 3-subsets of a SHARED 5-blob pool (all ten 3-subsets), so they overlap
    # in feature space instead of being linearly separable prototypes: a
    # linear probe scores ~75%, a small conv ~90-95%, and ε≤0.3 attacks
    # actually move accuracy — the original fully-disjoint prototypes gave
    # margins so wide that FGSM at ε=0.3 left adversarial accuracy at 100%,
    # degenerating every synthetic robustness experiment.
    pool = [
        (rng.uniform(4, rows - 4), rng.uniform(4, cols - 4), rng.uniform(2.0, 4.5))
        for _ in range(5)
    ]
    combos: list[tuple] = []
    while len(combos) < n_classes:
        c = tuple(sorted(rng.choice(len(pool), size=3, replace=False)))
        if c not in combos:
            combos.append(c)
    protos = []
    for combo in combos:
        img = np.zeros((rows, cols), np.float32)
        for i in combo:
            cy, cx, s = pool[i]
            img += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
        protos.append(img / img.max())
    protos = np.stack(protos)  # (10, rows, cols)

    def make(n, seed):
        r = np.random.default_rng(seed)
        labels = r.integers(0, n_classes, size=n)
        noise = r.normal(0.0, 0.30, size=(n, rows, cols)).astype(np.float32)
        imgs = np.clip(protos[labels] + noise, 0.0, 1.0)
        x = (imgs * 255).astype(np.uint8)
        if chans > 1:
            x = np.repeat(x[..., None], chans, axis=-1)
        return x, labels.astype(np.uint8)

    train, test = make(n_train, 1234), make(n_test, 5678)
    if cache_path:
        try:  # atomic publish: concurrent writers race benignly (same bytes)
            os.makedirs(cache_dir, exist_ok=True)
            import tempfile

            fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npz.tmp")
            with os.fdopen(fd, "wb") as f:
                np.savez(
                    f, xtr=train[0], ytr=train[1], xte=test[0], yte=test[1]
                )
            os.replace(tmp, cache_path)
        except Exception as e:  # read-only FS etc. — cache is best-effort
            warnings.warn(f"synthetic cache write failed ({e})")
    return train, test


def load_mnist(channels: str = "last", fallback: str = "error") -> Arrays:
    """MNIST with the reference's preprocessing (``utils.py:121-145``)."""
    return _finish_image_dataset(
        *_load_mnist_like("mnist", ["mnist.npz"], fallback), channels, 28, 28, 1
    )


def load_fashion_mnist(channels: str = "last", fallback: str = "error") -> Arrays:
    """Fashion-MNIST with the reference's preprocessing (``utils.py:95-118``)."""
    return _finish_image_dataset(
        *_load_mnist_like("fashion_mnist", ["fashion_mnist.npz"], fallback),
        channels,
        28,
        28,
        1,
    )


def _finish_image_dataset(train, test, channels, rows, cols, n_chan) -> Arrays:
    (x_train, y_train), (x_test, y_test) = train, test
    x_train = x_train.astype("float32") / 255.0
    x_test = x_test.astype("float32") / 255.0

    if x_train.ndim == 3:  # greyscale (N, H, W)
        if channels == "first":
            x_train = x_train.reshape(len(x_train), n_chan, rows, cols)
            x_test = x_test.reshape(len(x_test), n_chan, rows, cols)
        else:
            x_train = x_train.reshape(len(x_train), rows, cols, n_chan)
            x_test = x_test.reshape(len(x_test), rows, cols, n_chan)
    else:  # already has channel axis (synthetic multi-channel / cifar NHWC)
        if channels == "first":
            x_train = np.transpose(x_train, (0, 3, 1, 2))
            x_test = np.transpose(x_test, (0, 3, 1, 2))

    y_train = labels_to_onehot(y_train.astype(np.int64).reshape(-1), 10)
    y_test = labels_to_onehot(y_test.astype(np.int64).reshape(-1), 10)
    input_shape = x_train.shape[1:]
    return x_train, y_train, x_test, y_test, input_shape, 10


# --------------------------------------------------------------------------- #
# CIFAR-10
# --------------------------------------------------------------------------- #


def load_cifar(channels: str = "last", fallback: str = "error") -> Arrays:
    """CIFAR-10 from local pickle batches (reference ``utils.py:160-206``).

    Search order: ``$ROBUSTBNNS_CIFAR_DIR``, ``../cifar-10/`` (the reference's
    hard-coded path, ``utils.py:164``), ``data/cifar-10/``. The reference's
    NCHW path reshapes instead of transposing (``utils.py:193-195``), scrambling
    pixels; we transpose correctly.
    """
    data_dirs = [
        os.environ.get("ROBUSTBNNS_CIFAR_DIR", ""),
        "../cifar-10/",
        "data/cifar-10/",
        "data/cifar-10-batches-py/",
    ]
    data_dir = next(
        (d for d in data_dirs if d and os.path.exists(os.path.join(d, "data_batch_1"))),
        None,
    )
    if data_dir is None:
        fallback = os.environ.get(_FALLBACK_ENV, fallback)
        if fallback == "synthetic":
            train, test = _synthetic_image_dataset("cifar", 32, 32, 3, 50000, 10000)
            return _finish_image_dataset(train, test, channels, 32, 32, 3)
        raise FileNotFoundError(
            "No local CIFAR-10 pickle batches found (set $ROBUSTBNNS_CIFAR_DIR). "
            f"Pass fallback='synthetic' or set {_FALLBACK_ENV}=synthetic."
        )

    def _unpickle(path):
        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin-1")

    xs, ys = [], []
    for batch in range(1, 6):
        d = _unpickle(os.path.join(data_dir, f"data_batch_{batch}"))
        xs.append(d["data"])
        ys += list(d["labels"])
    x_train = np.vstack(xs).reshape(-1, 3, 32, 32)
    y_train = np.array(ys, dtype=np.int64)

    d = _unpickle(os.path.join(data_dir, "test_batch"))
    x_test = np.asarray(d["data"]).reshape(-1, 3, 32, 32)
    y_test = np.array(d["labels"], dtype=np.int64)

    # Stored layout is NCHW; convert to NHWC then finish like the others.
    x_train = np.transpose(x_train, (0, 2, 3, 1))
    x_test = np.transpose(x_test, (0, 2, 3, 1))
    return _finish_image_dataset(
        (x_train, y_train), (x_test, y_test), channels, 32, 32, 3
    )


# --------------------------------------------------------------------------- #
# Unified entry point
# --------------------------------------------------------------------------- #


def load_dataset(
    dataset_name: str,
    n_inputs: Optional[int] = None,
    channels: str = "last",
    shuffle: bool = False,
    fallback: str = "error",
    seed: int = 0,
) -> Arrays:
    """Load any of the four datasets (reference ``utils.py:208-235``).

    ``n_inputs`` truncates train *and* test sets before the optional seeded
    permutation shuffle, matching the reference order of operations
    (``utils.py:221-233``).
    """
    if dataset_name == "mnist":
        out = load_mnist(channels, fallback)
    elif dataset_name == "cifar":
        out = load_cifar(channels, fallback)
    elif dataset_name == "fashion_mnist":
        out = load_fashion_mnist(channels, fallback)
    elif dataset_name == "half_moons":
        out = load_half_moons(channels)
    else:
        raise ValueError(f"Dataset {dataset_name!r} not available.")

    x_train, y_train, x_test, y_test, input_shape, num_classes = out
    if n_inputs:
        x_train, y_train = x_train[:n_inputs], y_train[:n_inputs]
        x_test, y_test = x_test[:n_inputs], y_test[:n_inputs]

    if shuffle:
        rng = np.random.default_rng(seed)
        idxs = rng.permutation(len(x_train))
        x_train, y_train = x_train[idxs], y_train[idxs]
        idxs = rng.permutation(len(x_test))
        x_test, y_test = x_test[idxs], y_test[idxs]

    return x_train, y_train, x_test, y_test, input_shape, num_classes
