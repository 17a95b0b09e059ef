"""Per-file Bloom filters over the first row key, stored in the sketch
sidecar, powering exact-key FILE skipping at plan time.

The reference's headline access pattern is the point lookup ("many
thousands in parallel", README.md:22-24); its per-partition file list
means every point query opens EVERY file of its leaf partition even
though the key lives in at most a handful of them (one per LSM "run").
The classic LSM answer (RocksDB, Cassandra, HBase) is a per-file Bloom
filter: a point query consults ~10 bits/key of sidecar metadata and
skips every file that provably does not contain the key — no footer
read, no task, no IO.

Spark mapping: the filter is built ONCE per file, inside the same
executor pass that computes the quantile-sketch sidecar (ingest and
compaction already read the key columns there — the bloom adds zero
IO), and consulted at plan time on the DRIVER, shrinking the file list
handed to ``spark.read.parquet``. On a 1000-executor cluster this is
the difference between a point query scheduling one task per file of a
hot partition and scheduling one task per file that can actually
contain the key.

Safety: a Bloom filter has NO false negatives — every inserted value
sets all its k bits, so "some bit unset" proves absence. Skipping is
therefore exact, and it composes with aggregation-configured tables
(dropping files that contain NO row of the key never removes a
contributing row of any key group). False positives only KEEP extra
files. Absence of a bloom entry (pre-upgrade sidecars, non-hashable
key types) conservatively keeps the file.

Hashing must be stable across OS processes and Python runs (sidecars
are written by executors and read by any later driver): integers go
through a fixed splitmix64 finalizer (vectorised in numpy), strings
(as UTF-8) and bytes through 8-byte BLAKE2b. ``PYTHONHASHSEED``-style
randomised hashes would silently break every filter on restart.
"""

from __future__ import annotations

import base64
import hashlib
import math
import zlib
from typing import Any, Iterable

import numpy as np

#: ~10 bits/key with k=7 gives ~0.9% false positives — the RocksDB
#: default trade-off; at 10 bits/key a 4M-row file costs a 5 MB bitmap
#: before compression, well under the data it lets a query skip
BITS_PER_VALUE = 10
#: bitmap cap per file: 2^27 bits = 16 MiB. Beyond ~13M rows the FPR
#: degrades gracefully instead of the sidecar growing without bound
MAX_BITS = 1 << 27
MIN_BITS = 1 << 9


def _size_bits(expected_rows: int) -> int:
    m = max(MIN_BITS, min(MAX_BITS, expected_rows * BITS_PER_VALUE))
    return (m + 7) & ~7  # whole bytes, for packbits round-trip


def _num_hashes(m_bits: int, expected_rows: int) -> int:
    # optimal k = (m/n) ln2; capped so a tiny file doesn't ask for
    # dozens of probes
    return max(1, min(16, round(m_bits / max(1, expected_rows) * math.log(2))))


_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Fixed 64-bit finalizer (splitmix64) — vectorised, stable."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def hash64_scalar(v: Any) -> int:
    """Stable 64-bit hash of one key value (the query-side probe)."""
    if isinstance(v, bool) or v is None:
        raise TypeError(f"unhashable key type for bloom: {type(v)}")
    if isinstance(v, (int, np.integer)):
        arr = np.array([np.int64(v)]).view(np.uint64)
        return int(_splitmix64(arr)[0])
    if isinstance(v, str):
        v = v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return int.from_bytes(
            hashlib.blake2b(bytes(v), digest_size=8).digest(), "big")
    raise TypeError(f"unhashable key type for bloom: {type(v)}")


def _hash_array(values) -> np.ndarray:
    """uint64 hashes of an arrow/numpy/list column; nulls dropped
    (row keys are non-null by schema; a null can match no point)."""
    import pyarrow as pa

    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.combine_chunks() if isinstance(
            values, pa.ChunkedArray) else values
        if arr.null_count:
            arr = arr.drop_null()
        if pa.types.is_integer(arr.type):
            np_vals = arr.cast(pa.int64()).to_numpy(
                zero_copy_only=False).view(np.uint64)
            return _splitmix64(np_vals)
        values = arr.to_pylist()
    elif isinstance(values, np.ndarray) and np.issubdtype(
            values.dtype, np.integer):
        return _splitmix64(values.astype(np.int64).view(np.uint64))
    out = np.empty(len(values), dtype=np.uint64)
    n = 0
    for v in values:
        if v is None:
            continue
        out[n] = hash64_scalar(v)
        n += 1
    return out[:n]


def _positions(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """k probe positions per hash via double hashing (h1 + i*h2) % m."""
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).ravel()


class BloomAccumulator:
    """Streaming builder: size from an upfront row estimate, feed value
    chunks, serialise once. The Arrow compaction engine feeds its
    sorted output batches here so compacted files get blooms with zero
    extra passes; ``build_bloom`` below is the one-shot form."""

    def __init__(self, field: str, expected_rows: int):
        self.field = field
        self.m = _size_bits(expected_rows)
        self.k = _num_hashes(self.m, expected_rows)
        self._bits = np.zeros(self.m, dtype=bool)
        self.n = 0

    def update(self, values) -> None:
        h = _hash_array(values)
        if len(h):
            self._bits[_positions(h, self.k, self.m)] = True
            self.n += len(h)

    def to_dict(self) -> dict:
        packed = np.packbits(self._bits).tobytes()
        return {
            "field": self.field,
            "m": self.m,
            "k": self.k,
            # zlib: a half-empty bitmap (small file, capped m) shrinks
            # a lot; a well-loaded one is ~incompressible and passes
            # through with headers only
            "bits": base64.b64encode(zlib.compress(packed, 6)).decode("ascii"),
        }


def build_bloom(field: str, values, n_rows: int | None = None) -> dict:
    acc = BloomAccumulator(field, n_rows if n_rows is not None
                           else len(values))
    acc.update(values)
    return acc.to_dict()


def decode_bits(bloom: dict) -> np.ndarray:
    raw = zlib.decompress(base64.b64decode(bloom["bits"]))
    return np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[:bloom["m"]]


def may_contain(bits: np.ndarray, bloom: dict, value: Any) -> bool:
    """True unless some probe bit is unset (proof of absence)."""
    try:
        h = np.array([hash64_scalar(value)], dtype=np.uint64)
    except TypeError:
        return True  # unhashable probe type -> unknown -> keep
    return bool(bits[_positions(h, bloom["k"], bloom["m"])].all())


def may_contain_any(bloom: dict, values: Iterable[Any]) -> bool:
    bits = decode_bits(bloom)
    return any(may_contain(bits, bloom, v) for v in values)
