"""Persistent face-enrollment gallery for the serving layer.

The reference identifies people only via offline scripts over directory
trees (gallery/probe protocol ``facerec_test.py:220-288``, album clustering
``process_photos.py:45-77``); a long-running service instead needs
ENROLLMENT: add labeled embeddings incrementally, persist them across
restarts, and rank probes against the current gallery. This store keeps the
f32 gallery on host, maintains an int8-quantized ranking state
(``ops/pallas/knn.py::quantize_embeddings`` — one global scale, the same
ranking domain as the Pallas int8 kernel, 4× less device memory per
enrolled identity) rebuilt lazily after enrollments, and answers 1-NN
queries with exact squared-L2 distances between the dequantized vectors.

Thread-safe: the HTTP server calls ``enroll``/``identify`` from concurrent
handler threads. Persistence is a single ``.npz`` written atomically
(tmp + ``os.replace``) after every enrollment, so a crash can lose at most
the enrollment in flight, never corrupt the file.

Decision rule (reference semantics): a probe matches its nearest enrolled
embedding iff the plain L2 distance between the normalized vectors is below
the threshold — the same units as the album pipeline's
``DistanceThreshold=0.82`` (``process_photos.py:26``, ``config.py:41``).
"""

from __future__ import annotations

import os
import threading
from typing import Iterable, List, Optional, Tuple

import numpy as np


def _l2_normalize_host(x: np.ndarray) -> np.ndarray:
    """Host mirror of ``ops/distance.l2_normalize`` (sklearn semantics).
    Probes and enrollments are a handful of rows — normalizing them on
    device would cost a full host↔device round trip per request over a
    remote device link for microseconds of math."""
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, 1e-10)


def _quantize_host(x: np.ndarray):
    """Host mirror of ``ops/pallas/knn.py::quantize_embeddings`` (same
    global symmetric scale, same round-half-even), so building the sharded
    ranking state never downloads the quantized gallery from the device
    (over a remote link that is the slow direction)."""
    x = np.asarray(x, np.float32)
    scale = np.maximum(np.max(np.abs(x)) / np.float32(127.0),
                       np.float32(1e-30))        # f32 arithmetic throughout
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, np.float32(scale)


class EnrollmentGallery:
    """Labeled-embedding store with lazy int8 ranking state.

    ``path``: optional ``.npz`` persistence file — loaded at construction if
    present, rewritten atomically after each ``enroll``/``remove``.
    ``quantized``: rank through the int8 path (exact dequantized-L2; the
    quantization noise is ~1e-2 of the same-vs-cross-class margin for
    normalized embeddings — pinned in ``tests/test_pallas_knn.py``). With
    ``False`` ranking is exact f32. The preference persists in the ``.npz``
    (``cli enroll --exact`` must still hold when serve/album later reload
    the file); passing an explicit bool overrides the stored one, ``None``
    follows the file (default int8 for new/legacy galleries).
    ``mesh``: optional ``jax.sharding.Mesh`` — the ranking state is then
    laid out ONCE per gallery version as shards along ``mesh_axis`` (int8:
    4× less HBM per device) and queries run the distributed sweep of
    ``parallel/knn.py`` (per-shard 1-NN + one tiny all-gather), so a
    multi-chip server scales gallery capacity with the mesh instead of
    replicating it.
    """

    def __init__(self, path: Optional[str] = None,
                 quantized: Optional[bool] = None,
                 mesh=None, mesh_axis: str = "data"):
        self.path = path
        self.quantized = True if quantized is None else quantized
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._lock = threading.RLock()
        self._labels: List[str] = []
        self._feats: List[np.ndarray] = []
        self._rank_state = None            # (gallery arg for identify, dim)
        if path and os.path.exists(path):
            data = np.load(path, allow_pickle=False)
            feats = np.asarray(data["features"], np.float32)
            labels = [str(s) for s in data["labels"]]
            if len(labels) != len(feats):
                raise ValueError(f"corrupt gallery file {path}: "
                                 f"{len(labels)} labels vs {len(feats)} rows")
            self._feats = list(feats)
            self._labels = labels
            if quantized is None and "ranking" in data:
                self.quantized = str(data["ranking"]) == "int8"

    def __len__(self) -> int:
        with self._lock:
            return len(self._labels)

    def stats(self) -> dict:
        with self._lock:
            return {
                "n_enrolled": len(self._labels),
                "n_labels": len(set(self._labels)),
                "dim": int(self._feats[0].shape[0]) if self._feats else None,
                "quantized": self.quantized,
                "path": self.path,
            }

    def enroll(self, label: str, embedding: np.ndarray) -> int:
        """Add one L2-normalized embedding under ``label``; returns the new
        gallery size. Multiple enrollments per label are intentional (more
        views of a person -> better 1-NN coverage, as in the reference's
        multi-image gallery dirs)."""
        return self.enroll_many(
            [label], np.asarray(embedding, np.float32).reshape(1, -1))

    def enroll_many(self, labels: List[str], embeddings: np.ndarray,
                    replace_labels: Iterable[str] = ()) -> int:
        """Bulk ``enroll``: append every (label, embedding) pair under one
        lock and persist ONCE — the CLI bulk-enrollment path would otherwise
        rewrite the ``.npz`` per face. ``replace_labels``: existing
        enrollments to drop in the SAME atomic update (the CLI ``--replace``
        path — a removal must never hit disk without its replacement).
        All validation happens before any mutation, so a failed call leaves
        the gallery untouched in memory and on disk. Returns the new
        gallery size."""
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim != 2 or len(labels) != len(embeddings):
            raise ValueError(f"expected (N, D) embeddings matching "
                             f"{len(labels)} labels, got {embeddings.shape}")
        if any(not l for l in labels):
            raise ValueError("labels must be non-empty")
        embs = (_l2_normalize_host(embeddings) if len(embeddings)
                else embeddings)
        drop = {str(l) for l in replace_labels}
        with self._lock:
            keep = [i for i, l in enumerate(self._labels) if l not in drop]
            if len(embs) and keep and embs.shape[1] != self._feats[keep[0]].shape[0]:
                raise ValueError(
                    f"embedding dim {embs.shape[1]} != gallery dim "
                    f"{self._feats[keep[0]].shape[0]} (different --model?)")
            if not len(embs) and len(keep) == len(self._labels):
                return len(self._labels)      # nothing to add or drop
            if len(keep) != len(self._labels):
                self._feats = [self._feats[i] for i in keep]
                self._labels = [self._labels[i] for i in keep]
            self._feats.extend(embs)
            self._labels.extend(str(l) for l in labels)
            self._rank_state = None
            self._save_locked()
            return len(self._labels)

    def remove(self, label: str) -> int:
        """Drop every embedding enrolled under ``label``; returns how many
        were removed."""
        with self._lock:
            keep = [i for i, l in enumerate(self._labels) if l != label]
            removed = len(self._labels) - len(keep)
            if removed:
                self._feats = [self._feats[i] for i in keep]
                self._labels = [self._labels[i] for i in keep]
                self._rank_state = None
                self._save_locked()
            return removed

    def identify(self, embedding: np.ndarray, threshold: float = 0.82,
                 ) -> Tuple[Optional[str], Optional[float], Optional[str]]:
        """1-NN over the enrolled gallery.

        Returns ``(label_or_None, l2_distance, nearest_label)`` —
        ``label`` is None when the gallery is empty or the nearest
        enrollment is farther than ``threshold`` (the caller still sees who
        was nearest and at what distance)."""
        return self.identify_many(
            np.asarray(embedding, np.float32).reshape(1, -1), threshold)[0]

    def identify_many(self, embeddings: np.ndarray, threshold: float = 0.82,
                      ) -> List[Tuple[Optional[str], Optional[float],
                                      Optional[str]]]:
        """Batched ``identify``: one device call (and, over a remote device
        link, one round trip) for all probes — the serving path uses this
        for per-face labeling of multi-face photos."""
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim != 2:
            raise ValueError(f"expected (N, D) probes, got "
                             f"{embeddings.shape}")
        rank_fn, dim, labels = self._ranking_state()
        if rank_fn is None:
            return [(None, None, None)] * len(embeddings)
        if embeddings.shape[1] != dim:
            raise ValueError(f"probe dim {embeddings.shape[1]} != gallery "
                             f"dim {dim} (gallery enrolled in a different "
                             f"mode or with a different --model?)")
        if not len(embeddings):
            return []
        probes = _l2_normalize_host(embeddings)
        import jax

        dsq, idx = jax.device_get(rank_fn(probes))   # ONE fetch round trip
        out = []
        for d, i in zip(dsq, idx):
            dist = float(np.sqrt(max(float(d), 0.0)))
            nearest = labels[int(i)]
            out.append(((nearest if dist <= threshold else None), dist,
                        nearest))
        return out

    # -- internals --------------------------------------------------------

    def _ranking_state(self):
        """``(rank_fn, dim, labels-snapshot)``, rebuilt only after
        enrollments: quantize (and, with a mesh, shard-place) once per
        gallery version, not per query."""
        with self._lock:
            if not self._feats:
                return None, None, None
            if self._rank_state is None:
                g = np.stack(self._feats)
                rank_fn = (self._mesh_rank_fn(g) if self.mesh is not None
                           else self._local_rank_fn(g))
                self._rank_state = (rank_fn, g.shape[1], list(self._labels))
            return self._rank_state

    def _local_rank_fn(self, g: np.ndarray):
        import jax

        from ..ops.pallas.knn import nearest_neighbor_auto

        # quantize host-side and device_put ONCE: a numpy gallery argument
        # would re-upload the whole store every query
        gallery = (tuple(map(jax.device_put, _quantize_host(g)))
                   if self.quantized else jax.device_put(g))
        return lambda probes: nearest_neighbor_auto(probes, gallery,
                                                    int8=self.quantized)

    def _mesh_rank_fn(self, g: np.ndarray):
        """Distributed ranking: the gallery is padded to the mesh axis,
        placed as device shards ONCE, and every query runs the per-shard
        sweep + scalar all-gather of ``parallel/knn.py``."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.knn import nearest_neighbor_sharded

        mesh, axis = self.mesh, self.mesh_axis
        n, dim = g.shape
        pad = (-n) % mesh.shape[axis]
        rows = NamedSharding(mesh, P(axis))
        if self.quantized:
            # host-side quantization: the device round trip would download
            # the full int8 gallery over the slow direction of a remote link
            qb, sb = _quantize_host(g)
            if pad:
                qb = np.concatenate([qb, np.zeros((pad, dim), np.int8)])
            shards = (jax.device_put(qb, rows), sb)
            return lambda probes: nearest_neighbor_sharded(
                probes, shards, mesh, axis=axis, int8=True, n_valid=n)
        if pad:
            # padded rows must lose every argmin (parallel/knn.py f32 rule)
            g = np.concatenate([g, np.full((pad, dim), 1e4, np.float32)])
        shards = jax.device_put(g, rows)

        def rank(probes):
            dsq, idx = nearest_neighbor_sharded(probes, shards, mesh,
                                                axis=axis)
            # a 1e4 pad row can never outrank a real normalized embedding
            return dsq, idx

        return rank

    def _save_locked(self):
        if not self.path:
            return
        tmp = self.path + ".tmp"
        feats = (np.stack(self._feats) if self._feats
                 else np.zeros((0, 0), np.float32))
        with open(tmp, "wb") as f:   # file handle: savez can't munge the name
            np.savez(f, features=feats,
                     labels=np.asarray(self._labels, dtype=np.str_),
                     ranking=np.str_("int8" if self.quantized else "f32"))
        os.replace(tmp, self.path)
