"""Batched, mesh-sharded face-embedding extraction.

Replaces the reference's per-image Python loop over ``sess.run`` calls
(``facerec_test.py:114-122,390-394`` — batch size 1, host-side scipy resize)
with a fused device pipeline: uint8 batch → resize (matmul) → normalize →
backbone → embeddings, one XLA program, sharded over the batch axis of a
device mesh. This is the >10× images/sec/chip lever named in BASELINE.md.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.preprocess import NORMALIZERS
from ..ops.resize import resize
from ..parallel.sharding import batch_sharding, pad_batch, replicated


class EmbeddingExtractor:
    """Turns a backbone into a batched (optionally sharded) feature extractor.

    Args:
      model_fn: ``f(params, images_f32_nhwc) -> (N, D) float32``.
      params: model parameter pytree.
      input_size: (H, W) the model expects.
      normalization: key into ops.preprocess.NORMALIZERS
        ('caffe' | 'vggface2' | 'mtcnn' | 'tf' | 'none').
      resize_method: 'cv2_linear' | 'cv2_area' | 'pil_bilinear' (the reference
        uses PIL bilinear for LFW embeddings — ``facerec_test.py:93``).
      batch_size: device batch (padded); should be a multiple of the mesh size.
      mesh: optional jax.sharding.Mesh for data-parallel extraction.
    """

    def __init__(self, model_fn: Callable, params, input_size: Tuple[int, int],
                 normalization: str = "caffe", resize_method: str = "pil_bilinear",
                 batch_size: int = 64, mesh=None, compute_dtype=jnp.float32,
                 flip_tta: bool = False, l2_normalize_output: bool = False,
                 host_resize: str = "auto", max_compiled_shapes: int = 4):
        """flip_tta sums features of the image and its horizontal mirror, and
        l2_normalize_output normalizes rows — the reference's InsightFace
        extractor behavior (``insightface_face_embedding.py:47-62``).

        host_resize bounds the number of compiled programs on mixed-size
        datasets (each distinct source (H, W) otherwise costs a fresh XLA
        compile — unbounded for in-the-wild sets like UTKFace):
          - 'auto' (default): the first ``max_compiled_shapes`` distinct
            shapes get fused on-device resize programs; further shapes are
            resized on the host with the EXACT same weight matrices
            (``ops.resize.resize_host``) and routed through the one
            ``input_size`` program.
          - 'always': every non-native shape resizes on host (exactly one
            compiled program per model).
          - 'never': previous behavior (one program per source shape)."""
        self.model_fn = model_fn
        self.params = params
        self.input_size = tuple(input_size)
        self.normalization = normalization
        self.resize_method = resize_method
        self.batch_size = batch_size
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.flip_tta = flip_tta
        self.l2_normalize_output = l2_normalize_output
        if host_resize not in ("auto", "always", "never"):
            raise ValueError(f"host_resize must be auto|always|never, "
                             f"got {host_resize!r}")
        self.host_resize = host_resize
        self.max_compiled_shapes = max_compiled_shapes
        self._jitted: Dict[Tuple[int, int], Callable] = {}
        if mesh is not None:
            self.params = jax.device_put(params, replicated(mesh))
        else:
            # pin params to the device ONCE: several param sources (the
            # graph compiler's constant dicts, the structural pb importer)
            # are host numpy arrays, and passing those as jit arguments
            # re-uploads the full model every call
            self.params = jax.device_put(params)

    def _maybe_host_resize(self, batch: np.ndarray) -> np.ndarray:
        """Apply the host-side exact resize when the shape budget says so."""
        in_hw = (batch.shape[1], batch.shape[2])
        if in_hw == self.input_size or self.host_resize == "never":
            return batch
        n_resize_shapes = sum(1 for k in self._jitted if k != self.input_size)
        if self.host_resize == "always" or (
                in_hw not in self._jitted
                and n_resize_shapes >= self.max_compiled_shapes):
            from ..ops.resize import resize_host

            return resize_host(batch, self.input_size, self.resize_method)
        return batch

    def _fn_for(self, in_hw: Tuple[int, int]) -> Callable:
        if in_hw not in self._jitted:
            norm = NORMALIZERS[self.normalization]
            needs_resize = in_hw != self.input_size

            def fn(params, images):
                x = images.astype(jnp.float32)
                if needs_resize:
                    x = resize(x, self.input_size, self.resize_method)
                x = norm(x)
                feats = self.model_fn(params, x)
                if self.flip_tta:
                    feats = feats + self.model_fn(params, x[:, :, ::-1, :])
                if self.l2_normalize_output:
                    feats = feats / jnp.maximum(
                        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
                return feats

            if self.mesh is not None:
                fn = jax.jit(fn, in_shardings=(replicated(self.mesh),
                                               batch_sharding(self.mesh)),
                             out_shardings=batch_sharding(self.mesh))
            else:
                fn = jax.jit(fn)
            self._jitted[in_hw] = fn
        return self._jitted[in_hw]

    def extract_batch(self, images: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) uint8/float RGB (uniform size) -> (N, D) float32.

        The tail chunk pads to the next power of two (floor 8) instead of
        the full ``batch_size``: program count stays bounded (a handful of
        tail buckets per input size — each distinct batch shape is a
        separate XLA program that takes ~minutes to compile OR load over
        the tunnel) while a small serving batch uploads ~its own rows —
        padding a 12-image coalesced batch to 64 rows dominated request
        latency (measured p50 437 ms). Chunks dispatch asynchronously and
        block on ONE device fetch (per-chunk fetches cost one tunnel RTT
        each)."""
        images = self._maybe_host_resize(np.asarray(images))
        in_hw = (images.shape[1], images.shape[2])
        fn = self._fn_for(in_hw)
        n = len(images)
        outs = []
        takes = []
        i = 0
        while i < n:
            take = min(self.batch_size, n - i)
            chunk = images[i : i + take]
            if take < self.batch_size:
                bucket = max(8, 1 << max(0, (take - 1).bit_length()))
                if self.mesh is not None:   # shardable over every device
                    bucket = max(bucket, self.mesh.devices.size)
                chunk, _ = pad_batch(chunk, min(bucket, self.batch_size))
            outs.append(fn(self.params, jnp.asarray(chunk)))
            takes.append(take)
            i += take
        host = jax.device_get(outs)
        return np.concatenate([o[:t] for o, t in zip(host, takes)])

    def extract_files(self, paths: Sequence[str], loader=None,
                      decode_workers: int = 4) -> np.ndarray:
        """Streamed file extraction, order preserved: threaded JPEG decode
        (``utils/prefetch.bounded_thread_map``) feeds per-source-size batch
        buckets; full buckets dispatch to the device WITHOUT blocking (JAX
        async dispatch), so host decode of the next batch overlaps device
        compute of the current one. Memory stays bounded by
        decode depth + open buckets — the reference decodes serially, one
        image per ``sess.run`` (``facerec_test.py:390-394``).

        ``decode_workers=0`` decodes inline (deterministic single-thread)."""
        from ..utils.image_io import imread_rgb
        from ..utils.prefetch import bounded_thread_map

        loader = loader or imread_rgb
        feats: List[Optional[np.ndarray]] = [None] * len(paths)
        buckets: Dict[Tuple[int, int], List[Tuple[int, np.ndarray]]] = {}
        in_flight: List[Tuple[List[int], int, object]] = []

        def dispatch(bucket):
            idxs = [i for i, _ in bucket]
            batch = self._maybe_host_resize(np.stack([im for _, im in bucket]))
            in_hw = (batch.shape[1], batch.shape[2])
            fn = self._fn_for(in_hw)
            padded, n = pad_batch(batch, self.batch_size)
            for s in range(0, len(padded), self.batch_size):
                chunk_idxs = idxs[s : s + self.batch_size]
                dev = fn(self.params, jnp.asarray(padded[s : s + self.batch_size]))
                in_flight.append((chunk_idxs, len(chunk_idxs), dev))

        def drain():
            for idxs, n, dev in in_flight:
                emb = np.asarray(dev)[:n]
                for j, i in enumerate(idxs):
                    feats[i] = emb[j]
            in_flight.clear()

        for i, img in enumerate(bounded_thread_map(loader, paths,
                                                   workers=decode_workers,
                                                   depth=2 * self.batch_size)):
            bucket = buckets.setdefault(img.shape[:2], [])
            bucket.append((i, img))
            if len(bucket) == self.batch_size:
                dispatch(bucket)
                buckets[img.shape[:2]] = []
            if len(in_flight) >= 2:   # bound device-side queueing + host copies
                drain()
        for bucket in buckets.values():
            if bucket:
                dispatch(bucket)
        drain()
        return np.stack(feats)
