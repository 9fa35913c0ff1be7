"""FacialAnalyzer: detect → crop → age/gender/identity, one fused device program.

The TPU-native counterpart of the reference's ``FacialImageProcessing``
engine (``facial_analysis.py:35-72,225-294``): where the reference runs MTCNN,
then loops over faces calling ``sess.run`` per crop (:264-284), here the
detector output feeds a batched crop+resize and a single multi-head forward —
detection and analysis execute as one jit-compiled XLA program per image-shape
bucket.

Per-face semantics match ``process_image`` (:233-294): boxes dilated by 10 px,
clipped to the image; crop resized to 224² (bilinear), BGR + Caffe-ImageNet
mean subtraction (:102-107); age = 1 + expectation over the renormalized top-2
age-softmax bins (:113-124); gender probability thresholded at 0.6 by
``is_male`` (:76-81).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multihead import import_multihead_params
from ..ops.resize import crop_resize_bilinear, crop_resize_bilinear_lanes
from .detector import MTCNNDetector


@dataclasses.dataclass
class FaceResult:
    bbox: Tuple[int, int, int, int]       # dilated+clipped [x1, y1, x2, y2]
    raw_bbox: Tuple[float, float, float, float]
    score: float
    age: float
    gender_prob: float                    # P(male)
    identity: np.ndarray                  # (1024,) embedding
    landmarks: np.ndarray                 # (10,) [x0..x4, y0..y4]

    def is_male(self, threshold: float = 0.6) -> bool:
        return self.gender_prob >= threshold


class FacialAnalyzer:
    """Fused detection + per-face heads engine.

    ``heads`` is either the one-model multi-head bundle (default; pass
    ``multihead_params``) or any object with ``params`` and
    ``apply(params, crops) -> (ages, gender_prob, identity)`` — e.g.
    ``pipelines.heads.TwoModelHeads`` for the reference's separate age/gender
    graph configuration (``facial_analysis.py:132-208``)."""

    def __init__(self, mtcnn_params, multihead_params=None, minsize: int = 40,
                 face_size: int = 224, bbox_dilation: int = 10, heads=None,
                 head_batch: int = 16, oversample: bool = False, mesh=None,
                 batch_head_total=None, **detector_kwargs):
        from .heads import MultiheadHeads

        if heads is None:
            if multihead_params is None:
                raise ValueError("pass multihead_params or heads")
            heads = MultiheadHeads(multihead_params)
        # optional device mesh: analyze_batch shards images over the 'data'
        # axis (pure batch DP — no cross-image communication exists in the
        # cascade, so scaling is embarrassingly parallel over ICI)
        self.mesh = mesh
        # analyze_batch (single-device) compacts valid boxes ACROSS lanes to
        # this many crop+head slots total (default max(16, 2·lanes)); lanes
        # whose faces overflow re-run through the single-image path
        self.batch_head_total = batch_head_total
        self.detector = MTCNNDetector(mtcnn_params, minsize=minsize, **detector_kwargs)
        self.heads = heads
        self.mh_params = heads.params
        if self.mh_params:
            # pin head params to the device(s) once — TwoModelHeads carries
            # the graph compiler's host-numpy constant dict, which would
            # otherwise re-upload per analyze call (replicated across the
            # mesh in mesh mode, same as the embedder)
            if mesh is not None:
                from ..parallel.sharding import replicated

                self.mh_params = jax.device_put(self.mh_params,
                                                replicated(mesh))
            else:
                self.mh_params = jax.device_put(self.mh_params)
        self.face_size = face_size
        self.bbox_dilation = bbox_dilation
        # the detector pads boxes to max_stage3 (64 by default) but real
        # photos rarely have more than a few faces; the fused program crops
        # and runs the heads on only the first head_batch VALID boxes and
        # scatters results back, falling back to a full-width program when
        # more faces than that are valid (analyze() handles the re-run)
        self.head_batch = head_batch
        # the reference's (upstream-disabled) 5-crop oversampling
        # (facial_analysis.py:248-253): base box + four ±10 px diagonal
        # shifts, ages/genders averaged over the five crops, identity
        # features from the base crop
        self.oversample = oversample
        self._jitted: Dict[Tuple, object] = {}
        self._cores: Dict[Tuple[int, int, int], object] = {}

    @classmethod
    def from_reference_models(cls, mtcnn_pb: str, agegender_pb: str,
                              int8_heads: bool = False, **kwargs):
        """``int8_heads=True`` runs the per-face multi-head net on the
        full-int8 serving path (``models/int8_infer.py``) — the TPU-native
        extension of the reference's 8-bit-quantized serving model."""
        from ..models.mtcnn import import_mtcnn_params

        mh = import_multihead_params(agegender_pb)
        if int8_heads:
            from .heads import Int8MultiheadHeads

            return cls(import_mtcnn_params(mtcnn_pb),
                       heads=Int8MultiheadHeads(mh), **kwargs)
        return cls(import_mtcnn_params(mtcnn_pb), mh, **kwargs)

    @classmethod
    def from_two_model_pbs(cls, mtcnn_pb: str, age_pb: str, gender_pb: str,
                           sota: bool = False, head_kwargs: Optional[Dict] = None,
                           **kwargs):
        """Two-graph configuration (reference ``age_gender_one_model=False``,
        ``facial_analysis.py:47-54,67-71``): separate frozen age and gender
        models, each with its own input size and tensor taps."""
        from ..models.mtcnn import import_mtcnn_params
        from .heads import TwoModelHeads

        heads = TwoModelHeads(age_pb, gender_pb, sota=sota, **(head_kwargs or {}))
        return cls(import_mtcnn_params(mtcnn_pb), heads=heads, **kwargs)

    def _dilated_geometry(self, boxes, h: int, w: int):
        """Shared box geometry for the single and batch cores: dilate by
        ``bbox_dilation`` (reference :240-244; box coords are float),
        returning the [y1, x1, y2, x2] crop rects (pre-clip) and the
        clipped [x1, y1, x2, y2] dilated boxes. ``boxes`` is (..., n, 4)."""
        dil = float(self.bbox_dilation)
        x1 = jnp.floor(boxes[..., 0]) - dil
        y1 = jnp.floor(boxes[..., 1]) - dil
        x2 = jnp.floor(boxes[..., 2]) + dil
        y2 = jnp.floor(boxes[..., 3]) + dil
        rect = jnp.stack([y1, x1, y2, x2], axis=-1)
        dilated = jnp.stack([jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
                             jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], axis=-1)
        return rect, dilated

    def _analyze_fn(self, h: int, w: int, head_batch: Optional[int] = None,
                    tier: int = 0):
        k = head_batch or self.head_batch
        key = (h, w, k, tier)
        if key in self._jitted:
            return self._jitted[key]

        detect = self.detector.detect_fn(h, w, tier)
        heads = self.heads

        def fn(params, img):
            boxes, scores, points, valid, truncated = detect(img)
            n = boxes.shape[0]
            img_f = img.astype(jnp.float32)
            rect_all, dilated = self._dilated_geometry(boxes, h, w)
            # compact to the first k valid boxes: most of a full-width head
            # pass is padding work (a 4-face photo paying 64 multi-head 224²
            # forwards). argsort of ~valid is stable, so valid lanes keep
            # their original order; results scatter back to full width.
            sel = jnp.argsort(~valid)[:k]
            rect = rect_all[sel]                              # pre-clip
            if self.oversample:
                # base + 4 diagonal ±10 shifts (reference :248-253), each
                # clipped separately (:255-263)
                d = 10.0
                offs = jnp.asarray([[0, 0], [-d, -d], [d, -d], [-d, d], [d, d]],
                                   jnp.float32)   # (5, [dy, dx])
                rects = rect[None] + jnp.concatenate([offs, offs], axis=1)[:, None, :]
            else:
                rects = rect[None]                              # (1, k, 4)
            v = rects.shape[0]
            hw = jnp.asarray([h, w, h, w], jnp.float32)
            rects = jnp.clip(rects.reshape(v * k, 4), 0.0, hw)
            crops = crop_resize_bilinear(img_f, rects, self.face_size,
                                         supersample=1, outside="clamp")
            ages_v, gender_v, identity_v = heads.apply(params, crops)
            # average predictions over the crop variants; identity comes
            # from the base crop (the reference keeps the last-processed
            # features, and its boxes[::-1] order ends on the base box)
            ages_k = ages_v.reshape(v, k).mean(axis=0)
            gender_k = gender_v.reshape(v, k).mean(axis=0)
            identity_k = identity_v.reshape(v, k, -1)[0]
            ages = jnp.zeros((n,), ages_k.dtype).at[sel].set(ages_k)
            gender_prob = jnp.zeros((n,), gender_k.dtype).at[sel].set(gender_k)
            head_truncated = jnp.sum(valid) > k
            # identity stays COMPACT (k, D) + its scatter indices: the padded
            # (n, D) form is ~30x the real payload and host->device downlinks
            # can be the bottleneck (the dev tunnel downloads at ~7 MB/s);
            # the host scatters it (analyze/_scatter_identity)
            return (boxes, dilated, scores, points, valid, ages,
                    gender_prob, identity_k, sel, truncated, head_truncated)

        self._cores[key] = fn
        self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def _analyze_batch_fn(self, h: int, w: int, head_batch: Optional[int] = None,
                          mesh=None):
        """vmapped fused program: (params, (N, h, w, 3)) -> per-image outputs
        stacked on a leading axis. One XLA program for the whole batch — the
        album-scan throughput path (the reference loops per photo,
        ``process_photos.py:238-261``).

        With ``mesh``, the program is GSPMD-sharded: images split over the
        'data' axis (params replicated), every per-image stage — pyramid,
        P/R/O nets, masked NMS loops, crops, heads — runs fully
        batch-parallel across devices with no cross-image collectives.

        The per-lane head budget defaults to half the single-image budget
        (min 8): at batch 8 the 224² crop+multi-head forwards dominate the
        program (~9 of 18 ms at budget 16), almost all of it padding —
        lanes that exceed the budget re-run through the single-image
        full-width path (``analyze_batch``'s fallback), so crowd photos
        stay correct."""
        k = head_batch or self._batch_head_budget()
        # stable mesh identity: id() can be reused after GC, silently serving
        # a program compiled for a different topology
        mesh_key = (tuple(mesh.axis_names), tuple(mesh.shape.values()),
                    tuple(d.id for d in mesh.devices.flat)) \
            if mesh is not None else None
        key = ("batch", h, w, k, mesh_key)
        if key not in self._jitted:
            self._analyze_fn(h, w, k)   # builds the shared core
            core = self._cores[(h, w, k, 0)]
            vfn = jax.vmap(core, in_axes=(None, 0))
            if mesh is not None:
                from ..parallel.sharding import batch_sharding, replicated

                out_s = batch_sharding(mesh)   # every output is per-image
                self._jitted[key] = jax.jit(
                    vfn, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                    out_shardings=tuple([out_s] * 11))
            else:
                self._jitted[key] = jax.jit(vfn)
        return self._jitted[key]

    def _batch_head_budget(self) -> int:
        """Default per-lane head budget for the VMAPPED batch path (mesh /
        oversample modes), never above the detector's full width."""
        return min(max(8, self.head_batch // 2), self.detector.max_stage3)

    def _build_batch_compact_fn(self, h: int, w: int, total: int):
        """Single-device batch program with CROSS-LANE head compaction:
        vmapped detection, then the valid boxes of ALL lanes compact into
        one ``total``-slot crop+multi-head pass (lane-indexed crop einsums,
        ``ops/resize.crop_resize_bilinear_lanes``) and scatter back. A
        typical album batch carries a handful of faces across 8 photos, so
        this replaces lanes×budget padded head forwards (the dominant cost
        of the vmapped form — ~6 of its 14 ms at batch 8) with ~2·lanes."""
        detect = self.detector.detect_core(h, w, batched=True)
        heads = self.heads
        k_total = total

        def fn(params, imgs):
            boxes, scores, points, valid, truncated = jax.vmap(detect)(imgs)
            lanes, n = valid.shape
            imgs_f = imgs.astype(jnp.float32)
            rect_all, dilated = self._dilated_geometry(boxes, h, w)
            flat_valid = valid.reshape(-1)
            # first k_total valid boxes in lane-major order (stable argsort)
            sel = jnp.argsort(~flat_valid)[:k_total]
            lane = sel // n
            hw = jnp.asarray([h, w, h, w], jnp.float32)
            rect = jnp.clip(rect_all.reshape(lanes * n, 4)[sel], 0.0, hw)
            crops = crop_resize_bilinear_lanes(imgs_f, lane, rect,
                                               self.face_size, supersample=1,
                                               outside="clamp")
            ages_k, gender_k, identity_k = heads.apply(params, crops)
            ln = lanes * n
            ages = jnp.zeros((ln,), ages_k.dtype).at[sel].set(ages_k)
            gender = jnp.zeros((ln,), gender_k.dtype).at[sel].set(gender_k)
            # lane head-truncated ⇔ one of its valid faces ranked past the
            # global budget (rank = cumulative valid count, lane-major)
            rank = jnp.cumsum(flat_valid.astype(jnp.int32)).reshape(lanes, n)
            head_truncated = jnp.any(valid & (rank > k_total), axis=1)
            # identity stays compact (k_total, D) + flat scatter indices —
            # the padded (L, n, D) form is ~30x the real payload over the
            # host downlink; the host scatters it (analyze_batch)
            return (boxes, dilated, scores, points, valid,
                    ages.reshape(lanes, n), gender.reshape(lanes, n),
                    identity_k, sel, truncated, head_truncated)

        return fn

    def _batch_compact_sharded_fn(self, h: int, w: int, total: int):
        """Mesh-mode batch program WITHOUT the per-lane-budget downgrade:
        ``shard_map`` runs the cross-lane compacted program
        (``_build_batch_compact_fn``) independently on each device's local
        lane shard — compaction needs no cross-device gather because every
        stage of the per-shard program is lane-local. ``total`` is the
        PER-SHARD head budget. Outputs concatenate along the lane/K axis;
        each shard's ``sel`` indexes its LOCAL (lanes/P)·n flat box space
        (``analyze_batch`` adds the shard offsets host-side)."""
        from jax.sharding import PartitionSpec

        core = self._build_batch_compact_fn(h, w, total)
        data = PartitionSpec("data")
        fn = jax.shard_map(core, mesh=self.mesh,
                           in_specs=(PartitionSpec(), data),
                           out_specs=tuple([data] * 11), check_vma=False)
        return jax.jit(fn)

    @staticmethod
    def _scatter_identity(identity_k: np.ndarray, sel: np.ndarray,
                          n: int) -> np.ndarray:
        """Host-side scatter of the compact identity rows back to full
        width (sel positions beyond the valid count carry unused rows)."""
        out = np.zeros((n, identity_k.shape[-1]), identity_k.dtype)
        out[sel] = identity_k
        return out

    @staticmethod
    def _assemble_results(out_np, identity: np.ndarray) -> List[FaceResult]:
        """One image's host-side arrays -> FaceResult list."""
        boxes, dilated, scores, points, valid, ages, genders = out_np[:7]
        results = []
        for i in np.where(valid)[0]:
            x1, y1, x2, y2 = boxes[i, :4]
            if not (x2 > x1 and y2 > y1):
                continue  # reference skips zero-area boxes (:237)
            results.append(FaceResult(
                bbox=tuple(int(v) for v in dilated[i]),
                raw_bbox=tuple(float(v) for v in boxes[i, :4]),
                score=float(scores[i]),
                age=float(ages[i]),
                gender_prob=float(genders[i]),
                identity=identity[i],
                landmarks=points[i],
            ))
        return results

    def analyze(self, img: np.ndarray) -> List[FaceResult]:
        """RGB uint8/float (H, W, 3) -> per-face results.

        Crowd robustness: when the detector's static box budgets saturate
        (fused-program ``truncated`` output), re-runs at doubled-cap tiers
        like ``MTCNNDetector.detect`` (up to ``max_escalations``); when only
        the compact HEAD budget saturates, re-runs the full-head-width
        program at the current tier. Each (shape, tier, width) program
        compiles once, cached persistently."""
        h, w = img.shape[:2]
        dev = jnp.asarray(img)
        # fetch the whole tuple in ONE host transfer and test the truncation
        # flags on host — a separate bool(out[...]) scalar fetch costs its
        # own device round trip on every call
        tier = 0
        caps = self.detector.caps_for
        out_np = jax.device_get(self._analyze_fn(h, w)(self.mh_params, dev))
        while (bool(out_np[9]) and tier < self.detector.max_escalations
               and caps(h, w, tier + 1) != caps(h, w, tier)):
            tier += 1
            fn = self._analyze_fn(h, w, tier=tier)
            out_np = jax.device_get(fn(self.mh_params, dev))
        width = self.detector.caps_for(h, w, tier)[2]  # stage-3 width
        if bool(out_np[10]) and self.head_batch < width:
            # more valid faces than the compact head budget: re-run the
            # full-width program (compiled once, cached) so every face gets
            # real head outputs
            fn = self._analyze_fn(h, w, width, tier=tier)
            out_np = jax.device_get(fn(self.mh_params, dev))
        self.detector._warn_truncated(bool(out_np[9]),
                                      self.detector.caps_for(h, w, tier))
        identity = self._scatter_identity(out_np[7], out_np[8], len(out_np[4]))
        return self._assemble_results(out_np, identity)

    def analyze_batch(self, images: np.ndarray,
                      n_valid: Optional[int] = None) -> List[List[FaceResult]]:
        """Uniform-size RGB batch (N, H, W, 3) -> per-image FaceResult lists.

        Runs the whole batch as ONE fused XLA program. The single-device
        default compacts head work ACROSS lanes
        (``_build_batch_compact_fn``); ``mesh`` mode runs the SAME compacted
        program per device shard via ``shard_map`` (per-shard head budget —
        no cross-device gather needed), zero-padding the lane count up to a
        mesh multiple when needed; ``oversample`` mode is vmapped per-lane. Lanes whose valid-face
        count exceeds the head budget are re-analyzed individually through
        the single-image path (rare). Each distinct (N, H, W) compiles once
        — callers batching a stream should pad to a fixed N (see
        ``AlbumOrganizer.scan_album``).

        ``n_valid``: with padded batches, the number of REAL leading lanes —
        only those are returned, and pad lanes never trigger the
        single-image fallback. Pad with ZERO images (not repeats): blank
        lanes detect nothing, so they consume no head-budget slots."""
        images = np.asarray(images)
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        n_valid = n if n_valid is None else min(n_valid, n)
        n_shards = 0
        if self.oversample:
            # 5-crop oversampling only exists in the vmapped per-lane form
            fn = self._analyze_batch_fn(h, w, mesh=self.mesh)
            can_fallback = (self._batch_head_budget()
                            < self.detector.caps_for(h, w)[2])
        elif self.mesh is not None:
            n_shards = int(np.prod(list(self.mesh.shape.values())))
            if n % n_shards:
                # pad with ZERO lanes to the next mesh multiple (blank lanes
                # detect nothing and consume no head-budget slots); sharding
                # requires the lane count to divide the mesh either way
                pad = n_shards - n % n_shards
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:],
                                      images.dtype)])
                n = len(images)
            lanes_ps = n // n_shards
            total = self.batch_head_total or max(16, 2 * lanes_ps)
            key = ("cbatch_mesh", n, h, w, total,
                   tuple(d.id for d in self.mesh.devices.flat))
            if key not in self._jitted:
                self._jitted[key] = self._batch_compact_sharded_fn(h, w, total)
            fn = self._jitted[key]
            can_fallback = total < lanes_ps * self.detector.caps_for(h, w)[2]
        else:
            total = self.batch_head_total or max(16, 2 * n)
            key = ("cbatch", n, h, w, total)
            if key not in self._jitted:
                self._jitted[key] = jax.jit(
                    self._build_batch_compact_fn(h, w, total))
            fn = self._jitted[key]
            can_fallback = total < n * self.detector.caps_for(h, w)[2]
        # ONE batched host transfer for the whole output tuple: per-array
        # np.asarray costs a full host<->device round trip per buffer
        out = jax.device_get(fn(self.mh_params, jnp.asarray(images)))
        # lanes whose DETECTOR budgets truncated re-run through the
        # single-image path below, which escalates cap tiers; warn at the
        # batch level only when escalation is disabled
        det_esc = self.detector.max_escalations > 0
        self.detector._warn_truncated(
            bool(out[9][:n_valid].any()) and not det_esc,
            self.detector.caps_for(h, w))
        identity_k, sel = out[7], out[8]
        lanes, width = out[4].shape
        if identity_k.ndim == 3:      # vmapped path: per-lane (L, k, D)
            identity = np.stack([
                self._scatter_identity(identity_k[i], sel[i], width)
                for i in range(lanes)])
        elif n_shards:                 # sharded compact: per-shard-local sel
            k_ps = identity_k.shape[0] // n_shards
            offsets = np.repeat(np.arange(n_shards), k_ps) * (
                (lanes // n_shards) * width)
            identity = self._scatter_identity(
                identity_k, sel + offsets, lanes * width
            ).reshape(lanes, width, -1)
        else:                          # compact path: flat (K, D) over L*n
            identity = self._scatter_identity(
                identity_k, sel, lanes * width).reshape(lanes, width, -1)
        results = []
        for i in range(n_valid):
            if (bool(out[10][i]) and can_fallback) or \
                    (bool(out[9][i]) and det_esc):
                results.append(self.analyze(images[i]))
            else:
                results.append(self._assemble_results(
                    [a[i] for a in out[:7]], identity[i]))
        return results

    def _finish_compact(self, out, fallback_img, n_valid: int,
                        can_fallback: bool,
                        only=None) -> List[List[FaceResult]]:
        """Host assembly for one single-device COMPACT-program output tuple:
        scatter the compact identity rows, build per-lane FaceResult lists,
        and re-run truncated lanes through the single-image path.
        ``fallback_img``: callable lane-index -> the image the single-image
        re-run should see (the rotation-pair path hands the HOST-rotated
        photo here). ``only``: lane indices to assemble — others return []
        without fallback work (the 270° pass only matters for lanes still
        faceless at 90°; a discarded lane must not spend an upload-costing
        single-image re-run)."""
        det_esc = self.detector.max_escalations > 0
        identity_k, sel = out[7], out[8]
        lanes, width = out[4].shape
        identity = self._scatter_identity(
            identity_k, sel, lanes * width).reshape(lanes, width, -1)
        results = []
        for i in range(n_valid):
            if only is not None and i not in only:
                results.append([])
                continue
            if (bool(out[10][i]) and can_fallback) or \
                    (bool(out[9][i]) and det_esc):
                results.append(self.analyze(fallback_img(i)))
            else:
                results.append(self._assemble_results(
                    [a[i] for a in out[:7]], identity[i]))
        return results

    def analyze_batch_rotations_padded(
            self, images: np.ndarray,
            lanes: int) -> List[Tuple[List[FaceResult], List[FaceResult]]]:
        """Both 90° and 270° analyses of UPRIGHT images from ONE upload.

        The rotation retry (reference ``process_photos.py:241-247``: photos
        with no upright face re-analyze at 90°, then 270°) previously ran as
        two passes that each re-uploaded host-rotated copies — and the
        host→device link is the product loop's bottleneck (~40 ms + ~15-35
        MB/s per transfer, serialized process-wide; r5 measurement). This
        uploads the pending photos ONCE, rotates ON DEVICE (a relayout
        inside the program, not a transfer), runs the cross-lane-compacted
        cascade on both rotations in one jit program, and fetches both
        output tuples in one transfer. Returns ``(faces_90, faces_270)``
        per real image, in the ROTATED images' coordinates (host callers
        crop from ``np.rot90(img, 3)`` / ``np.rot90(img, 1)`` exactly as
        before — device and host rot90 are the same exact reindexing).
        The caller applies the reference's 90-first policy."""
        images = np.asarray(images)
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        if n < lanes:
            images = np.concatenate(
                [images, np.zeros((lanes - n,) + images.shape[1:],
                                  images.dtype)])
        total = self.batch_head_total or max(16, 2 * lanes)
        key = ("cbatch_rot", lanes, h, w, total)
        if key not in self._jitted:
            # the rotated tensors are (lanes, w, h, 3): ONE compact program
            # built for the rotated dims serves both rotations
            cfn = self._build_batch_compact_fn(w, h, total)

            def pair(params, x):
                # device k values mirror the host convention
                # (np.rot90(img, 3) == rotate 90° clockwise)
                r90 = jnp.rot90(x, k=3, axes=(1, 2))
                r270 = jnp.rot90(x, k=1, axes=(1, 2))
                return cfn(params, r90), cfn(params, r270)

            self._jitted[key] = jax.jit(pair)
        fn = self._jitted[key]
        out90, out270 = jax.device_get(fn(self.mh_params, jnp.asarray(images)))
        can_fallback = total < lanes * self.detector.caps_for(w, h)[2]
        res90 = self._finish_compact(
            out90, lambda i: np.ascontiguousarray(np.rot90(images[i], 3)),
            n, can_fallback)
        res270 = self._finish_compact(
            out270, lambda i: np.ascontiguousarray(np.rot90(images[i], 1)),
            n, can_fallback, only={i for i in range(n) if not res90[i]})
        return list(zip(res90, res270))

    def analyze_batch_retry_padded(
            self, images: np.ndarray,
            lanes: int) -> List[Tuple[List[FaceResult], int]]:
        """``analyze_batch_padded`` + the reference's 90°/270° rotation
        retry (``process_photos.py:241-247``) from a SINGLE upload.

        The photos go to the device ONCE; the upright compact cascade runs
        on the resident array, and only when some lane finds no face does
        the rotation-pair program run — on the SAME device array, zero new
        transfer (the host→device link is the album scan's bottleneck; the
        deferred retry used to re-upload already-uploaded photos). Returns
        ``(faces, rotation)`` per real image with rotation ∈ {0, 90, 270};
        for rotated results the boxes live in the rotated image's
        coordinates, exactly like ``analyze_with_rotations``.

        Single-device compact path only (the mesh/oversample album flow
        keeps the deferred ``_batched_rotation_retry``)."""
        if self.mesh is not None or self.oversample:
            raise ValueError("analyze_batch_retry_padded is single-device "
                             "compact-path only")
        images = np.asarray(images)
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        if n < lanes:
            images = np.concatenate(
                [images, np.zeros((lanes - n,) + images.shape[1:],
                                  images.dtype)])
        total = self.batch_head_total or max(16, 2 * lanes)
        key = ("cbatch", lanes, h, w, total)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                self._build_batch_compact_fn(h, w, total))
        dev = jnp.asarray(images)                       # the ONE upload
        out = jax.device_get(self._jitted[key](self.mh_params, dev))
        det_esc = self.detector.max_escalations > 0
        self.detector._warn_truncated(
            bool(out[9][:n].any()) and not det_esc,
            self.detector.caps_for(h, w))
        can_fallback = total < lanes * self.detector.caps_for(h, w)[2]
        res_up = self._finish_compact(out, lambda i: images[i], n,
                                      can_fallback)
        pending = {i for i in range(n) if not res_up[i]}
        if not pending:
            return [(r, 0) for r in res_up]
        rkey = ("cbatch_rot", lanes, h, w, total)
        if rkey not in self._jitted:
            cfn = self._build_batch_compact_fn(w, h, total)

            def pair(params, x):
                r90 = jnp.rot90(x, k=3, axes=(1, 2))
                r270 = jnp.rot90(x, k=1, axes=(1, 2))
                return cfn(params, r90), cfn(params, r270)

            self._jitted[rkey] = jax.jit(pair)
        out90, out270 = jax.device_get(
            self._jitted[rkey](self.mh_params, dev))   # dev: no re-upload
        can_fb_rot = total < lanes * self.detector.caps_for(w, h)[2]
        res90 = self._finish_compact(
            out90, lambda i: np.ascontiguousarray(np.rot90(images[i], 3)),
            n, can_fb_rot, only=pending)
        res270 = self._finish_compact(
            out270, lambda i: np.ascontiguousarray(np.rot90(images[i], 1)),
            n, can_fb_rot, only={i for i in pending if not res90[i]})
        results = []
        for i in range(n):
            if res_up[i]:
                results.append((res_up[i], 0))
            elif res90[i]:
                results.append((res90[i], 90))
            else:
                results.append((res270[i], 270))  # [] when nothing anywhere
        return results

    def with_minsize(self, minsize: int) -> "FacialAnalyzer":
        """Shallow clone detecting at a different minimum face size: shares
        heads/params (no re-import, no device transfer) but gets a fresh
        detector and empty jit caches. Used by AlbumOrganizer to make
        ``AlbumConfig.minsize`` authoritative regardless of how the engine
        it was handed was constructed."""
        import copy

        clone = copy.copy(self)
        d = self.detector
        clone.detector = MTCNNDetector(
            d.params, minsize=minsize, thresholds=d.thresholds,
            factor=d.factor, max_level_boxes=d.max_level_boxes,
            max_stage2=d.max_stage2, max_stage3=d.max_stage3,
            supersample=d.supersample, precision=d.precision,
            max_escalations=d.max_escalations)
        clone._jitted = {}
        clone._cores = {}
        return clone

    def analyze_batch_padded(self, images: np.ndarray,
                             lanes: int) -> List[List[FaceResult]]:
        """``analyze_batch`` over a fixed lane count: zero-pads the batch up
        to ``lanes`` (blank lanes detect nothing and consume no head-budget
        slots) so arbitrary group sizes reuse ONE compiled program per image
        shape, and returns results for the real images only. The shared
        padding contract for every batched caller (album scan, video
        annotator, serving)."""
        images = np.asarray(images)
        n = images.shape[0]
        if n < lanes:
            images = np.concatenate(
                [images, np.zeros((lanes - n,) + images.shape[1:],
                                  images.dtype)])
        return self.analyze_batch(images, n_valid=n)

    def analyze_with_rotations(self, img: np.ndarray) -> Tuple[List[FaceResult], int]:
        """Retry at 90°/270° when no face is found (reference
        ``process_photos.py:241-247``). Returns (faces, rotation_applied)."""
        faces = self.analyze(img)
        if faces:
            return faces, 0
        for rot in (90, 270):
            k = 3 if rot == 90 else 1  # np.rot90 is counter-clockwise
            rotated = np.ascontiguousarray(np.rot90(img, k))
            faces = self.analyze(rotated)
            if faces:
                return faces, rot
        return [], 0
