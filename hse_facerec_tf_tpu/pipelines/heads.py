"""Per-face analysis heads for the fused analyzer program.

The reference engine runs in one of two configurations
(``facial_analysis.py:29-33,67-71``):

- one-model (default): the multi-head age/gender/identity net
  (``load_age_gender``, :83-130);
- two-model (``age_gender_one_model=False``): SEPARATE frozen age and gender
  graphs with their own input sizes and tensor taps (``load_gender``/
  ``load_age``, :132-208; graphs are imported under ``gender/``/``age/`` name
  prefixes at :55-58) — gender from a sigmoid (or sota softmax) tap, age from
  a softmax tap via the same renormalized top-2 expectation, and NO identity
  features (``process_image`` :275-284 sets ``features=[]``).

Both are expressed here as a "heads" object the analyzer composes into its
single XLA program: ``apply(params, crops) -> (ages, gender_prob, identity)``
over a batch of float32 RGB crops at the analyzer's face size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multihead import expected_age_top_k, multihead_apply
from ..ops.preprocess import IMAGENET_MEANS_BGR
from ..ops.resize import resize


class MultiheadHeads:
    """One-model configuration: the shipped quantized multi-head net."""

    identity_dim = 1024

    def __init__(self, params, precision=jax.lax.Precision.HIGH):
        # HIGH (bf16_3x) is f32-exact for this model on TPU (bench.py pins
        # HIGH-vs-HIGHEST embedding cosine > 0.999 every run) and measurably
        # faster; on CPU all precisions lower to the same f32 kernels.
        self.params = params
        self.precision = precision
        self._means = jnp.asarray(IMAGENET_MEANS_BGR, dtype=jnp.float32)

    def apply(self, params, crops):
        x = crops[..., ::-1] - self._means
        out = multihead_apply(params, x, precision=self.precision)
        ages = 1.0 + expected_age_top_k(out.age_probs, k=2)
        return ages, out.gender_prob, out.identity


class Int8MultiheadHeads:
    """One-model configuration on the full-int8 serving path
    (``models/int8_infer.py``): int8 activations + int8 MXU pointwise
    matmuls — the TPU-native extension of the reference's 8-bit-quantized
    serving model. Same per-face semantics as ``MultiheadHeads``; fidelity
    vs the f32 heads is pinned in ``tests/test_int8_infer.py``."""

    identity_dim = 1024

    def __init__(self, params):
        from ..models.int8_infer import quantize_multihead_int8

        # accept either raw multi-head params or a pre-quantized pytree
        self.params = (params if "backbone" in params and
                       "q" in params["backbone"].get("pw1", {})
                       else quantize_multihead_int8(params))
        self._means = jnp.asarray(IMAGENET_MEANS_BGR, dtype=jnp.float32)

    def apply(self, params, crops):
        from ..models.int8_infer import multihead_apply_int8

        x = crops[..., ::-1] - self._means
        out = multihead_apply_int8(params, x)
        ages = 1.0 + expected_age_top_k(out.age_probs, k=2)
        return ages, out.gender_prob, out.identity


def _placeholder_hw(graph, name: str) -> Optional[Tuple[int, int]]:
    """(H, W) from a placeholder's shape attr, or None if dynamic."""
    node = graph.by_name[name]
    shape = node.attrs.get("shape")
    if shape is None or shape.shape is None or len(shape.shape) != 4:
        return None
    h, w = shape.shape[1], shape.shape[2]
    if h is None or w is None or h <= 0 or w <= 0:
        return None
    return int(h), int(w)


class TwoModelHeads:
    """Two-model configuration: separate frozen age and gender graphs.

    Mirrors ``load_gender``/``load_age`` (reference :132-208): per-model input
    size read from the graph's placeholder, cv2-linear resize, BGR + Caffe
    ImageNet means, gender = sigmoid tap (or sota softmax → P(male) =
    probs[:, 1]), age = 1 + renormalized top-2 softmax expectation. Identity
    features are empty (:284).
    """

    identity_dim = 0

    def __init__(self, age_pb: str, gender_pb: str, *,
                 age_input: str = "input_1",
                 age_output: str = "predictions/Softmax",
                 gender_input: str = "input_1",
                 gender_output: str = "predictions/Sigmoid",
                 sota: bool = False,
                 precision=jax.lax.Precision.HIGHEST):
        from ..core.graph_compiler import compile_pb

        if sota:
            # use_sota taps (reference :144-146,173-175)
            age_input, age_output = "data", "prob"
            gender_input, gender_output = "data", "prob"
        self.sota = sota
        self._age = compile_pb(age_pb, [age_output], precision=precision)
        self._gender = compile_pb(gender_pb, [gender_output], precision=precision)
        self._age_in = age_input.split(":")[0]
        self._gender_in = gender_input.split(":")[0]
        self.age_hw = _placeholder_hw(self._age.graph, self._age_in) or (224, 224)
        self.gender_hw = _placeholder_hw(self._gender.graph, self._gender_in) or (224, 224)
        self.params = {"age": self._age.params, "gender": self._gender.params}
        self._means = jnp.asarray(IMAGENET_MEANS_BGR, dtype=jnp.float32)

    def _preprocess(self, crops, hw):
        x = crops
        if (int(x.shape[-3]), int(x.shape[-2])) != tuple(hw):
            x = resize(x, hw, "cv2_linear")
        return x[..., ::-1] - self._means   # Caffe means either way (:148-151)

    def apply(self, params, crops):
        n = crops.shape[0]
        (age_preds,) = self._age.fn(params["age"],
                                    {self._age_in: self._preprocess(crops, self.age_hw)})
        age_probs = age_preds.reshape(n, -1)
        ages = 1.0 + expected_age_top_k(age_probs, k=2)
        (gender_preds,) = self._gender.fn(
            params["gender"],
            {self._gender_in: self._preprocess(crops, self.gender_hw)})
        gender_preds = gender_preds.reshape(n, -1)
        if self.sota:
            # softmax [female, male]; is_male = preds[1] > 0.5 (:78-79).
            # Return the HARD decision as 0.0/1.0: downstream consumers
            # (utils/draw.py, album) threshold gender_prob at the one-model
            # path's 0.6, which would misclassify sota probs in [0.5, 0.6).
            gender_prob = (gender_preds[:, 1] > 0.5).astype(jnp.float32)
        else:
            gender_prob = gender_preds[:, 0]
        identity = jnp.zeros((n, 0), jnp.float32)
        return ages, gender_prob, identity
