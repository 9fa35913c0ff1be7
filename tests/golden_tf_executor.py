"""Independent golden executor for frozen TF graphs, built on torch (CPU).

Used only in tests: executes the same parsed GraphDef with a *separate*
implementation path (torch convolutions + explicit TF-SAME padding) so that the
JAX graph compiler (``core/graph_compiler.py``) is cross-validated against an
independent numerical route rather than against itself.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

from hse_facerec_tf_tpu.core.graphdef import TFGraph, NodeDef, extract_constants


def _tname(t: str) -> str:
    return t.split(":")[0]


def _same_pads(size: int, k: int, s: int):
    out = -(-size // s)
    pad = max((out - 1) * s + k - size, 0)
    return pad // 2, pad - pad // 2


def _conv2d_tf(x: np.ndarray, w: np.ndarray, strides, padding: str, groups: int = 1) -> np.ndarray:
    """TF NHWC conv with HWIO filters via torch NCHW."""
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))).double()
    # HWIO -> OIHW  (for grouped/depthwise, I is per-group input channels)
    wt = torch.from_numpy(np.ascontiguousarray(w.transpose(3, 2, 0, 1))).double()
    sh, sw = strides
    if padding == "SAME":
        pt, pb = _same_pads(x.shape[1], w.shape[0], sh)
        pl_, pr = _same_pads(x.shape[2], w.shape[1], sw)
        xt = F.pad(xt, (pl_, pr, pt, pb))
    out = F.conv2d(xt, wt, stride=(sh, sw), groups=groups)
    return out.numpy().transpose(0, 2, 3, 1)


def _depthwise_tf(x, w, strides, padding):
    # w: (H, W, C, M). torch depthwise wants (C*M, 1, H, W), groups=C
    h, wd, c, m = w.shape
    wt = w.transpose(2, 3, 0, 1).reshape(c * m, 1, h, wd)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))).double()
    sh, sw = strides
    if padding == "SAME":
        pt, pb = _same_pads(x.shape[1], h, sh)
        pl_, pr = _same_pads(x.shape[2], wd, sw)
        xt = F.pad(xt, (pl_, pr, pt, pb))
    out = F.conv2d(xt, torch.from_numpy(np.ascontiguousarray(wt)).double(), stride=(sh, sw), groups=c)
    return out.numpy().transpose(0, 2, 3, 1)


def _maxpool_tf(x, k, s, padding):
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))).double()
    if padding == "SAME":
        pt, pb = _same_pads(x.shape[1], k[1], s[1])
        pl_, pr = _same_pads(x.shape[2], k[2], s[2])
        xt = F.pad(xt, (pl_, pr, pt, pb), value=float("-inf"))
    out = F.max_pool2d(xt, kernel_size=(k[1], k[2]), stride=(s[1], s[2]))
    return out.numpy().transpose(0, 2, 3, 1)


def run_graph(graph: TFGraph, feeds: Dict[str, np.ndarray], outputs: List[str]) -> List[np.ndarray]:
    consts = extract_constants(graph)
    env: Dict[str, np.ndarray] = {}

    # single iterative post-order DFS (no recursion limit; the Dequantize
    # pruning rule lives in one place)
    by_name = graph.by_name

    def deps(node):
        if node.op == "Dequantize" and node.name in consts:
            return []
        return [_tname(i) for i in node.inputs if not i.startswith("^")]

    order: List[NodeDef] = []
    state: Dict[str, int] = {}
    stack = [(_tname(o), False) for o in reversed(outputs)]
    while stack:
        name, expanded = stack.pop()
        if name not in by_name or state.get(name) == 2:
            continue
        node = by_name[name]
        if expanded:
            state[name] = 2
            order.append(node)
        elif state.get(name) != 1:
            state[name] = 1
            stack.append((name, True))
            for d in reversed(deps(node)):
                stack.append((d, False))

    def get(t):
        return env[_tname(t)]

    for n in order:
        op = n.op
        if op == "Placeholder":
            env[n.name] = np.asarray(feeds[n.name], dtype=np.float64)
        elif op in ("Const", "Dequantize"):
            env[n.name] = consts[n.name].astype(np.float64) if consts[n.name].dtype.kind == "f" else consts[n.name]
        elif op == "Identity":
            env[n.name] = get(n.inputs[0])
        elif op == "Conv2D":
            s = n.attrs["strides"].list_i
            env[n.name] = _conv2d_tf(get(n.inputs[0]), get(n.inputs[1]), (s[1], s[2]), n.attrs["padding"].s.decode())
        elif op == "DepthwiseConv2dNative":
            s = n.attrs["strides"].list_i
            env[n.name] = _depthwise_tf(get(n.inputs[0]), get(n.inputs[1]), (s[1], s[2]), n.attrs["padding"].s.decode())
        elif op == "MaxPool":
            env[n.name] = _maxpool_tf(get(n.inputs[0]), n.attrs["ksize"].list_i, n.attrs["strides"].list_i, n.attrs["padding"].s.decode())
        elif op == "BiasAdd":
            env[n.name] = get(n.inputs[0]) + get(n.inputs[1])
        elif op == "MatMul":
            a, b = get(n.inputs[0]), get(n.inputs[1])
            if "transpose_a" in n.attrs and n.attrs["transpose_a"].b:
                a = a.T
            if "transpose_b" in n.attrs and n.attrs["transpose_b"].b:
                b = b.T
            env[n.name] = a @ b
        elif op == "Relu":
            env[n.name] = np.maximum(get(n.inputs[0]), 0)
        elif op == "Sigmoid":
            env[n.name] = 1.0 / (1.0 + np.exp(-get(n.inputs[0])))
        elif op == "Softmax":
            x = get(n.inputs[0])
            e = np.exp(x - x.max(axis=-1, keepdims=True))
            env[n.name] = e / e.sum(axis=-1, keepdims=True)
        elif op in ("Add", "AddV2"):
            env[n.name] = get(n.inputs[0]) + get(n.inputs[1])
        elif op == "Sub":
            env[n.name] = get(n.inputs[0]) - get(n.inputs[1])
        elif op == "Mul":
            env[n.name] = get(n.inputs[0]) * get(n.inputs[1])
        elif op == "RealDiv":
            env[n.name] = get(n.inputs[0]) / get(n.inputs[1])
        elif op == "Minimum":
            env[n.name] = np.minimum(get(n.inputs[0]), get(n.inputs[1]))
        elif op == "Maximum":
            env[n.name] = np.maximum(get(n.inputs[0]), get(n.inputs[1]))
        elif op == "Neg":
            env[n.name] = -get(n.inputs[0])
        elif op == "Exp":
            env[n.name] = np.exp(get(n.inputs[0]))
        elif op == "Max":
            ax = tuple(np.atleast_1d(get(n.inputs[1])).astype(int))
            keep = bool(n.attrs.get("keep_dims") and n.attrs["keep_dims"].b)
            env[n.name] = get(n.inputs[0]).max(axis=ax, keepdims=keep)
        elif op == "Sum":
            ax = tuple(np.atleast_1d(get(n.inputs[1])).astype(int))
            keep = bool(n.attrs.get("keep_dims") and n.attrs["keep_dims"].b)
            env[n.name] = get(n.inputs[0]).sum(axis=ax, keepdims=keep)
        elif op == "Mean":
            ax = tuple(np.atleast_1d(get(n.inputs[1])).astype(int))
            keep = bool(n.attrs.get("keep_dims") and n.attrs["keep_dims"].b)
            env[n.name] = get(n.inputs[0]).mean(axis=ax, keepdims=keep)
        elif op == "Reshape":
            env[n.name] = get(n.inputs[0]).reshape([int(v) for v in np.asarray(get(n.inputs[1])).reshape(-1)])
        else:
            raise NotImplementedError(f"golden executor: op {op}")

    return [env[_tname(o)] for o in outputs]
